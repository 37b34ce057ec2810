# Quantized sparse-block SDF textures.
#
# TPU-native equivalent of the reference's TextureSDFData
# (sdf_texture.py:126): high-resolution signed distance storage that only
# spends memory near the surface. The fine grid (R = 8*B cells) is split
# into 8^3-cell blocks; blocks intersecting a narrow band around the
# surface store 9^3 corner samples quantized to uint8 with a per-block
# dequantization (offset + scale * u8); everywhere else a coarse
# (B+1)^3 float grid provides the far field. A dense 128^3 f32 grid is
# 8 MiB per mesh — the texture is typically 10-20x smaller, and sampling
# stays a pair of static gathers (block slot, then 8 corners), ideal for
# XLA: no dynamic shapes, no host round-trips.

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

BLOCK = 8          # fine cells per block edge
CORNERS = BLOCK + 1


@dataclass
class TextureSDF:
    """Sparse quantized SDF texture (host container, numpy).

    Attributes:
        block_index: (B, B, B) int32; slot into ``blocks`` or -1 (coarse).
        blocks: (n_blocks, 9, 9, 9) uint8 quantized corner samples.
        block_scale: (n_blocks,) f32; d = offset + scale * u8.
        block_offset: (n_blocks,) f32.
        coarse: (B+1, B+1, B+1) f32 far-field SDF at block corners.
        lower, upper: world AABB of the fine grid.
    """

    block_index: np.ndarray
    blocks: np.ndarray
    block_scale: np.ndarray
    block_offset: np.ndarray
    coarse: np.ndarray
    lower: np.ndarray
    upper: np.ndarray

    @property
    def fine_resolution(self) -> int:
        return self.block_index.shape[0] * BLOCK

    @property
    def nbytes(self) -> int:
        return (self.blocks.nbytes + self.block_index.nbytes
                + self.coarse.nbytes + self.block_scale.nbytes
                + self.block_offset.nbytes)


def bake_texture_sdf(mesh, resolution: int = 96, margin: float = 0.1,
                     band_cells: float = 3.0) -> TextureSDF:
    """Bake a sparse quantized SDF texture for a triangle mesh.

    ``resolution`` is rounded up to a multiple of 8 (the block size).
    Blocks whose center is within ``band_cells`` fine cells (+ block
    radius) of the surface get fine quantized storage; the rest fall back
    to the coarse grid. Host-side numpy, one-time at finalize
    (reference sdf_texture.py bake path).
    """
    v = np.asarray(mesh.vertices, dtype=np.float64)
    lo, hi = v.min(axis=0), v.max(axis=0)
    pad = margin * max(float((hi - lo).max()), 1e-6)
    lo, hi = lo - pad, hi + pad

    B = max(2, int(np.ceil(resolution / BLOCK)))
    R = B * BLOCK                     # fine cells per edge; R+1 corners

    # bake ONE dense fine corner grid (R+1)^3 — native C++ when available
    # (newton_tpu/native bake_sdf), numpy fallback — then derive the
    # sparse texture from it: exact coarse downsample, per-block activity
    # from actual corner distances, quantized block extraction
    dense = _bake_dense_corners(mesh, R + 1, lo, hi)

    coarse = dense[::BLOCK, ::BLOCK, ::BLOCK].copy()        # (B+1)^3 exact

    win = np.lib.stride_tricks.sliding_window_view(
        dense, (CORNERS, CORNERS, CORNERS))[::BLOCK, ::BLOCK, ::BLOCK]
    # win: (B, B, B, 9, 9, 9) overlapping corner windows per block
    cell = (hi - lo) / R
    band = band_cells * float(cell.max())
    min_abs = np.abs(win).min(axis=(3, 4, 5))
    active = (min_abs <= band).reshape(-1)
    slots = np.full(B * B * B, -1, dtype=np.int32)
    slots[active] = np.arange(int(active.sum()), dtype=np.int32)
    block_index = slots.reshape(B, B, B)

    n_blocks = int(active.sum())
    if n_blocks:
        d = win.reshape(B * B * B, -1)[active].astype(np.float64)
        dmin = d.min(axis=1)
        dmax = d.max(axis=1)
        rng = np.maximum(dmax - dmin, 1e-12)
        q = np.rint((d - dmin[:, None]) / rng[:, None] * 255.0)
        blocks = q.astype(np.uint8).reshape(n_blocks, CORNERS, CORNERS,
                                            CORNERS)
        scale = (rng / 255.0).astype(np.float32)
        offset = dmin.astype(np.float32)
    else:
        blocks = np.zeros((1, CORNERS, CORNERS, CORNERS), dtype=np.uint8)
        scale = np.zeros(1, dtype=np.float32)
        offset = np.zeros(1, dtype=np.float32)

    return TextureSDF(block_index=block_index, blocks=blocks,
                      block_scale=scale, block_offset=offset,
                      coarse=np.ascontiguousarray(coarse, dtype=np.float32),
                      lower=lo, upper=hi)


def _bake_dense_corners(mesh, n_corners: int, lo: np.ndarray,
                        hi: np.ndarray) -> np.ndarray:
    """Dense (n,n,n) signed-distance corner grid over [lo, hi]."""
    v = np.asarray(mesh.vertices, dtype=np.float64)
    f = np.asarray(mesh.indices, dtype=np.int64).reshape(-1, 3)
    try:
        from ..native import native_bake_sdf
        data = native_bake_sdf(v, f.reshape(-1), n_corners, lo, hi)
        if data is not None:
            return data
    except Exception:
        pass
    from .sdf import _point_tri_distance_sq, _ray_parity_sign
    xs = [np.linspace(lo[k], hi[k], n_corners) for k in range(3)]
    pts = np.stack(np.meshgrid(*xs, indexing="ij"), axis=-1).reshape(-1, 3)
    v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    out = np.empty(len(pts))
    chunk = max(1, 2_000_000 // max(len(f), 1))
    for s in range(0, len(pts), chunk):
        e = min(s + chunk, len(pts))
        d2 = _point_tri_distance_sq(pts[s:e, None, :], v0[None], v1[None],
                                    v2[None])
        out[s:e] = (np.sqrt(d2.min(axis=1))
                    * _ray_parity_sign(pts[s:e], v0, v1, v2))
    return out.reshape(n_corners, n_corners, n_corners).astype(np.float32)


def sample_texture_sdf(block_index, blocks, block_scale, block_offset,
                       coarse, lower, upper, points):
    """Trilinear sampling of a (pooled) sparse quantized SDF texture.

    Pure jnp; all gathers are static-shape. Accepts either one texture
    (``block_index`` (B,B,B), ``coarse`` (B+1,..)) or a leading pool axis
    on ``block_index``/``coarse`` with ``points`` (..., 3) already
    associated to one texture (use vmap or index before calling).

    Args:
        points: (..., 3) world-space sample positions.

    Returns:
        (...,) signed distance.
    """
    import jax.numpy as jnp

    B = block_index.shape[-1]
    R = B * BLOCK
    span = upper - lower
    u = (points - lower) / span * R                    # fine-cell coords
    u = jnp.clip(u, 0.0, R - 1e-3)
    bc = jnp.minimum((u // BLOCK).astype(jnp.int32), B - 1)   # block coord
    slot = block_index[bc[..., 0], bc[..., 1], bc[..., 2]]    # (...)

    # fine path: local corner coords within the block's 9^3 samples
    local = u - bc.astype(u.dtype) * BLOCK             # [0, 8)
    i0 = jnp.clip(jnp.floor(local).astype(jnp.int32), 0, BLOCK - 1)
    frac = local - i0
    i1 = i0 + 1
    sl = jnp.maximum(slot, 0)

    def gf(ix, iy, iz):
        return blocks[sl, ix, iy, iz].astype(u.dtype)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = gf(x0, y0, z0) * (1 - fx) + gf(x1, y0, z0) * fx
    c10 = gf(x0, y1, z0) * (1 - fx) + gf(x1, y1, z0) * fx
    c01 = gf(x0, y0, z1) * (1 - fx) + gf(x1, y0, z1) * fx
    c11 = gf(x0, y1, z1) * (1 - fx) + gf(x1, y1, z1) * fx
    fine_q = ((c00 * (1 - fy) + c10 * fy) * (1 - fz)
              + (c01 * (1 - fy) + c11 * fy) * fz)
    fine = block_offset[sl] + block_scale[sl] * fine_q

    # coarse path: trilinear over block corners
    uc = u / BLOCK                                     # [0, B]
    j0 = jnp.clip(jnp.floor(uc).astype(jnp.int32), 0, B - 1)
    fracc = uc - j0
    j1 = j0 + 1

    def gc(ix, iy, iz):
        return coarse[ix, iy, iz]

    X0, Y0, Z0 = j0[..., 0], j0[..., 1], j0[..., 2]
    X1, Y1, Z1 = j1[..., 0], j1[..., 1], j1[..., 2]
    Fx, Fy, Fz = fracc[..., 0], fracc[..., 1], fracc[..., 2]
    d00 = gc(X0, Y0, Z0) * (1 - Fx) + gc(X1, Y0, Z0) * Fx
    d10 = gc(X0, Y1, Z0) * (1 - Fx) + gc(X1, Y1, Z0) * Fx
    d01 = gc(X0, Y0, Z1) * (1 - Fx) + gc(X1, Y0, Z1) * Fx
    d11 = gc(X0, Y1, Z1) * (1 - Fx) + gc(X1, Y1, Z1) * Fx
    coarse_d = ((d00 * (1 - Fy) + d10 * Fy) * (1 - Fz)
                + (d01 * (1 - Fy) + d11 * Fy) * Fz)

    return jnp.where(slot >= 0, fine, coarse_d)


def texture_to_dense(tex: TextureSDF) -> Tuple[np.ndarray, np.ndarray,
                                               np.ndarray]:
    """Reconstruct a dense (R+1)^3 corner grid (testing / viewer use)."""
    B = tex.block_index.shape[0]
    R = B * BLOCK
    out = np.zeros((R + 1, R + 1, R + 1), dtype=np.float32)
    # coarse everywhere (trilinear upsample of block-corner grid)
    t = np.linspace(0, B, R + 1)
    j0 = np.clip(t.astype(int), 0, B - 1)
    fr = t - j0
    j1 = j0 + 1

    def lerp_axis(a, axis, i0, i1, f):
        sh = [1, 1, 1]
        sh[axis] = -1
        f = f.reshape(sh)
        return (np.take(a, i0, axis=axis) * (1 - f)
                + np.take(a, i1, axis=axis) * f)

    c = lerp_axis(tex.coarse, 0, j0, j1, fr)
    c = lerp_axis(c, 1, j0, j1, fr)
    out = lerp_axis(c, 2, j0, j1, fr).astype(np.float32)
    # overwrite fine blocks
    for bx in range(B):
        for by in range(B):
            for bz in range(B):
                s = tex.block_index[bx, by, bz]
                if s < 0:
                    continue
                d = (tex.block_offset[s]
                     + tex.block_scale[s] * tex.blocks[s].astype(np.float32))
                out[bx * BLOCK:bx * BLOCK + CORNERS,
                    by * BLOCK:by * BLOCK + CORNERS,
                    bz * BLOCK:bz * BLOCK + CORNERS] = d
    return out, tex.lower, tex.upper
