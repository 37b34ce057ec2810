"""SDF isosurface extraction (marching tetrahedra).

TPU-native equivalent of reference newton/_src/geometry/sdf_mc.py (marching
cubes over sparse SDF textures). Host-side utility: extracting a render/
debug mesh from a baked SDF grid is a build/visualization-time operation,
not a sim-step one, so it runs in vectorized numpy. Each grid cell is split
into 6 tetrahedra; every tet contributes 0-2 triangles where the iso-surface
crosses its edges, with vertices linearly interpolated along the edges.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["marching_tets", "sdf_to_mesh"]

# 6-tet decomposition of the unit cube (indices into the 8 cube corners,
# corner order (x, y, z) bit-packed: c = x*4 + y*2 + z)
_CUBE_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 3, 6], [0, 3, 2, 6],
    [0, 2, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], dtype=np.int64)
# fix orientation: use a consistent decomposition (Freudenthal)
_CUBE_TETS = np.array([
    [0, 1, 3, 7], [0, 1, 7, 5], [0, 5, 7, 4],
    [0, 3, 2, 7], [0, 2, 6, 7], [0, 6, 4, 7],
], dtype=np.int64)

# per-tet edge list (pairs of local tet-vertex indices)
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]],
                      dtype=np.int64)

# triangle emission table indexed by the 4-bit inside mask of tet vertices.
# Entries are edge indices into _TET_EDGES; -1 padding. One or two triangles.
_TET_TRIS = {
    0b0001: [(0, 1, 2)],
    0b0010: [(0, 4, 3)],
    0b0100: [(1, 3, 5)],
    0b1000: [(2, 5, 4)],
    0b0011: [(1, 2, 4), (1, 4, 3)],
    0b0101: [(0, 3, 5), (0, 5, 2)],
    0b1001: [(0, 1, 5), (0, 5, 4)],
    0b0110: [(0, 1, 5), (0, 5, 4)],   # complement of 0b1001
    0b1010: [(0, 3, 5), (0, 5, 2)],   # complement of 0b0101
    0b1100: [(1, 2, 4), (1, 4, 3)],   # complement of 0b0011
    0b0111: [(2, 5, 4)],
    0b1011: [(1, 3, 5)],
    0b1101: [(0, 4, 3)],
    0b1110: [(0, 1, 2)],
}


def marching_tets(grid: np.ndarray, lower, upper,
                  iso: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the ``iso`` surface of a dense SDF ``grid`` (nx, ny, nz).

    Returns ``(vertices (V, 3), faces (F, 3))`` with faces wound so normals
    point toward positive SDF (outside). Complement cases reuse the same
    edge triangles; winding is fixed afterward from the SDF gradient.
    """
    grid = np.asarray(grid, dtype=np.float64)
    lower = np.asarray(lower, dtype=np.float64)
    upper = np.asarray(upper, dtype=np.float64)
    nx, ny, nz = grid.shape
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)
    spacing = (upper - lower) / (np.array([nx, ny, nz]) - 1)

    # cell corner values: (cx, cy, cz, 8)
    corner_bits = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                            for z in (0, 1)], dtype=np.int64)     # (8, 3)
    vals = np.stack([grid[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
                     for dx, dy, dz in corner_bits], axis=-1)     # (..., 8)
    cx, cy, cz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    base = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)         # (C, 3)
    vals = vals.reshape(-1, 8)                                    # (C, 8)

    # skip cells with no crossing
    cross = (vals.min(axis=1) < iso) & (vals.max(axis=1) >= iso)
    base, vals = base[cross], vals[cross]
    if len(base) == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)

    corner_pos = (lower[None, None] + (base[:, None] + corner_bits[None])
                  * spacing[None, None])                          # (C, 8, 3)

    verts_out = []
    tris_out = []
    nv = 0
    for tet in _CUBE_TETS:
        tv = vals[:, tet]                                         # (C, 4)
        tp = corner_pos[:, tet]                                   # (C, 4, 3)
        inside = (tv < iso)
        mask = (inside * np.array([1, 2, 4, 8])).sum(axis=1)      # (C,)
        # interpolated points on all 6 tet edges
        a = tp[:, _TET_EDGES[:, 0]]
        b = tp[:, _TET_EDGES[:, 1]]
        fa = tv[:, _TET_EDGES[:, 0]]
        fb = tv[:, _TET_EDGES[:, 1]]
        denom = fb - fa
        t = np.where(np.abs(denom) > 1e-12, (iso - fa) / np.where(
            np.abs(denom) > 1e-12, denom, 1.0), 0.5)
        t = np.clip(t, 0.0, 1.0)
        epts = a + (b - a) * t[..., None]                         # (C, 6, 3)
        for m, tris in _TET_TRIS.items():
            sel = np.nonzero(mask == m)[0]
            if len(sel) == 0:
                continue
            for (e0, e1, e2) in tris:
                p0, p1, p2 = epts[sel, e0], epts[sel, e1], epts[sel, e2]
                # orient toward +SDF: flip when the face normal points
                # toward the inside (mean of inside corners)
                c_in = (tp[sel] * inside[sel, :, None]).sum(1) / np.maximum(
                    inside[sel].sum(1), 1)[:, None]
                nrm = np.cross(p1 - p0, p2 - p0)
                centroid = (p0 + p1 + p2) / 3.0
                flip = (np.sum(nrm * (c_in - centroid), axis=-1) > 0)
                p1f = np.where(flip[:, None], p2, p1)
                p2f = np.where(flip[:, None], p1, p2)
                verts_out.append(np.concatenate([p0, p1f, p2f], axis=0))
                k = len(p0)
                tri = np.stack([np.arange(k), np.arange(k) + k,
                                np.arange(k) + 2 * k], axis=-1) + nv
                tris_out.append(tri)
                nv += 3 * k
    if not verts_out:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)
    verts = np.concatenate(verts_out, axis=0)
    faces = np.concatenate(tris_out, axis=0)
    # weld duplicate vertices (edge points shared between tets/cells)
    key = np.round(verts / (spacing.min() * 1e-4)).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    welded = np.zeros((len(uniq), 3))
    np.add.at(welded, inv, verts)
    counts = np.bincount(inv, minlength=len(uniq))[:, None]
    welded /= counts
    faces = inv[faces]
    # drop degenerate faces
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return welded, faces[good]


def sdf_to_mesh(model, shape_index: int, iso: float = 0.0):
    """Extract a debug/render Mesh from a shape's baked SDF grid
    (reference: sdf_mc marching cubes over SDF textures)."""
    import numpy as np

    from .types import Mesh
    sid = int(np.asarray(model.structure.shape_sdf_id)[shape_index])
    if sid < 0:
        raise ValueError(f"shape {shape_index} has no baked SDF")
    grid = np.asarray(model.sdf_grids[sid])
    lower = np.asarray(model.sdf_lower[sid])
    upper = np.asarray(model.sdf_upper[sid])
    v, f = marching_tets(grid, lower, upper, iso)
    return Mesh(v, f.reshape(-1), is_solid=True)
