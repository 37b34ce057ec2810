"""Pallas TPU kernels for MPM particle-grid transfer.

P2G scatter and G2P gather with dynamic cell indices serialize on TPU
(~14 ns per update — 5.5 ms + 3.8 ms per step at 14k particles, profiled).
These kernels exploit the separability of the quadratic B-spline weights:

    G[i,j,k] = sum_n Wx[n,i] Wy[n,j] Wz[n,k] val[n]

Per particle chunk the kernel builds the row basis
B[n, j*res+i] = Wy[n,j] * Wx[n,i] (banded, built from static column
slices) and the lane-stacked channel values WzV[n, c*res+k]; the whole
transfer is then ONE MXU matmul per chunk —

    P2G:  G(flat)  += B^T @ WzV          (res^2, C*res)
    G2P:  R        = B @ G(flat)         (P, C*res), reduced over k by Wz

— with the grid accumulator resident in VMEM across chunks. No
scatter/gather instructions, no sequential inner loops.

Affine (APIC) terms fold into the same contraction because the
node-position factor separates: sum_n W * (A @ (node - xp)) =
node-coordinate grids post-multiplying plain contractions of per-particle
scalars (see solver_mpm.py for the channel layout).

(reference behavior: implicit_mpm p2g/g2p kernels, solver_implicit_mpm.py;
kernel strategy per /opt/skills/guides/pallas_guide.md.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["p2g_apply", "g2p_apply"]


def _axis_weights(base, w_ax, res, P, dtype):
    """Banded (P, res) B-spline weight matrices per axis.

    base (P, 3) int32 lower node; w_ax (P, 3off, 3axis) weights. Offsets are
    clipped to the grid like the dense path (border duplicates sum).
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (P, res), 1)
    Ws = []
    for ax in range(3):
        b = base[:, ax][:, None]
        W = jnp.zeros((P, res), dtype=dtype)
        for k in range(3):
            idx = jnp.clip(b + k, 0, res - 1)
            W = W + w_ax[:, k, ax][:, None] * (iota == idx).astype(dtype)
        Ws.append(W)
    return Ws


def _row_basis(Wx, Wy, res):
    """B[n, j*res+i] = Wy[n,j] * Wx[n,i] via static column slices (Mosaic
    rejects the (P, res, res) -> (P, res^2) shape cast)."""
    return jnp.concatenate([Wy[:, j:j + 1] * Wx for j in range(res)], axis=1)


def _p2g_body(base_ref, wax_ref, vals_ref, out_ref, *, res, C):
    from jax.experimental import pallas as pl
    P = base_ref.shape[0]
    dtype = vals_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    Wx, Wy, Wz = _axis_weights(base_ref[:], wax_ref[:], res, P, dtype)
    WzV = jnp.concatenate(
        [Wz * vals_ref[:, c][:, None] for c in range(C)], axis=1)
    B = _row_basis(Wx, Wy, res)                              # (P, res^2)
    # contract the particle axis without an explicit transpose
    G = jax.lax.dot_general(B, WzV, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[:, :] += G


def p2g_apply(base, w_ax, vals, res, chunk=512, interpret=False):
    """Scatter per-particle channel values onto the dense grid.

    base (N, 3) int32; w_ax (N, 3off, 3axis); vals (N, C).
    Returns (res, res, res, C) float32. N must be a multiple of ``chunk``
    (pad with zero-weight particles).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    N, C = vals.shape
    assert N % chunk == 0, (N, chunk)
    out = pl.pallas_call(
        functools.partial(_p2g_body, res=res, C=C),
        grid=(N // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 3, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((res * res, C * res), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((res * res, C * res), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(base, w_ax, vals)
    # rows are j*res+i, lanes are c*res+k -> (i, j, k, c)
    return out.reshape(res, res, C, res).transpose(1, 0, 3, 2)


def _g2p_body(base_ref, wax_ref, grid_ref, out_ref, *, res, C):
    P = base_ref.shape[0]
    dtype = out_ref.dtype
    Wx, Wy, Wz = _axis_weights(base_ref[:], wax_ref[:], res, P, dtype)
    B = _row_basis(Wx, Wy, res)                              # (P, res^2)
    R = jnp.dot(B, grid_ref[:, :],
                preferred_element_type=jnp.float32)          # (P, C*res)
    for c in range(C):
        out_ref[:, c] = jnp.sum(R[:, c * res:(c + 1) * res] * Wz, axis=1)


def g2p_apply(base, w_ax, grid, chunk=512, interpret=False):
    """Gather grid channels back to particles.

    grid (res, res, res, C) -> (N, C) per-particle sums weighted by the
    separable B-spline stencil.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    res = grid.shape[0]
    C = grid.shape[-1]
    N = base.shape[0]
    assert N % chunk == 0, (N, chunk)
    # (i, j, k, c) -> rows j*res+i, lanes c*res+k
    gflat = grid.transpose(1, 0, 3, 2).reshape(res * res, C * res)
    out = pl.pallas_call(
        functools.partial(_g2p_body, res=res, C=C),
        grid=(N // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 3, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((res * res, C * res), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(base, w_ax, gflat)
    return out
