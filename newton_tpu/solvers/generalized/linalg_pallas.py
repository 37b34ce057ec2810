"""VMEM-resident batched small-matrix Cholesky factor+solve (Pallas TPU).

The transposed fast path needs, per substep and per articulation, the
solution of (M + dt*Kd) x = rhs AND the explicit inverse M^-1 (consumed by
the contact/limit/equality impulse stages as one MXU matmul). The XLA
lowering of the unrolled (d, d, W) Cholesky + two triangular sweeps
re-streams the (d, d, W) panel from HBM on every one of the ~4d unrolled
row updates — ~0.9 ms at humanoid scale (d=23, W=4096) for ~18 MB of
essential traffic. This kernel tiles W, performs the factorization and both
solves entirely in VMEM, and writes back only (Minv, x): one HBM round trip.

The in-kernel math is the same unrolled jnp code as the XLA fallback
(`batched._chol_t` / `batched._cho_solve_t`), so both backends remain one
algorithm (reference role: the per-world LDLT/CRBA factorizations in
newton/_src/solvers/kamino/_src/linalg/; kernel strategy per
/opt/skills/guides/pallas_guide.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["chol_inv_solve_pallas", "chol_fits_vmem"]


def chol_fits_vmem(d, W):
    """True when some lane-aligned tile keeps ~6 live (d,d,wt) panels under
    the ~12 MB VMEM budget. The tile loop below cannot shrink past wt=128,
    so large d must fall back to the XLA path (call-site gate)."""
    return W % 128 == 0 and d * (d + 1) * 128 * 4 * 6 <= 12e6


def _chol_core(A):
    """Lower Cholesky of (d, d, Wt) SPD matrices (batched._chol_t).

    Masks come from in-kernel iota (not captured numpy constants, which
    pallas_call rejects)."""
    d = A.shape[0]
    # all masks are built at their target rank with broadcasted_iota —
    # Mosaic cannot reshape sub-32-bit (i1) vectors to higher rank
    r2 = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    r3 = jax.lax.broadcasted_iota(jnp.int32, (d, d, 1), 0)
    c3 = jax.lax.broadcasted_iota(jnp.int32, (d, d, 1), 1)
    L = A
    for j in range(d):
        diag = jnp.sqrt(jnp.maximum(L[j, j], 1e-12))
        col = L[:, j] / diag[None, :]
        col = jnp.where(r2 > j, col,
                        jnp.where(r2 == j, diag[None, :], 0.0))
        mask = ((r3 > j) & (c3 > j)).astype(A.dtype)
        L = L - mask * (col[:, None, :] * col[None, :, :])
        # L[:, j] = col (in-kernel: where-mask, .at[] scatters don't lower)
        L = jnp.where(c3 == j, col[:, None, :], L)
    return L * (r3 >= c3).astype(A.dtype)


def _solve_core(L, b):
    """Triangular solves for (d, k, Wt) rhs (batched._cho_solve_t)."""
    d = L.shape[0]
    r3 = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
    y = b
    for i in range(d):
        yi = y[i] / L[i, i][None, :]
        lower = (r3 > i).astype(L.dtype)
        y = y - (lower * L[:, i][:, None, :]) * yi[None]
        y = jnp.where(r3 == i, yi[None], y)
    x = y
    for i in reversed(range(d)):
        xi = x[i] / L[i, i][None, :]
        upper = (r3 < i).astype(L.dtype)
        x = x - (upper * L[i][:, None, :]) * xi[None]
        x = jnp.where(r3 == i, xi[None], x)
    return x


def _kernel(Mi_ref, rhs_ref, minv_ref, qd_ref):
    A = Mi_ref[:]                                       # (d, d, wt)
    rhs = rhs_ref[:]                                    # (d, wt)
    d, _, wt = A.shape
    L = _chol_core(A)
    eye = jnp.broadcast_to(
        jnp.eye(d, dtype=A.dtype)[:, :, None], (d, d, wt))
    b = jnp.concatenate([eye, rhs[:, None, :]], axis=1)  # (d, d+1, wt)
    x = _solve_core(L, b)
    minv_ref[:] = x[:, :d]
    qd_ref[:] = x[:, d]


def chol_inv_solve_pallas(Mi, rhs, *, interpret=False):
    """Solve Mi x = rhs and compute Mi^-1 in one VMEM pass.

    Mi: (d, d, W) SPD; rhs: (d, W). W must be lane-aligned (mult of 128).
    Returns (Minv (d, d, W), x (d, W))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, _, W = Mi.shape
    assert W % 128 == 0, f"env batch {W} must be lane-aligned"
    wt = 512
    # keep ~6 live (d, d, wt) panels under ~12 MB of VMEM
    while W % wt or (wt > 128 and d * (d + 1) * wt * 4 * 6 > 12e6):
        wt //= 2
    n_tiles = W // wt

    minv, x = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((d, d, wt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, wt), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((d, d, wt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((d, wt), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((d, d, W), Mi.dtype),
                   jax.ShapeDtypeStruct((d, W), Mi.dtype)),
        interpret=interpret,
    )(Mi, rhs)
    return minv, x
