"""Small-matrix batched linear algebra, unrolled for TPU.

XLA's generic batched Cholesky/triangular-solve lower to While loops that
dominated the generalized solver's step (profiled ~11 ms of a 31 ms substep
at 4096 envs). Joint-space d is tiny and static (ant 14, humanoid 23), so
the factorization unrolls at trace time — but as **d masked full-width
rank-1 updates**, not d^2 scalar slices: ~3d fused (n_envs, d[, k]) ops
total, which keeps both runtime AND compile time low (a scalar-sliced
unroll ran 1.7x faster than XLA's loop but took 8 min to compile; this form
compiles like any other elementwise program).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cholesky_unrolled", "cho_solve_unrolled", "solve_psd"]


def cholesky_unrolled(A: jnp.ndarray) -> jnp.ndarray:
    """Batched lower Cholesky of (..., d, d) SPD matrices.

    Right-looking: at step j, normalize column j and subtract its rank-1
    outer product from the trailing block (masked, full-width ops)."""
    d = A.shape[-1]
    idx = jnp.arange(d)
    L = A
    for j in range(d):
        diag = jnp.sqrt(jnp.maximum(L[..., j, j], 1e-12))
        col = L[..., :, j] / diag[..., None]                 # (..., d)
        col = jnp.where(idx >= j, col, 0.0)
        col = col.at[..., j].set(diag)
        # trailing update: L -= outer(col, col) on the submatrix below/right
        mask = ((idx > j)[:, None] & (idx > j)[None, :])
        L = L - mask * col[..., :, None] * col[..., None, :]
        L = L.at[..., :, j].set(col)
    # zero strict upper triangle
    return L * (idx[:, None] >= idx[None, :])


def cho_solve_unrolled(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given L = cholesky(A). b: (..., d) or (..., d, k).

    Forward/backward substitution as d masked axpy sweeps each."""
    d = L.shape[-1]
    idx = jnp.arange(d)
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    y = b
    for i in range(d):
        yi = y[..., i, :] / L[..., i, i, None]
        y = y - (idx > i)[:, None] * L[..., :, i, None] * yi[..., None, :]
        y = y.at[..., i, :].set(yi)
    x = y
    for i in reversed(range(d)):
        xi = x[..., i, :] / L[..., i, i, None]
        x = x - (idx < i)[:, None] * L[..., i, :, None] * xi[..., None, :]
        x = x.at[..., i, :].set(xi)
    return x[..., 0] if vec else x


def solve_psd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD solve via the unrolled Cholesky."""
    return cho_solve_unrolled(cholesky_unrolled(A), b)
