"""VMEM-resident PGS contact solve (Pallas TPU kernel).

The projected-Jacobi sweep reads the contact Jacobian J and M^-1 J^T
(each (rows, dofs, W) — ~21 MB at 4096 ant envs) once per matvec; with the
6 power-iteration passes plus `iterations` PGS passes the XLA path re-streams
~630 MB of HBM per substep. This kernel tiles the env axis, keeps both
operands in VMEM for all passes, and writes back only lam and the velocity
update — one HBM read instead of fifteen.

Row layout is BLOCK order: [normal rows (c) | t1 rows (c) | t2 rows (c) |
limit-low (nl) | limit-high (nl)] so the cone projection is three contiguous
sublane slices (no in-kernel relayouts).

The core math is plain jnp shared with the XLA fallback path
(``_pgs_core``), so both backends are the same algorithm by construction.
(reference behavior: solver_mujoco.py's PGS solver; kernel strategy per
/opt/skills/guides/pallas_guide.md.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["pgs_core", "pgs_solve_pallas"]


def pgs_core(J, MJ, diag, v_free, b, act, mu, lam0, *, c, nl, iters,
             omega, use_cone):
    """Power-iteration step cap + projected-Jacobi sweep.

    All arrays have the env batch on the minor axis: J/MJ (r, d, Wt), the
    rest (r or c, Wt). Returns (lam (r, Wt), dqd (d, Wt))."""

    def Avec(x):
        tmp = (MJ * x[:, None, :]).sum(axis=0)          # (d, Wt)
        return (J * tmp[None, :, :]).sum(axis=1)        # (r, Wt)

    inv_sqrt_d = jax.lax.rsqrt(diag)
    u = act
    u = u / jnp.maximum(
        jnp.sqrt(jnp.sum(u * u, axis=0, keepdims=True)), 1.0)
    for _ in range(6):
        u2 = inv_sqrt_d * Avec(inv_sqrt_d * u) * act
        u = u2 / jnp.maximum(
            jnp.sqrt(jnp.sum(u2 * u2, axis=0, keepdims=True)), 1e-9)
    lam_max = jnp.sum(u * (inv_sqrt_d * Avec(inv_sqrt_d * u)), axis=0)
    step_scale = jnp.minimum(1.0, 1.8 / jnp.maximum(lam_max, 1e-9))
    step = (omega * step_scale)[None, :] / diag

    lam = lam0
    for _ in range(iters):
        res = Avec(lam) + v_free - b
        lam_full = lam - step * res
        ln = jnp.maximum(lam_full[0:c], 0.0)
        cap = mu * ln
        lt1 = lam_full[c:2 * c]
        lt2 = lam_full[2 * c:3 * c]
        if use_cone:
            tmag = jnp.sqrt(lt1 * lt1 + lt2 * lt2)
            sc = jnp.minimum(cap / jnp.maximum(tmag, 1e-9), 1.0)
            lt1 = lt1 * sc
            lt2 = lt2 * sc
        else:
            lt1 = jnp.clip(lt1, -cap, cap)
            lt2 = jnp.clip(lt2, -cap, cap)
        parts = [ln, lt1, lt2]
        if nl:
            parts.append(jnp.maximum(lam_full[3 * c:], 0.0))
        lam = jnp.concatenate(parts, axis=0) * act
        lam = jnp.where(jnp.isfinite(lam), lam, 0.0)
    dqd = (MJ * lam[:, None, :]).sum(axis=0)            # (d, Wt)
    return lam, dqd


def _kernel(J_ref, MJ_ref, diag_ref, vfree_ref, b_ref, act_ref, mu_ref,
            lam0_ref, lam_ref, dqd_ref, *, c, nl, iters, omega, use_cone):
    lam, dqd = pgs_core(
        J_ref[:], MJ_ref[:], diag_ref[:], vfree_ref[:], b_ref[:],
        act_ref[:], mu_ref[:], lam0_ref[:],
        c=c, nl=nl, iters=iters, omega=omega, use_cone=use_cone)
    lam_ref[:] = lam
    dqd_ref[:] = dqd


def _kernel_fused(J_ref, Minv_ref, qd_ref, b_ref, act_ref, mu_ref,
                  lam0_ref, lam_ref, dqd_ref, *, c, nl, iters, omega,
                  use_cone, diag_scale, reg):
    """Fused variant: M^-1 J^T, the Delassus diagonal and the free velocity
    are computed in VMEM from (J, Minv, qd) — the (r, d, W) MJ panel never
    round-trips HBM and the three XLA assembly passes over J disappear."""
    J = J_ref[:]                                        # (r, d, wt)
    Minv = Minv_ref[:]                                  # (d, d, wt)
    qd = qd_ref[:]                                      # (d, wt)
    d = J.shape[1]
    # int-index and newaxis must be separate steps: fusing them
    # (J[:, e, None, :]) takes jnp's advanced-indexing gather path, which
    # Mosaic only lowers for 2D operands
    MJ = sum(J[:, e][:, None, :] * Minv[e][None, :, :] for e in range(d))
    diag = (J * MJ).sum(axis=1) * diag_scale + reg      # (r, wt)
    v_free = (J * qd[None, :, :]).sum(axis=1)           # (r, wt)
    lam, dqd = pgs_core(
        J, MJ, diag, v_free, b_ref[:], act_ref[:], mu_ref[:], lam0_ref[:],
        c=c, nl=nl, iters=iters, omega=omega, use_cone=use_cone)
    lam_ref[:] = lam
    dqd_ref[:] = dqd


def pgs_solve_pallas(J, MJ, diag, v_free, b, act, mu, lam0, *, c, nl,
                     iters, omega, use_cone, interpret=False):
    """Tiled pallas_call wrapper around ``pgs_core``.

    J/MJ: (r, d, W); diag/v_free/b/act/lam0: (r, W); mu: (c, W).
    W must be a multiple of 128. Returns (lam (r, W), dqd (d, W))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, d, W = J.shape
    assert W % 128 == 0, f"env batch {W} must be lane-aligned"
    # tile budget: J/MJ blocks are double-buffered and the matvec creates
    # (r, d, wt) temporaries — keep ~6 copies under ~12 MB of VMEM
    wt = 512
    while W % wt or (wt > 128 and r * d * wt * 4 * 6 > 12e6):
        wt //= 2
    n_tiles = W // wt

    kern = functools.partial(_kernel, c=c, nl=nl, iters=iters,
                             omega=omega, use_cone=use_cone)

    def spec3(rows):
        return pl.BlockSpec((rows, d, wt), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def spec2(rows):
        return pl.BlockSpec((rows, wt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    lam, dqd = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[spec3(r), spec3(r), spec2(r), spec2(r), spec2(r),
                  spec2(r), spec2(c), spec2(r)],
        out_specs=(spec2(r), spec2(d)),
        out_shape=(jax.ShapeDtypeStruct((r, W), J.dtype),
                   jax.ShapeDtypeStruct((d, W), J.dtype)),
        interpret=interpret,
    )(J, MJ, diag, v_free, b, act, mu, lam0)
    return lam, dqd


def pgs_solve_pallas_fused(J, Minv, qd_g, b, act, mu, lam0, *, c, nl,
                           iters, omega, use_cone, diag_scale, reg,
                           interpret=False):
    """Fused pallas_call: builds M^-1 J^T / diag / v_free in VMEM.

    J: (r, d, W); Minv: (d, d, W); qd_g: (d, W); b/act/lam0: (r, W);
    mu: (c, W). ``diag_scale`` carries the impratio factor, ``reg`` the
    Tikhonov floor. Returns (lam (r, W), dqd (d, W))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, d, W = J.shape
    assert W % 128 == 0, f"env batch {W} must be lane-aligned"
    wt = 512
    while W % wt or (wt > 128 and r * d * wt * 4 * 6 > 12e6):
        wt //= 2
    n_tiles = W // wt

    kern = functools.partial(_kernel_fused, c=c, nl=nl, iters=iters,
                             omega=omega, use_cone=use_cone,
                             diag_scale=diag_scale, reg=reg)

    def spec3(rows, dd):
        return pl.BlockSpec((rows, dd, wt), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def spec2(rows):
        return pl.BlockSpec((rows, wt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    lam, dqd = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[spec3(r, d), spec3(d, d), spec2(d), spec2(r),
                  spec2(r), spec2(c), spec2(r)],
        out_specs=(spec2(r), spec2(d)),
        out_shape=(jax.ShapeDtypeStruct((r, W), J.dtype),
                   jax.ShapeDtypeStruct((d, W), J.dtype)),
        interpret=interpret,
    )(J, Minv, qd_g, b, act, mu, lam0)
    return lam, dqd
