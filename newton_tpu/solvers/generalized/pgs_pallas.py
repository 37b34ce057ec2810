"""VMEM-resident PGS contact solve (Pallas TPU kernel).

The projected-Jacobi sweep is VPU-bound (per-env Jacobians: the batch rides
the lane axis, so the matvecs are elementwise multiply+reduce, not MXU
matmuls) — the kernel's job is (1) one HBM read of the contact Jacobian
instead of ~15 XLA re-streams and (2) the minimum FLOP count at the 0.77
TFLOP/s f32 VPU ceiling. Three structural reductions vs the naive sweep:

- **Limit rows are never materialized.** Joint-limit rows of J are signed
  one-hots (+-e_dof); their contribution to every matvec is a static-index
  row gather/scatter on the (d, wt) intermediate, so J carries only the
  3c contact rows (a 26% row cut on humanoid and nl*d*W bytes of HBM
  never written).
- **The step-size spectral bound is 3 power iterations with the final
  iterate's norm ||A u_3|| as the estimate** (tighter than the Rayleigh
  quotient by Cauchy-Schwarz, same matvec count) instead of 6 iterations
  + a dedicated matvec — 7 matvecs down to 3, with a 1.1 safety margin
  on the eigenvalue estimate (margin gated by
  tests/test_batched_step.py::test_spectral_step_bound_margin).
- **M^-1 J^T, the Delassus diagonal and the free velocity are built in
  VMEM** from (J, Minv, qd): the (3c, d, W) MJ panel never round-trips HBM.

Row layout is BLOCK order: [normal rows (c) | t1 rows (c) | t2 rows (c) |
limit-low (nl) | limit-high (nl)] so the cone projection is three contiguous
sublane slices (no in-kernel relayouts).

The core math is plain jnp shared with the XLA fallback path (``pgs_core``),
so both backends are the same algorithm by construction.
(reference behavior: solver_mujoco.py's PGS solver; kernel strategy per
/opt/skills/guides/pallas_guide.md.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["pgs_core", "pgs_solve_pallas_fused", "spectral_lam_max"]


def _take_rows(x, ld):
    """Static-index row gather: (d, wt) -> (nl, wt).

    Unrolled scalar-int slices — Mosaic lowers these as static strided
    slices (advanced-indexing gathers only lower for 2D operands, and the
    unroll is exact for the fallback path too)."""
    return jnp.concatenate([x[l][None] for l in ld], axis=0)


def spectral_iters(rows: int) -> int:
    """Power-iteration count for the step bound, keyed on the STATIC row
    count: 3 suffices for robot-scale systems (ant ~96 rows, humanoid ~130
    — the KPI path, where the divergence guard covers the residual risk at
    zero steady-state cost); very large coupled systems (deep stacks — an
    uncapped 10-box tower carries ~670 rows in one env) have clustered
    spectra where 3 iterations undershoot lambda_max by more than the 1.1
    margin and the Jacobi sweep turns non-contractive (ADVICE r4 low #4 —
    observed as slow oscillation growth then blow-up on 8+ box towers).
    Both the batched and the vmapped path key on the same static quantity,
    preserving their bit-parity."""
    return 3 if rows < 192 else 8


def spectral_lam_max(Avec, diag, act, iters: int = 3):
    """Matrix-free lower estimate of lambda_max(D^-1/2 A D^-1/2).

    ``iters`` power iterations from the active-row indicator; the estimate
    is ||A u_k|| with u_k the normalized last iterate — strictly tighter
    than the Rayleigh quotient <u, A u> (Cauchy-Schwarz) at the same
    matvec count. Callers apply a 1.1 safety margin for the remaining
    underestimate; the margin is gated by
    tests/test_batched_step.py::test_spectral_step_bound_margin.
    Rows on axis 0, env batch on the minor axis."""
    inv_sqrt_d = jax.lax.rsqrt(diag)
    u = act
    u = u / jnp.maximum(
        jnp.sqrt(jnp.sum(u * u, axis=0, keepdims=True)), 1.0)
    lam_max = None
    for it in range(iters):
        u2 = inv_sqrt_d * Avec(inv_sqrt_d * u) * act
        nrm = jnp.sqrt(jnp.sum(u2 * u2, axis=0, keepdims=True))
        if it == iters - 1:
            lam_max = nrm[0]
        u = u2 / jnp.maximum(nrm, 1e-9)
    return lam_max


def pgs_core(J, MJ, cols, diag, v_free, b, act, mu, lam0, *, c, nl, ld,
             iters, omega, use_cone):
    """Power-iteration step cap + projected-Jacobi sweep.

    All arrays have the env batch on the minor axis. J/MJ hold ONLY the
    3c contact rows (3c, d, Wt); the 2*nl joint-limit rows are signed
    one-hots handled via static gathers: ``ld`` is the static tuple of
    limited dof indices and ``cols`` = Minv[:, ld] (d, nl, Wt). diag /
    v_free / b / act / lam0 cover all r = 3c + 2*nl rows; mu is (c, Wt).
    Returns (lam (r, Wt), dqd (d, Wt))."""
    r3 = 3 * c

    def Avec(x):
        # partial slice and newaxis must be separate steps (the combined
        # x[:r3, None, :] takes jnp's gather path, which Mosaic rejects)
        xc = x[:r3]
        tmp = (MJ * xc[:, None, :]).sum(axis=0)         # (d, Wt)
        if nl:
            w = x[r3:r3 + nl] - x[r3 + nl:]             # (nl, Wt)
            tmp = tmp + (cols * w[None, :, :]).sum(axis=1)
        y = (J * tmp[None, :, :]).sum(axis=1)           # (3c, Wt)
        if nl:
            tl = _take_rows(tmp, ld)                    # (nl, Wt)
            y = jnp.concatenate([y, tl, -tl], axis=0)
        return y

    # diagonally-scaled Jacobi diverges when many rows couple (humanoid
    # pile-ups); cap the step by a matrix-free power-iteration estimate of
    # lambda_max(D^-1/2 A D^-1/2) so the sweep stays a contraction
    # (spectral_lam_max above). The estimate is a lower bound that can
    # undershoot by >1.1x on rank-deficient Delassus spectra (ADVICE r4),
    # so the sweep also carries a per-env divergence guard: where
    # ||dlam|| grows between iterations (the signature of a
    # non-contractive projected-Jacobi map — projection is non-expansive,
    # so a contraction never grows it), the step halves. Gated by
    # tests/test_batched_step.py::test_pgs_divergence_guard.
    lam_max = spectral_lam_max(Avec, diag, act,
                               iters=spectral_iters(act.shape[0]))
    step_scale = jnp.minimum(1.0, 1.8 / jnp.maximum(1.1 * lam_max, 1e-9))
    scale_cur = omega * step_scale                      # (Wt,)

    lam = lam0
    prev_dn = None
    for _ in range(iters):
        res = Avec(lam) + v_free - b
        lam_full = lam - (scale_cur[None, :] / diag) * res
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
            parts.append(jnp.maximum(lam_full[r3:], 0.0))
        lam_new = jnp.concatenate(parts, axis=0) * act
        lam_new = jnp.where(jnp.isfinite(lam_new), lam_new, 0.0)
        dlt = lam_new - lam
        dn = jnp.sum(dlt * dlt, axis=0)                 # (Wt,)
        if prev_dn is not None:
            # 2% tolerance: float32 jitter around the fixed point and
            # active-set toggles must not bleed the step; true divergence
            # grows ||dlam|| geometrically and is caught within a sweep
            scale_cur = jnp.where(dn > prev_dn * 1.02, scale_cur * 0.5,
                                  scale_cur)
        prev_dn = dn
        lam = lam_new
    lamc = lam[:r3]
    dqd = (MJ * lamc[:, None, :]).sum(axis=0)           # (d, Wt)
    if nl:
        wl = lam[r3:r3 + nl] - lam[r3 + nl:]
        dqd = dqd + (cols * wl[None, :, :]).sum(axis=1)
    return lam, dqd


def _kernel_fused(J_ref, Minv_ref, qd_ref, b_ref, act_ref, mu_ref,
                  lam0_ref, lam_ref, dqd_ref, *, c, nl, ld, iters, omega,
                  use_cone, diag_scale, reg):
    """Fused variant: M^-1 J^T, the Delassus diagonal and the free velocity
    are computed in VMEM from (J, Minv, qd) — the (3c, d, W) MJ panel never
    round-trips HBM and the XLA assembly passes over J disappear."""
    J = J_ref[:]                                        # (3c, d, wt)
    Minv = Minv_ref[:]                                  # (d, d, wt)
    qd = qd_ref[:]                                      # (d, wt)
    d = J.shape[1]
    # int-index and newaxis must be separate steps: fusing them
    # (J[:, e, None, :]) takes jnp's advanced-indexing gather path, which
    # Mosaic only lowers for 2D operands
    MJ = sum(J[:, e][:, None, :] * Minv[e][None, :, :] for e in range(d))
    diag = (J * MJ).sum(axis=1) * diag_scale + reg      # (3c, wt)
    v_free = (J * qd[None, :, :]).sum(axis=1)           # (3c, wt)
    cols = None
    if nl:
        # Minv columns/diagonal at the limited dofs: static slices
        cols = jnp.concatenate([Minv[:, l][:, None] for l in ld], axis=1)
        dlim = jnp.concatenate([Minv[l, l][None] for l in ld], axis=0)
        dlim = dlim * diag_scale + reg                  # (nl, wt)
        diag = jnp.concatenate([diag, dlim, dlim], axis=0)
        vlim = _take_rows(qd, ld)                       # (nl, wt)
        v_free = jnp.concatenate([v_free, vlim, -vlim], axis=0)
    lam, dqd = pgs_core(
        J, MJ, cols, diag, v_free, b_ref[:], act_ref[:], mu_ref[:],
        lam0_ref[:], c=c, nl=nl, ld=ld, iters=iters, omega=omega,
        use_cone=use_cone)
    lam_ref[:] = lam
    dqd_ref[:] = dqd


def pgs_solve_pallas_fused(J, Minv, qd_g, b, act, mu, lam0, *, c, nl, ld,
                           iters, omega, use_cone, diag_scale, reg,
                           interpret=False):
    """Fused pallas_call: builds M^-1 J^T / diag / v_free in VMEM.

    J: contact rows only (3c, d, W); Minv: (d, d, W); qd_g: (d, W);
    b/act/lam0: full r = 3c + 2*nl rows (r, W); mu: (c, W); ``ld`` is the
    static tuple of limited dof indices (len nl). ``diag_scale`` carries
    the impratio factor, ``reg`` the Tikhonov floor.
    Returns (lam (r, W), dqd (d, W))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r3, d, W = J.shape
    assert r3 == 3 * c
    r = r3 + 2 * nl
    assert W % 128 == 0, f"env batch {W} must be lane-aligned"
    # tile budget: J/MJ blocks are double-buffered and the matvec creates
    # (3c, d, wt) temporaries — keep ~6 copies under ~12 MB of VMEM
    # (measured: wt=256 at a 14 MB budget is ~5% SLOWER than wt=128 here —
    # the tighter tile double-buffers better against the grid pipeline)
    wt = 512
    while W % wt or (wt > 128 and r3 * d * wt * 4 * 6 > 12e6):
        wt //= 2
    n_tiles = W // wt

    kern = functools.partial(_kernel_fused, c=c, nl=nl, ld=tuple(ld),
                             iters=iters, omega=omega, use_cone=use_cone,
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
        in_specs=[spec3(r3, d), spec3(d, d), spec2(d), spec2(r),
                  spec2(r), spec2(c), spec2(r)],
        out_specs=(spec2(r), spec2(d)),
        out_shape=(jax.ShapeDtypeStruct((r, W), J.dtype),
                   jax.ShapeDtypeStruct((d, W), J.dtype)),
        interpret=interpret,
    )(J, Minv, qd_g, b, act, mu, lam0)
    return lam, dqd
