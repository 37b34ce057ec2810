"""MuJoCo-fidelity actuation model: gain/bias/dyntype + muscle FLV curves.

TPU-native equivalent of the reference's actuator semantics
(reference newton/_src/solvers/mujoco/solver_mujoco.py:500-529 CtrlSource/
CtrlType and the MJCF actuator mapping) — but instead of bridging into
MuJoCo-Warp, the full actuator pipeline runs inside the jitted step:

    force_i = gain_i(L, V) * input_i + bias_i(L, V)
    input_i = act_i            (dyntype != NONE — activation state)
            = clamp(ctrl_i)    (dyntype == NONE)
    tau    += moment_i^T * clamp(force_i)

where L/V are transmission length/velocity (gear-scaled joint coordinates,
or fixed-tendon lengths). Activation dynamics (integrator / filter /
filterexact / muscle) advance ``state.custom["mjc:act"]`` each step.

The muscle gain/bias/dynamics functions follow MuJoCo's documented
mju_muscleGain / mju_muscleBias / mju_muscleDynamics semantics (FLV curves);
tests/test_parity_mujoco.py checks them bit-close against MuJoCo-C.

All tables are static per-model numpy (host side, built by the MJCF
importer); the runtime path is pure jnp over (A,) actuator arrays — one
gather, elementwise math, one scatter-add. Batched over envs for free under
vmap and in the transposed-SoA fast path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["MJCActuation", "DYN_NONE", "DYN_INTEGRATOR", "DYN_FILTER",
           "DYN_FILTEREXACT", "DYN_MUSCLE", "GAIN_FIXED", "GAIN_AFFINE",
           "GAIN_MUSCLE", "BIAS_NONE", "BIAS_AFFINE", "BIAS_MUSCLE",
           "muscle_gain", "muscle_bias", "muscle_dynamics",
           "actuator_forces"]

DYN_NONE, DYN_INTEGRATOR, DYN_FILTER, DYN_FILTEREXACT, DYN_MUSCLE = 0, 1, 2, 3, 4
GAIN_FIXED, GAIN_AFFINE, GAIN_MUSCLE = 0, 1, 2
BIAS_NONE, BIAS_AFFINE, BIAS_MUSCLE = 0, 1, 2

_MINVAL = 1e-15


class MJCActuation:
    """Static per-model actuator tables (host numpy).

    Joint transmission only targets single-dof joints (hinge/slide — the
    case every benchmark robot uses); tendon transmission routes through
    fixed tendons. ``coord``/``dof`` are global coordinate/dof indices;
    tendon actuators have ``tendon >= 0`` and ``dof == -1``.
    """

    __slots__ = ("n", "dof", "coord", "tendon", "sten", "gear",
                 "dyntype", "dynprm",
                 "gaintype", "gainprm", "biastype", "biasprm",
                 "ctrlrange", "forcerange", "actrange",
                 "ctrllimited", "forcelimited", "actlimited",
                 "lengthrange", "acc0", "has_act", "has_muscle",
                 "_acc0_done")

    def __init__(self, n: int):
        self.n = n
        self.dof = -np.ones(n, np.int32)
        self.coord = -np.ones(n, np.int32)
        self.tendon = -np.ones(n, np.int32)
        self.sten = -np.ones(n, np.int32)       # spatial tendon transmission
        self.gear = np.ones(n, np.float64)
        self.dyntype = np.zeros(n, np.int32)
        self.dynprm = np.zeros((n, 3), np.float64)
        self.gaintype = np.zeros(n, np.int32)
        self.gainprm = np.zeros((n, 9), np.float64)
        self.gainprm[:, 0] = 1.0
        self.biastype = np.zeros(n, np.int32)
        self.biasprm = np.zeros((n, 9), np.float64)
        self.ctrlrange = np.tile([-1e30, 1e30], (n, 1))
        self.forcerange = np.tile([-1e30, 1e30], (n, 1))
        self.actrange = np.tile([-1e30, 1e30], (n, 1))
        self.ctrllimited = np.zeros(n, bool)
        self.forcelimited = np.zeros(n, bool)
        self.actlimited = np.zeros(n, bool)
        self.lengthrange = np.zeros((n, 2), np.float64)
        self.acc0 = np.ones(n, np.float64)
        self.has_act = False
        self.has_muscle = False
        self._acc0_done = False

    def finish(self):
        self.has_act = bool((self.dyntype != DYN_NONE).any())
        self.has_muscle = bool(
            (self.dyntype == DYN_MUSCLE).any()
            or (self.gaintype == GAIN_MUSCLE).any()
            or (self.biastype == BIAS_MUSCLE).any())
        return self


# ----------------------------------------------------------------------
# Muscle model (MuJoCo mju_muscle* semantics, computation.rst "Muscles")
# ----------------------------------------------------------------------

def _bump(L, A, mid, B):
    """MuJoCo's piecewise-quadratic force-length bump over [A, mid, B]."""
    left = 0.5 * (A + mid)
    right = 0.5 * (mid + B)
    t_a = (L - A) / jnp.maximum(left - A, _MINVAL)
    t_l = (mid - L) / jnp.maximum(mid - left, _MINVAL)
    t_r = (L - mid) / jnp.maximum(right - mid, _MINVAL)
    t_b = (B - L) / jnp.maximum(B - right, _MINVAL)
    out = jnp.where(L < left, 0.5 * t_a * t_a,
                    jnp.where(L < mid, 1.0 - 0.5 * t_l * t_l,
                              jnp.where(L < right, 1.0 - 0.5 * t_r * t_r,
                                        0.5 * t_b * t_b)))
    return jnp.where((L <= A) | (L >= B), 0.0, out)


def _muscle_LV(length, vel, lengthrange, acc0, prm):
    """Normalized muscle length/velocity and resolved peak force."""
    r0, r1 = prm[..., 0], prm[..., 1]
    force, scale = prm[..., 2], prm[..., 3]
    vmax = prm[..., 6]
    L0 = (lengthrange[..., 1] - lengthrange[..., 0]) / jnp.maximum(
        r1 - r0, _MINVAL)
    L = r0 + (length - lengthrange[..., 0]) / jnp.maximum(L0, _MINVAL)
    V = vel / jnp.maximum(L0 * vmax, _MINVAL)
    F = jnp.where(force < 0, scale / jnp.maximum(acc0, _MINVAL), force)
    return L, V, F


def muscle_gain(length, vel, lengthrange, acc0, prm):
    """Active FLV gain (negative: muscles pull). MuJoCo mju_muscleGain."""
    lmin, lmax = prm[..., 4], prm[..., 5]
    fvmax = prm[..., 8]
    L, V, F = _muscle_LV(length, vel, lengthrange, acc0, prm)
    FL = _bump(L, lmin, 1.0, lmax)
    y = fvmax - 1.0
    FV = jnp.where(
        V <= -1.0, 0.0,
        jnp.where(V <= 0.0, (V + 1.0) * (V + 1.0),
                  jnp.where(V <= y, fvmax - (y - V) * (y - V)
                            / jnp.maximum(y, _MINVAL), fvmax)))
    return -F * FL * FV


def muscle_bias(length, lengthrange, acc0, prm):
    """Passive force-length curve (negative). MuJoCo mju_muscleBias."""
    lmax = prm[..., 5]
    fpmax = prm[..., 7]
    L, _, F = _muscle_LV(length, jnp.zeros_like(length), lengthrange,
                         acc0, prm)
    b = 0.5 * (lmax + 1.0)
    x_mid = (L - 1.0) / jnp.maximum(b - 1.0, _MINVAL)
    x_hi = (L - b) / jnp.maximum(b - 1.0, _MINVAL)
    FP = jnp.where(L <= 1.0, 0.0,
                   jnp.where(L <= b, 0.5 * x_mid * x_mid, 0.5 + x_hi))
    return -F * fpmax * FP


def muscle_dynamics(ctrl, act, prm):
    """Activation rate d(act)/dt with smooth/hard switching.
    MuJoCo mju_muscleDynamics."""
    ctrlclamp = jnp.clip(ctrl, 0.0, 1.0)
    actclamp = jnp.clip(act, 0.0, 1.0)
    tau_act = prm[..., 0] * (0.5 + 1.5 * actclamp)
    tau_deact = prm[..., 1] / (0.5 + 1.5 * actclamp)
    tausmooth = prm[..., 2]
    dctrl = ctrlclamp - act
    # hard switch
    tau_hard = jnp.where(dctrl > 0, tau_act, tau_deact)
    # smooth sigmoid blend over width tausmooth
    x = dctrl / jnp.maximum(tausmooth, _MINVAL) + 0.5
    xs = jnp.clip(x, 0.0, 1.0)
    sig = xs * xs * xs * (3.0 * xs * (2.0 * xs - 5.0) + 10.0)
    tau_smooth = tau_deact + (tau_act - tau_deact) * sig
    tau = jnp.where(tausmooth > 0, tau_smooth, tau_hard)
    return dctrl / jnp.maximum(tau, _MINVAL)


# ----------------------------------------------------------------------
# Forward actuation
# ----------------------------------------------------------------------

def actuator_forces(au: MJCActuation, model, q, qd, ctrl, act, dt,
                    sten=None):
    """Compute generalized actuator torques and the next activation state.

    Layout-agnostic along the entity axis: ``q``/``qd`` may be flat
    ``(nq,)``/``(D,)`` (per-env path / vmap) or transposed ``(nq, W)`` /
    ``(D, W)`` (the batched structure-of-arrays fast path) — all indexing
    is on axis 0 with static tables, so both shapes hit the same code.

    Args:
        ctrl: (A,) or (A, W) control (``control.custom["mjc:ctrl"]``).
        act: matching activation state or None.
        sten: spatial-tendon transmission data (L, V, J) with L/V shaped
            ``(Ts, ...)`` and J ``(Ts, D, ...)`` (from eval_spatial_tendons),
            required when any ``au.sten >= 0``.
    Returns:
        (tau_delta like qd, act_new like act or None, force like ctrl,
        dfdv ∂force/∂velocity like ctrl — for the implicit integrators)
    """
    dtype = q.dtype
    dof = np.maximum(au.dof, 0)
    coord = np.maximum(au.coord, 0)
    extra = q.ndim - 1                       # trailing batch axes (0 or 1)

    def tbl(a):
        x = jnp.asarray(a, dtype=dtype)
        return x.reshape(x.shape + (1,) * extra)

    def itbl(a):
        x = jnp.asarray(a)
        return x.reshape(x.shape + (1,) * extra)

    gear = tbl(au.gear)
    is_joint = itbl(au.dof >= 0)

    # transmission length/velocity
    length = gear * q[coord]
    velocity = gear * qd[dof]
    if (au.tendon >= 0).any():
        st = model.structure
        tc = tbl(np.asarray(st.tendon_coef))             # (T, K, 1?)
        t_len = jnp.sum(tc * q[st.tendon_coord], axis=1)
        t_vel = jnp.sum(tc * qd[st.tendon_dof], axis=1)
        tid = np.maximum(au.tendon, 0)
        is_ten = itbl(au.tendon >= 0)
        length = jnp.where(is_ten, t_len[tid], length)
        velocity = jnp.where(is_ten, t_vel[tid], velocity)
    if (au.sten >= 0).any() and sten is not None:
        L_st, V_st, _ = sten
        sid = np.maximum(au.sten, 0)
        is_st = itbl(au.sten >= 0)
        # MuJoCo tendon transmission: actuator length = gear * ten_length
        length = jnp.where(is_st, gear * L_st[sid], length)
        velocity = jnp.where(is_st, gear * V_st[sid], velocity)

    cr = np.asarray(au.ctrlrange)
    ctrl_c = jnp.where(itbl(au.ctrllimited),
                       jnp.clip(ctrl, tbl(cr[:, 0]), tbl(cr[:, 1])), ctrl)

    lr = np.asarray(au.lengthrange)
    lr2 = jnp.stack([jnp.broadcast_to(tbl(lr[:, 0]), length.shape),
                     jnp.broadcast_to(tbl(lr[:, 1]), length.shape)], axis=-1)
    acc0 = tbl(au.acc0)
    gp = np.asarray(au.gainprm)
    bp = np.asarray(au.biasprm)
    gp9 = jnp.stack([jnp.broadcast_to(tbl(gp[:, k]), length.shape)
                     for k in range(9)], axis=-1)
    bp9 = jnp.stack([jnp.broadcast_to(tbl(bp[:, k]), length.shape)
                     for k in range(9)], axis=-1)
    dyntype = itbl(au.dyntype)
    gaintype = itbl(au.gaintype)
    biastype = itbl(au.biastype)

    # actuator input: activation state where dynamics are present
    if au.has_act and act is not None:
        inp = jnp.where(dyntype != DYN_NONE, act, ctrl_c)
    else:
        inp = ctrl_c

    # gain
    gain = jnp.broadcast_to(tbl(gp[:, 0]), length.shape)
    gain = jnp.where(gaintype == GAIN_AFFINE,
                     tbl(gp[:, 0]) + tbl(gp[:, 1]) * length
                     + tbl(gp[:, 2]) * velocity, gain)
    if au.has_muscle:
        gain = jnp.where(gaintype == GAIN_MUSCLE,
                         muscle_gain(length, velocity, lr2,
                                     jnp.broadcast_to(acc0, length.shape),
                                     gp9), gain)

    # bias
    bias = jnp.zeros_like(length)
    bias = jnp.where(biastype == BIAS_AFFINE,
                     tbl(bp[:, 0]) + tbl(bp[:, 1]) * length
                     + tbl(bp[:, 2]) * velocity, bias)
    if au.has_muscle:
        bias = jnp.where(biastype == BIAS_MUSCLE,
                         muscle_bias(length, lr2,
                                     jnp.broadcast_to(acc0, length.shape),
                                     bp9), bias)

    force = gain * inp + bias
    fr = np.asarray(au.forcerange)
    force = jnp.where(itbl(au.forcelimited),
                      jnp.clip(force, tbl(fr[:, 0]), tbl(fr[:, 1])), force)

    # ∂force/∂velocity per actuator — consumed by the implicit/implicitfast
    # integrators (MuJoCo mjd_actuator_vel semantics: affine gain/bias
    # velocity coefficients; muscle/clamp derivatives omitted like MuJoCo's
    # implicitfast does for the non-smooth parts)
    dfdv = jnp.where(gaintype == GAIN_AFFINE, tbl(gp[:, 2]) * inp,
                     jnp.zeros_like(length))
    dfdv = dfdv + jnp.where(biastype == BIAS_AFFINE,
                            jnp.broadcast_to(tbl(bp[:, 2]), length.shape),
                            jnp.zeros_like(length))

    # map to generalized torques: joint transmission tau += gear * force;
    # tendon transmission scatters through the tendon coefficient rows
    tau = jnp.zeros_like(qd)
    f_joint = jnp.where(is_joint, gear * force, jnp.zeros_like(force))
    tau = tau.at[dof].add(f_joint)
    if (au.tendon >= 0).any():
        st = model.structure
        for a in np.nonzero(au.tendon >= 0)[0]:
            t = int(au.tendon[a])
            coefs = tbl(np.asarray(st.tendon_coef[t]))
            dofs = np.asarray(st.tendon_dof[t])
            tau = tau.at[dofs].add(coefs * float(au.gear[a]) * force[a])
    if (au.sten >= 0).any() and sten is not None:
        # spatial tendon: scatter through the wrap-aware moment row
        J_st = sten[2]                                   # (Ts, D, ...)
        for a in np.nonzero(au.sten >= 0)[0]:
            t = int(au.sten[a])
            tau = tau + J_st[t] * (float(au.gear[a]) * force[a])[None]

    # activation dynamics (advance after force computation, MuJoCo order)
    act_new = None
    if au.has_act and act is not None:
        dynprm = np.asarray(au.dynprm)
        dp3 = jnp.stack([jnp.broadcast_to(tbl(dynprm[:, k]), length.shape)
                         for k in range(3)], axis=-1)
        rate = jnp.zeros_like(act)
        rate = jnp.where(dyntype == DYN_INTEGRATOR, ctrl_c, rate)
        tau_f = jnp.maximum(tbl(dynprm[:, 0]), _MINVAL)
        rate = jnp.where(dyntype == DYN_FILTER, (ctrl_c - act) / tau_f, rate)
        if au.has_muscle:
            rate = jnp.where(dyntype == DYN_MUSCLE,
                             muscle_dynamics(ctrl_c, act, dp3), rate)
        act_new = act + dt * rate
        # exact filter integrates in closed form
        act_new = jnp.where(
            dyntype == DYN_FILTEREXACT,
            act + (ctrl_c - act) * (1.0 - jnp.exp(-dt / tau_f)), act_new)
        ar = np.asarray(au.actrange)
        act_new = jnp.where(itbl(au.actlimited),
                            jnp.clip(act_new, tbl(ar[:, 0]), tbl(ar[:, 1])),
                            act_new)
        act_new = jnp.where(dyntype == DYN_NONE, act, act_new)

    return tau, act_new, force, dfdv
