"""Generalized-coordinate solver: batched smooth dynamics + contact impulses.

TPU-native replacement for the reference's SolverMuJoCo bridge
(reference newton/_src/solvers/mujoco/solver_mujoco.py:430, step :3830) and
SolverFeatherstone (featherstone/solver_featherstone.py:57). Rather than
converting the Model to MjModel and stepping an external engine, the Newton
Model IS the solver's model: per step we run FK, batched CRBA, RNEA bias,
actuation/limit torques, an implicit-damping linear solve (batched Cholesky
over articulation groups — (n_envs, nv, nv), MXU-friendly), and a projected
Jacobi contact-impulse solve with pyramidal friction in joint space
(Delassus A = J M^-1 J^T per env).

Joint coordinates are the source of truth (like the reference's MuJoCo
backend); body poses/velocities are FK outputs written back to the State.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...math import (quat_conjugate, quat_mul, quat_normalize, quat_rotate,
                     quat_to_axis_angle)
from ...sim.articulation import eval_fk
from ...sim.contacts import Contacts
from ...sim.control import Control
from ...sim.model import Model
from ...sim.state import State
from ..solver import SolverBase
from .dynamics import (
    dof_subspace,
    get_generalized_cache,
    group_bias_forces,
    group_external_forces,
    group_mass_matrix,
    integrate_coords,
)
from .linalg import cho_solve_unrolled, cholesky_unrolled

__all__ = ["SolverFeatherstone", "SolverMuJoCo"]


class _GroupContacts:
    """Static per-group contact-slot plan.

    slots: (n, c) contact-slot indices per env; lb0/lb1: local body index
    within the group's body list (-1 = static shape) — shape (c,) when every
    env shares one slot pattern (uniform), else (n, c) per-env. valid is a
    (n, c) mask marking padded entries in heterogeneous layouts (padded
    slots index one-past-the-end so clamped reads are masked off and
    scatters drop).

    Cross-env/-group contacts (Newton's third law): a contact whose two
    bodies live in different (group, env) cells appears in BOTH cells'
    plans — each side solves the shared relative-velocity constraint with
    the combined effective mass and applies its own half of the impulse
    pair. ``ob`` is the global body index of the non-owned side (-1 =
    static or same-env), used for its point inverse mass (Delassus term)
    and its pre-step point velocity (moving-support target); ``w`` is the
    force-report weight (0.5 on each of a duplicated pair).
    """

    __slots__ = ("slots", "lb0", "lb1", "c", "valid", "ob", "w")

    def __init__(self, slots, lb0, lb1, valid=None, ob=None, w=None):
        self.slots = slots
        self.lb0 = lb0
        self.lb1 = lb1
        self.c = slots.shape[1]
        self.valid = valid
        self.ob = ob if ob is not None else -np.ones_like(lb0)
        self.w = w if w is not None else np.ones(lb0.shape, np.float32)

    @property
    def uniform(self):
        return self.lb0.ndim == 1


class _TableLookup:
    """Dict-like ``get``/``in``/``[]`` over flat (gi, e, local) arrays."""

    __slots__ = ("gi", "e", "loc")

    def __init__(self, gi, e, loc):
        self.gi, self.e, self.loc = gi, e, loc

    def get(self, i, default=None):
        if i is None or i < 0 or i >= len(self.gi) or self.gi[i] < 0:
            return default
        return (int(self.gi[i]), int(self.e[i]), int(self.loc[i]))

    def __contains__(self, i):
        return self.get(i) is not None

    def __getitem__(self, i):
        v = self.get(i)
        if v is None:
            raise KeyError(i)
        return v


def _body_env_tables(groups, n_body):
    """Flat body -> (group, env, local-body) lookup arrays (vectorized
    replacement for the per-body dict; finalize-time cost is O(bodies) numpy,
    not O(worlds x bodies) Python at the reference's 8192-world shapes)."""
    gi_of = -np.ones(n_body, dtype=np.int32)
    e_of = -np.ones(n_body, dtype=np.int32)
    lb_of = -np.ones(n_body, dtype=np.int32)
    for gi, g in enumerate(groups):
        bi = np.asarray(g.body_idx)                          # (n, b)
        em = np.broadcast_to(np.arange(g.n, dtype=np.int32)[:, None],
                             bi.shape)
        lbm = np.broadcast_to(np.arange(bi.shape[1],
                                        dtype=np.int32)[None, :], bi.shape)
        ok = bi >= 0
        gi_of[bi[ok]] = gi
        e_of[bi[ok]] = em[ok]
        lb_of[bi[ok]] = lbm[ok]
    return gi_of, e_of, lb_of


def _plan_group_contacts(st, groups):
    """Assign contact slots to (group, env); heterogeneous layouts are
    padded to the max per-env count with per-env local-body tables
    (reference: mujoco contact batching handles ragged worlds the same way
    by padding nconmax). Fully vectorized over slots."""
    plans = [None] * len(groups)
    slot_b0 = np.asarray(getattr(st, "slot_body0", np.zeros(0, np.int32)))
    slot_b1 = np.asarray(getattr(st, "slot_body1", np.zeros(0, np.int32)))
    S = len(slot_b0)
    if S == 0:
        return plans
    B = int(st.body_count)
    gi_of, e_of, lb_of = _body_env_tables(groups, B)

    def look(b):
        v = (b >= 0) & (b < B)
        bc = np.clip(b, 0, max(B - 1, 0))
        return (np.where(v, gi_of[bc], -1), np.where(v, e_of[bc], -1),
                np.where(v, lb_of[bc], -1))
    g0, e0, l0t = look(slot_b0)
    g1, e1, l1t = look(slot_b1)
    # owner: body1's articulation if it belongs to one, else body0's
    owner_g = np.where(g1 >= 0, g1, g0)
    owner_e = np.where(g1 >= 0, e1, e0)
    lb0 = np.where((g0 == owner_g) & (e0 == owner_e), l0t, -1)
    lb1 = np.where((g1 >= 0) & (g1 == owner_g) & (e1 == owner_e), l1t, -1)
    slot_ids = np.arange(S, dtype=np.int32)
    # non-owned moving side (cross-env/-group): its global body index feeds
    # the combined effective mass + moving-support velocity target; the
    # contact is DUPLICATED into that side's cell so both bodies receive
    # their half of the impulse pair (Newton's third law across cells —
    # the reference gets this for free from its single flat solver state)
    ob_own = np.where((lb0 < 0) & (slot_b0 >= 0), slot_b0,
                      np.where((lb1 < 0) & (slot_b1 >= 0), slot_b1, -1)
                      ).astype(np.int32)
    dup = (g0 >= 0) & ((g0 != owner_g) | (e0 != owner_e))
    w_own = np.where(dup, 0.5, 1.0).astype(np.float32)
    ent_g = np.concatenate([owner_g, g0[dup]])
    ent_e = np.concatenate([owner_e, e0[dup]])
    ent_s = np.concatenate([slot_ids, slot_ids[dup]])
    ent_l0 = np.concatenate([lb0, l0t[dup]])
    ent_l1 = np.concatenate([lb1, -np.ones(int(dup.sum()), np.int32)])
    ent_ob = np.concatenate([ob_own, slot_b1[dup]])
    ent_w = np.concatenate([w_own, np.full(int(dup.sum()), 0.5, np.float32)])
    pad_slot = int(getattr(st, "rigid_contact_max", 0))
    for gi, g in enumerate(groups):
        m = ent_g == gi
        if not m.any():
            continue
        e_arr, s_arr = ent_e[m], ent_s[m]
        l0a, l1a = ent_l0[m], ent_l1[m]
        oba, wa = ent_ob[m], ent_w[m]
        # stable sort by env keeps ascending slot order within each env
        order = np.argsort(e_arr, kind="stable")
        e_arr, s_arr = e_arr[order], s_arr[order]
        l0a, l1a = l0a[order], l1a[order]
        oba, wa = oba[order], wa[order]
        counts = np.bincount(e_arr, minlength=g.n)
        if counts.min() == counts.max() and counts[0] > 0:
            c = int(counts[0])
            slots = s_arr.reshape(g.n, c).astype(np.int32)
            l0m = l0a.reshape(g.n, c)
            l1m = l1a.reshape(g.n, c)
            obm = oba.reshape(g.n, c)
            wm = wa.reshape(g.n, c)
            if ((l0m == l0m[0]).all() and (l1m == l1m[0]).all()
                    and (wm == wm[0]).all()
                    and ((obm >= 0) == (obm[0] >= 0)[None]).all()):
                # ob stays per-env (different envs face different bodies);
                # only its VALIDITY pattern must be uniform for the static
                # row layout
                plans[gi] = _GroupContacts(slots, l0m[0].astype(np.int32),
                                           l1m[0].astype(np.int32),
                                           ob=obm.astype(np.int32),
                                           w=wm[0])
                continue
        # heterogeneous contact layout: pad to max count with per-env
        # local-body tables; padded entries read one-past-the-end
        # (clamped, masked via valid) and scatter-drop on write
        cmax = int(counts.max())
        slots = np.full((g.n, cmax), pad_slot, dtype=np.int32)
        lb0m = -np.ones((g.n, cmax), dtype=np.int32)
        lb1m = -np.ones((g.n, cmax), dtype=np.int32)
        obm = -np.ones((g.n, cmax), dtype=np.int32)
        wm = np.ones((g.n, cmax), dtype=np.float32)
        valid = np.zeros((g.n, cmax), dtype=bool)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        k = np.arange(len(e_arr)) - starts[e_arr]
        slots[e_arr, k] = s_arr
        lb0m[e_arr, k] = l0a
        lb1m[e_arr, k] = l1a
        obm[e_arr, k] = oba
        wm[e_arr, k] = wa
        valid[e_arr, k] = True
        plans[gi] = _GroupContacts(slots, lb0m, lb1m, valid, ob=obm, w=wm)
    return plans


class SolverFeatherstone(SolverBase):
    """Batched generalized-coordinate dynamics solver
    (reference: solver_featherstone.py:57; also covers the role of
    solver_mujoco.py's smooth pipeline).

    Args:
        contact_iterations: projected-Jacobi iterations for contact impulses.
        contact_relaxation: under-relaxation factor (diag-scaled Jacobi).
        impratio: regularization of the Delassus diagonal (MuJoCo-like
            constraint softness; larger = harder contacts).
        baumgarte: positional stabilization velocity factor (per second).
        joint_limit_mode: "penalty" torque springs at the limits.
    """

    def __init__(self, model: Model,
                 contact_iterations: int = 16,
                 contact_relaxation: float = 0.85,
                 contact_reg: float = 1e-6,
                 impratio: float = 0.9,
                 baumgarte: float = 0.2,
                 contact_slop: float = 1e-4,
                 depenetration_velocity: float = 10.0,
                 angular_damping: float = 0.0,
                 friction_cone: str = "pyramid",
                 limit_mode: str = "constraint",
                 sleep_threshold: float = 0.0,
                 sleep_steps: int = 16,
                 warm_start: bool = False,
                 max_velocity: float = 1.0e3,
                 update_mass_matrix_interval: int = 1,
                 pgs_backend: str = "auto",
                 contact_cap: Optional[int] = None,
                 contact_solver: str = "pgs",
                 newton_iterations: int = 8,
                 integrator: str = "euler",
                 apply_body_forces: bool = True):
        super().__init__(model)
        # External world-frame body wrenches (State.body_f = MuJoCo
        # xfrc_applied) are projected into generalized forces via the J^T
        # subtree sweep (dynamics.group_external_forces). SolverCoupled's
        # consensus wrench exchange depends on it. Set False to shave the
        # sweep off wrench-free RL hot loops.
        self.apply_body_forces = bool(apply_body_forces)
        # integrator family (reference solver_mujoco.py:613-614 honors the
        # same four): "euler" = semi-implicit with implicit diagonal joint
        # damping (MuJoCo mjINT_EULER); "implicitfast" adds implicit tendon
        # damping + actuator velocity derivatives (symmetric, Cholesky);
        # "implicit" adds the Coriolis derivative ∂bias/∂qd (LU);
        # "rk4" = classic 4-stage Runge-Kutta on the smooth dynamics with
        # contact impulses applied after the stage combination.
        self.integrator = str(integrator).lower()
        if self.integrator not in ("euler", "implicitfast", "implicit",
                                   "rk4"):
            raise ValueError(
                f"unknown integrator {integrator!r}: expected euler, "
                "implicitfast, implicit or rk4")
        # "pgs" (projected Jacobi, default) or "newton" (active-set Newton
        # QP on pyramidal facets — reference SolverMuJoCo solver="newton")
        self.contact_solver = contact_solver
        self.newton_iterations = int(newton_iterations)
        st = model.structure
        self.gc = get_generalized_cache(st)
        self.contact_iterations = int(contact_iterations)
        self.contact_relaxation = float(contact_relaxation)
        self.contact_reg = float(contact_reg)
        # MuJoCo-style constraint softness: R = diag * (1 - d) / d keeps the
        # diagonally-scaled Jacobi sweep convergent in dense contact pile-ups
        # (pure 1/diag steps diverge when many rows couple)
        self.impratio = float(impratio)
        self.baumgarte = float(baumgarte)
        self.contact_slop = float(contact_slop)
        # ceiling on the Baumgarte push-out velocity (PhysX/Bullet "max
        # depenetration velocity"): raw beta/dt * depth correction is an
        # undamped spring — in a loaded column (deep stacks) it resonates
        # (pogo: push-out -> separation -> fall -> deeper -> bigger push),
        # pumping energy over hundreds of steps until the stack explodes.
        # Capping the correction velocity bounds the energy injection per
        # step; resting penetration stays depth ~ slop + load/k regardless.
        self.depenetration_velocity = float(depenetration_velocity)
        self.angular_damping = float(angular_damping)
        self.friction_cone = friction_cone
        self.limit_mode = limit_mode
        # sleeping (reference: mujoco SleepPolicy, solver_mujoco.py:541):
        # envs whose dofs stay below sleep_threshold for sleep_steps steps
        # freeze until disturbed (functional: counters live in State.custom)
        self.sleep_threshold = float(sleep_threshold)
        self.sleep_steps = int(sleep_steps)
        # contact impulse warm starting: deterministic slot addressing makes
        # frame-to-frame correspondence free (the reference needs its
        # ContactMatcher, geometry/contact_match.py:623, to get this)
        self.warm_start = bool(warm_start)
        # hard velocity ceiling: keeps a single pathological env finite
        # instead of poisoning the batch (MuJoCo's MAXVAL guards play the
        # same role; per-dof model.joint_velocity_limit still applies)
        self.max_velocity = float(max_velocity)
        # contact-solve backend for step_batched: "pallas" keeps J / M^-1 J^T
        # VMEM-resident across all PGS passes (one HBM read instead of ~15);
        # "xla" is the fused-jnp fallback (CPU, autodiff); "auto" picks
        # pallas on TPU. (pgs_pallas.py)
        self.pgs_backend = pgs_backend
        # per-env contact compaction: scenes with many candidate slots but
        # few simultaneous touches (humanoid: 192 slots, <20 active) solve a
        # top-K-by-depth subset per env instead of the full dense system —
        # the reference's global contact reducer plays the same role
        # (reference geometry/contact_reduction.py). None = auto (cap 32),
        # <=0 disables, >0 explicit cap.
        self.contact_cap = contact_cap
        self.contact_plans = _plan_group_contacts(st, self.gc.groups)
        # per-group dofs with finite limits (local dof + local coord index)
        self.limit_plans = []
        gc0 = self.gc
        lim_lo = np.asarray(model.joint_limit_lower)
        lim_hi = np.asarray(model.joint_limit_upper)
        glob_pairs = dict(zip(gc0.lin_coord_dof.tolist(),
                              gc0.lin_coord_idx.tolist()))
        from ...core.types import MAXVAL
        for g in gc0.groups:
            ld, lc = [], []
            for k, dglob in enumerate(g.dof_idx[0]):
                cglob = glob_pairs.get(int(dglob))
                if cglob is None:
                    continue
                if (lim_lo[int(dglob)] > -0.5 * MAXVAL
                        or lim_hi[int(dglob)] < 0.5 * MAXVAL):
                    ld.append(k)
                    lc.append(int(cglob) - int(g.coord_idx[0][0]))
            self.limit_plans.append(
                (np.asarray(ld, dtype=np.int32),
                 np.asarray(lc, dtype=np.int32)))
        self.equality_plans = _plan_group_equality(model, self.gc.groups) \
            if st.eq_count else [None] * len(self.gc.groups)
        # per-slot shape indices for material lookup
        self.slot_shape0 = getattr(st, "slot_shape0", np.zeros(0, np.int32))
        self.slot_shape1 = getattr(st, "slot_shape1", np.zeros(0, np.int32))
        # muscle acc0 (MuJoCo: |qacc| from a unit actuator force at qpos0,
        # used to resolve force<0 as scale/acc0): one-time host solve
        au = getattr(st, "mjc_actuation", None)
        if au is not None and au.has_muscle and not getattr(au, "_acc0_done",
                                                            False):
            self._compute_muscle_acc0(au)
        if self.integrator in ("implicitfast", "implicit"):
            self._build_implicit_plans()

    def _build_implicit_plans(self):
        """Static per-group scatter plans for the implicit integrators'
        damping-matrix terms: tendon kd outer products and actuator
        velocity-gain diagonals (host-side, once)."""
        st = self.model.structure
        gc = self.gc
        loc = {}     # global dof -> (group, env, local)
        for gi, g in enumerate(gc.groups):
            di = np.asarray(g.dof_idx)
            for i in range(di.shape[0]):
                for k in range(di.shape[1]):
                    loc[int(di[i, k])] = (gi, i, k)
        T = int(getattr(st, "tendon_count", 0))
        per_t = [[] for _ in gc.groups]
        for t in range(T):
            dofs = np.asarray(st.tendon_dof[t])
            coefs = np.asarray(st.tendon_coef[t], dtype=np.float64)
            nz = coefs != 0.0
            if not nz.any():
                continue
            locs = [loc.get(int(d)) for d in dofs[nz]]
            if any(l is None for l in locs):
                continue
            if len({(l[0], l[1]) for l in locs}) != 1:
                continue   # cross-group/env tendon: damping stays explicit
            gi, env = locs[0][0], locs[0][1]
            per_t[gi].append((t, env, [l[2] for l in locs],
                              coefs[nz].tolist()))
        self._tendon_plans = []
        for rows in per_t:
            if not rows:
                self._tendon_plans.append(None)
                continue
            W = max(len(r[2]) for r in rows)
            t_idx = np.array([r[0] for r in rows], np.int32)
            t_env = np.array([r[1] for r in rows], np.int32)
            t_li = np.zeros((len(rows), W), np.int32)
            t_cf = np.zeros((len(rows), W))
            for j, r in enumerate(rows):
                t_li[j, :len(r[2])] = r[2]
                t_cf[j, :len(r[3])] = r[3]
            self._tendon_plans.append((t_idx, t_env, t_li, t_cf))
        au = getattr(st, "mjc_actuation", None)
        per_a = [[] for _ in gc.groups]
        if au is not None:
            for a in range(au.n):
                if au.dof[a] < 0:
                    continue
                l = loc.get(int(au.dof[a]))
                if l is not None:
                    per_a[l[0]].append((a, l[1], l[2]))
        self._act_plans = []
        for rows in per_a:
            if not rows:
                self._act_plans.append(None)
                continue
            self._act_plans.append(
                (np.array([r[0] for r in rows], np.int32),
                 np.array([r[1] for r in rows], np.int32),
                 np.array([r[2] for r in rows], np.int32)))

    def _group_damping_matrix(self, gi, g, dfdv, dtype, sten=None):
        """Extra damping matrix D = -∂tau/∂qd (beyond diagonal PD kd) for
        one group: tendon damping outer products + actuator velocity
        derivatives (MuJoCo implicitfast semantics). ``sten`` carries the
        spatial-tendon (L, V, J) rows so their kd (and sten-actuator
        velocity gains) fold into the implicit system too — MuJoCo treats
        tendon damping implicitly in qDeriv, and a stiff spatial-tendon kd
        handled explicitly destabilizes at MuJoCo-stable timesteps."""
        model = self.model
        D_x = jnp.zeros((g.n, g.d, g.d), dtype=dtype)
        if sten is not None and getattr(model.structure, "sten_count", 0):
            _, _, J_st = sten                              # (Ts, D)
            kd_eff = model.sten_params[:, 1].astype(dtype)  # (Ts,)
            au = getattr(model.structure, "mjc_actuation", None)
            if au is not None and dfdv is not None:
                sa = np.nonzero(np.asarray(au.sten) >= 0)[0]
                if len(sa):
                    gear = jnp.asarray(au.gear[sa], dtype=dtype)
                    kd_eff = kd_eff.at[np.asarray(au.sten)[sa]].add(
                        -(gear * gear) * dfdv[sa])
            Jg = J_st[:, g.dof_idx]                        # (Ts, n, d)
            D_x = D_x + jnp.einsum("tnd,tne->nde",
                                   kd_eff[:, None, None] * Jg, Jg)
        tpn = self._tendon_plans[gi]
        if tpn is not None:
            t_idx, t_env, t_li, t_cf = tpn
            kd_t = model.tendon_params[t_idx, 1]                 # (K,)
            cf = jnp.asarray(t_cf, dtype=dtype)                  # (K, W)
            contrib = (kd_t[:, None, None]
                       * cf[:, :, None] * cf[:, None, :])        # (K, W, W)
            D_x = D_x.at[t_env[:, None, None], t_li[:, :, None],
                         t_li[:, None, :]].add(contrib)
        apn = self._act_plans[gi]
        if apn is not None and dfdv is not None:
            au = model.structure.mjc_actuation
            a_idx, a_env, a_li = apn
            gear = jnp.asarray(au.gear[a_idx], dtype=dtype)
            dD = -(gear * gear) * dfdv[a_idx]                    # -∂tau/∂qd
            D_x = D_x.at[a_env, a_li, a_li].add(dD)
        return D_x

    def _rk4_update(self, state_in, q, qd, body_q, body_qd, control, dt):
        """Classic RK4 on the smooth generalized dynamics (MuJoCo
        mj_RungeKutta tableau): 4 force/mass evaluations, positions advance
        with the weighted stage velocities. Activation dynamics advance once
        with stage-1 values. Returns (qd_new, v_avg, act_new, group_data
        at the initial configuration, v_o, w_o)."""
        from ...sim.articulation import eval_fk as _efk
        model = self.model
        gc = self.gc
        dtype = q.dtype

        def deriv(q_s, qd_s, s_ref, first=False):
            s_s = _efk(model, q_s, qd_s, s_ref)
            v_o, w_o, tau_net, _, act_new, _, _ = self._assemble_forces(
                state_in, q_s, qd_s, s_s.body_q, s_s.body_qd, control, dt,
                explicit_damping=True)
            qacc = jnp.zeros_like(qd_s)
            gdata = []
            for g in gc.groups:
                M = group_mass_matrix(model, s_s.body_q, g, v_o, w_o)
                L = cholesky_unrolled(M)
                acc_g = cho_solve_unrolled(L, tau_net[g.dof_idx])
                qacc = qacc.at[g.dof_idx.reshape(-1)].set(acc_g.reshape(-1))
                if first:
                    Minv = cho_solve_unrolled(
                        L, jnp.broadcast_to(jnp.eye(g.d, dtype=dtype),
                                            (g.n, g.d, g.d)))
                    gdata.append((M, Minv, None))
            return qacc, act_new, gdata, v_o, w_o

        a1, act_new, gdata, v_o, w_o = deriv(q, qd, state_in, first=True)
        v1 = qd
        v2 = qd + 0.5 * dt * a1
        q2 = integrate_coords(model, q, v1, body_q, 0.5 * dt)
        a2, _, _, _, _ = deriv(q2, v2, state_in)
        v3 = qd + 0.5 * dt * a2
        q3 = integrate_coords(model, q, v2, body_q, 0.5 * dt)
        a3, _, _, _, _ = deriv(q3, v3, state_in)
        v4 = qd + dt * a3
        q4 = integrate_coords(model, q, v3, body_q, dt)
        a4, _, _, _, _ = deriv(q4, v4, state_in)
        v_avg = (v1 + 2.0 * v2 + 2.0 * v3 + v4) / 6.0
        qd_new = qd + (dt / 6.0) * (a1 + 2.0 * a2 + 2.0 * a3 + a4)
        # group_data (M, Minv at q0) feeds the post-integration contact /
        # equality impulse passes; refresh qd_g entries
        gdata = [(M, Minv, qd_new[g.dof_idx])
                 for (M, Minv, _), g in zip(gdata, gc.groups)]
        return qd_new, v_avg, act_new, gdata, v_o, w_o

    def _compute_muscle_acc0(self, au):
        """acc0_a = || M(q0)^-1 moment_a || per actuator (MuJoCo m->actuator
        acc0 semantics), computed once on host at the model's default pose."""
        from ...sim.dynamics_api import eval_mass_matrix
        model = self.model
        st = model.structure
        state = model.state()
        Ms = [np.asarray(M, np.float64) for M in eval_mass_matrix(model, state)]
        D = st.joint_dof_count
        J_sten = None
        if getattr(st, "sten_count", 0) and (au.sten >= 0).any():
            from ...sim.tendon import eval_spatial_tendons
            bqm = np.asarray(state.body_q, np.float64)
            bp_c = tuple(jnp.asarray(bqm[:, k]) for k in range(3))
            bq_c = tuple(jnp.asarray(bqm[:, 3 + k]) for k in range(4))
            v0, w0 = dof_subspace(model, jnp.asarray(bqm),
                                  jnp.asarray(np.asarray(state.joint_q,
                                                         np.float64)))
            _, Js = eval_spatial_tendons(
                st.sten_paths, bp_c, bq_c,
                tuple(v0[:, k] for k in range(3)),
                tuple(w0[:, k] for k in range(3)), self.gc.anc)
            J_sten = [np.asarray(j, np.float64) for j in Js]
        for a in range(au.n):
            moment = np.zeros(D)
            if au.dof[a] >= 0:
                moment[au.dof[a]] = au.gear[a]
            elif au.tendon[a] >= 0:
                t = int(au.tendon[a])
                moment[np.asarray(st.tendon_dof[t])] += \
                    np.asarray(st.tendon_coef[t]) * au.gear[a]
            elif au.sten[a] >= 0 and J_sten is not None:
                moment += J_sten[int(au.sten[a])] * au.gear[a]
            else:
                continue
            for gi, g in enumerate(self.gc.groups):
                m_g = moment[g.dof_idx[0]]
                if not np.any(m_g):
                    continue
                qacc = np.linalg.solve(Ms[gi][0], m_g)
                au.acc0[a] = max(float(np.linalg.norm(qacc)), 1e-12)
                break
        au._acc0_done = True

    # ------------------------------------------------------------------
    def _assemble_forces(self, state_in, q, qd, body_q, body_qd, control,
                         dt, explicit_damping=False):
        """Generalized applied/bias force assembly shared by all integrators.

        Returns (v_o, w_o, tau_net, kd_implicit, act_new, dfdv). With
        ``explicit_damping`` (RK4 stages) the PD/joint damping force
        ``-kd*qd`` is applied explicitly and ``kd_implicit`` stays zero;
        otherwise kd enters the (M + dt*Kd) matrix like MuJoCo's Euler.
        ``dfdv`` is the per-actuator force/velocity derivative (or None)
        consumed by the implicit integrators.
        """
        model = self.model
        st = model.structure
        gc = self.gc
        dtype = q.dtype

        v_o, w_o = dof_subspace(model, body_q, q)
        tau_bias = group_bias_forces(model, body_q, body_qd, v_o, w_o)

        # applied generalized forces
        tau = jnp.zeros_like(qd)
        if self.apply_body_forces and st.body_count:
            # State.body_f = xfrc_applied (external world wrenches)
            tau = tau + group_external_forces(model, body_q,
                                              state_in.body_f, v_o, w_o)
        kd_implicit = jnp.zeros_like(qd)
        if control is not None:
            tau = tau + control.joint_f
            # PD target drives on 1-coord dofs (position targets live in
            # coordinate layout; ball/free coords are skipped via the plan)
            li, ld = gc.lin_coord_idx, gc.lin_coord_dof
            if len(li):
                ke = model.joint_target_ke[ld]
                kd = model.joint_target_kd[ld]
                err = control.joint_target_q[li] - q[li]
                # damping is implicit: kd enters the (M + dt Kd) matrix and
                # the rhs carries kd * target_qd only — adding the explicit
                # -kd qd here too would double the damping (this exactly
                # reproduces MuJoCo's Euler-with-implicit-damping update;
                # verified by the pendulum trajectory parity gate)
                if explicit_damping:
                    pd = ke * err + kd * (control.joint_target_qd[ld] - qd[ld])
                else:
                    pd = ke * err + kd * control.joint_target_qd[ld]
                    kd_implicit = kd_implicit.at[ld].add(kd)
                tau = tau.at[ld].add(pd)
            # PD drives on BALL joints: quaternion-error axis-angle torque in
            # the joint-parent frame, matching the ball dof subspace basis
            # (the reference drives ball dofs the same way via joint_target_ke;
            # this is what gives add_rod its bending stiffness)
            bp = gc.quat_coord_starts
            if len(bp):
                q4 = bp[:, 0:1] + np.arange(4)[None]       # (B, 4) coord idx
                d3 = bp[:, 1:2] + np.arange(3)[None]       # (B, 3) dof idx
                ke_b = model.joint_target_ke[d3]
                kd_b = model.joint_target_kd[d3]
                qcur = quat_normalize(q[q4])
                qtar = quat_normalize(control.joint_target_q[q4])
                axis, ang = quat_to_axis_angle(
                    quat_mul(qtar, quat_conjugate(qcur)))
                e = axis * ang[:, None]
                # implicit damping: see the 1-dof PD comment above
                if explicit_damping:
                    pd_b = ke_b * e + kd_b * (control.joint_target_qd[d3]
                                              - qd[d3])
                else:
                    pd_b = ke_b * e + kd_b * control.joint_target_qd[d3]
                    kd_implicit = kd_implicit.at[d3.reshape(-1)].add(
                        kd_b.reshape(-1))
                tau = tau.at[d3.reshape(-1)].add(pd_b.reshape(-1))
        # fixed tendons: L = sum coef * q; passive spring/damper plus any
        # actuator force in control.tendon_f, mapped back as tau += coef * f
        # (reference: SolverMuJoCo fixed-tendon support)
        if getattr(model.structure, "tendon_count", 0):
            stt = model.structure
            tc = jnp.asarray(stt.tendon_coef, dtype=dtype)       # (T, W)
            L = jnp.sum(tc * q[stt.tendon_coord], axis=-1)
            Ld = jnp.sum(tc * qd[stt.tendon_dof], axis=-1)
            ke_t = model.tendon_params[:, 0]
            kd_t = model.tendon_params[:, 1]
            L0 = model.tendon_params[:, 2]
            f_t = -ke_t * (L - L0) - kd_t * Ld
            if control is not None and control.tendon_f is not None:
                f_t = f_t + control.tendon_f
            tau = tau.at[stt.tendon_dof.reshape(-1)].add(
                (tc * f_t[:, None]).reshape(-1))
        # spatial tendons: exact wrap-aware path length + moment rows inside
        # the jitted step (sim/tendon.py; reference routes MJCF <spatial>
        # wrap arrays import_mjcf.py:2865-2868 into MuJoCo-Warp)
        sten = None
        if getattr(st, "sten_count", 0):
            from ...sim.tendon import eval_spatial_tendons
            bp_c = tuple(body_q[:, k] for k in range(3))
            bq_c = tuple(body_q[:, 3 + k] for k in range(4))
            vo_c = tuple(v_o[:, k] for k in range(3))
            wo_c = tuple(w_o[:, k] for k in range(3))
            Ls, Js = eval_spatial_tendons(st.sten_paths, bp_c, bq_c,
                                          vo_c, wo_c, gc.anc)
            L_st = jnp.stack(Ls)                         # (Ts,)
            J_st = jnp.stack(Js)                         # (Ts, D)
            V_st = jnp.sum(J_st * qd[None, :], axis=1)   # (Ts,) = dL/dt
            ke_s = model.sten_params[:, 0]
            kd_s = model.sten_params[:, 1]
            L0_s = model.sten_params[:, 2]
            f_s = -ke_s * (L_st - L0_s) - kd_s * V_st
            tau = tau + jnp.sum(J_st * f_s[:, None], axis=0)
            sten = (L_st, V_st, J_st)
        # structured MuJoCo actuation (gain/bias/dyntype/muscle tables from
        # import_mjcf; reference solver_mujoco.py:500-529): force from
        # control.custom["mjc:ctrl"] + activation state in state custom
        act_new = None
        dfdv = None
        au = getattr(st, "mjc_actuation", None)
        if (au is not None and control is not None
                and "mjc:ctrl" in control.custom):
            from .actuation import actuator_forces
            ctrl_vec = control.custom["mjc:ctrl"]
            act_vec = state_in.custom.get("mjc:act")
            tau_a, act_new, _, dfdv = actuator_forces(
                au, model, q, qd, ctrl_vec, act_vec, dt, sten=sten)
            tau = tau + tau_a
        # joint limits: one-sided penalty springs (constraint mode moves
        # limits into the unified impulse solve instead)
        li, ld = gc.lin_coord_idx, gc.lin_coord_dof
        if len(li) and self.limit_mode == "penalty":
            lo = model.joint_limit_lower[ld]
            hi = model.joint_limit_upper[ld]
            ke_l = model.joint_limit_ke[ld]
            kd_l = model.joint_limit_kd[ld]
            viol_lo = jnp.minimum(q[li] - lo, 0.0)
            viol_hi = jnp.maximum(q[li] - hi, 0.0)
            viol = viol_lo + viol_hi
            lim_tau = -ke_l * viol - jnp.where(viol != 0.0, kd_l * qd[ld], 0.0)
            tau = tau.at[ld].add(lim_tau)
        tau_net = tau - tau_bias
        return v_o, w_o, tau_net, kd_implicit, act_new, dfdv, sten

    # ------------------------------------------------------------------
    def step(self, state_in: State, state_out: Optional[State] = None,
             control: Optional[Control] = None,
             contacts: Optional[Contacts] = None, dt: float = 1e-3) -> State:
        model = self.model
        st = model.structure
        gc = self.gc
        dtype = state_in.joint_q.dtype
        q = state_in.joint_q
        qd = state_in.joint_qd

        # body poses/velocities are maintained FK-consistent by construction:
        # eval_fk at init and at the end of every step. Recomputing FK here
        # would double the kinematics cost per substep for nothing.
        body_q, body_qd = state_in.body_q, state_in.body_qd

        v_avg = None
        qd_smooth = None
        if self.integrator == "rk4":
            qd_new, v_avg, act_new, group_data, v_o, w_o = self._rk4_update(
                state_in, q, qd, body_q, body_qd, control, dt)
            qd_smooth = qd_new
        else:
            v_o, w_o, tau_net, kd_implicit, act_new, dfdv, sten = \
                self._assemble_forces(state_in, q, qd, body_q, body_qd,
                                      control, dt)

            # ∂tau_bias/∂qd for the full implicit integrator (the Coriolis
            # derivative MuJoCo's mjINT_IMPLICIT adds over implicitfast,
            # reference solver_mujoco.py:613-614): exact via forward-mode AD
            # through velocity FK + RNEA (bias is quadratic in qd)
            Jbias = None
            if self.integrator == "implicit" and gc.D:
                from ...sim.articulation import eval_fk as _efk

                def bias_of(qd_f):
                    s_tmp = _efk(model, q, qd_f, state_in)
                    return group_bias_forces(model, body_q, s_tmp.body_qd,
                                             v_o, w_o)
                Jbias = jax.jacfwd(bias_of)(qd)            # (D, D)

            # per-group velocity solve:
            # (M + dt K_d + dt D) qd_new = M qd + dt D qd + dt tau_net
            # with D = -∂tau/∂qd beyond the diagonal kd (tendon damping,
            # actuator velocity gains, Coriolis for "implicit")
            qd_new = qd
            group_data = []
            for gi, g in enumerate(gc.groups):
                M = group_mass_matrix(model, body_q, g, v_o, w_o)  # (n, d, d)
                kd_g = kd_implicit[g.dof_idx]                      # (n, d)
                Mi = M + dt * jnp.einsum("nd,de->nde", kd_g,
                                         jnp.eye(g.d, dtype=dtype))
                rhs = (jnp.einsum("nde,ne->nd", M, qd[g.dof_idx],
                                  precision=jax.lax.Precision.HIGHEST)
                       + dt * tau_net[g.dof_idx])
                symmetric = True
                if self.integrator in ("implicitfast", "implicit"):
                    D_x = self._group_damping_matrix(gi, g, dfdv, dtype,
                                                     sten=sten)
                    if Jbias is not None:
                        D_x = D_x + Jbias[g.dof_idx[:, :, None],
                                          g.dof_idx[:, None, :]]
                        symmetric = False   # Coriolis derivative is skew-ish
                    Mi = Mi + dt * D_x
                    rhs = rhs + dt * jnp.einsum("nde,ne->nd", D_x,
                                                qd[g.dof_idx])
                if symmetric:
                    L = cholesky_unrolled(Mi)
                    qd_g = cho_solve_unrolled(L, rhs)
                    # explicit inverse on the narrow (d, d) system: downstream
                    # M^-1 J^T becomes one MXU matmul instead of 2d unrolled
                    # sweeps over the wide (d, rows) RHS (~1 GB HBM saved)
                    Minv = cho_solve_unrolled(
                        L, jnp.broadcast_to(jnp.eye(g.d, dtype=dtype),
                                            (g.n, g.d, g.d)))
                else:
                    # non-symmetric system (MuJoCo uses LU here too)
                    qd_g = jnp.linalg.solve(Mi, rhs[..., None])[..., 0]
                    Minv = jnp.linalg.solve(
                        Mi, jnp.broadcast_to(jnp.eye(g.d, dtype=dtype),
                                             (g.n, g.d, g.d)))
                qd_new = qd_new.at[g.dof_idx.reshape(-1)].set(
                    qd_g.reshape(-1))
                group_data.append((M, Minv, qd_g))

        # contact impulses per group (homogeneous fast path)
        self._last_contact_impulses = []
        overflow_custom = {}
        has_contacts = contacts is not None and contacts.rigid_contact_max
        for gi, g in enumerate(gc.groups):
            plan = self.contact_plans[gi]
            if has_contacts and plan is not None and plan.c:
                M, Minv, qd_g = group_data[gi]
                self._last_overflow = None
                solve = (self._solve_contacts_newton
                         if self.contact_solver == "newton"
                         else self._solve_contacts)
                qd_g2, lam, dirs = solve(
                    model, contacts, g, plan, Minv, qd_g, v_o, w_o,
                    state_in, body_q, dt, q_coords=q,
                    limit_plan=self.limit_plans[gi]
                    if self.limit_mode == "constraint" else None,
                    group_index=gi)
                qd_new = qd_new.at[g.dof_idx.reshape(-1)].set(qd_g2.reshape(-1))
                self._last_contact_impulses.append((plan, lam, dirs))
                if getattr(self, "_last_overflow", None) is not None:
                    overflow_custom[f"contact:overflow:{gi}"] = \
                        self._last_overflow
                if self.warm_start:
                    state_in = state_in.replace(custom={
                        **state_in.custom, f"contact:lam:{gi}": lam})
            elif (self.limit_mode == "constraint"
                  and len(self.limit_plans[gi][0])):
                # no contact system this step — joint limits still apply
                M, Minv, qd_g = group_data[gi]
                qd_g2 = self._solve_limits(model, g, Minv, qd_g, q, dt,
                                           self.limit_plans[gi])
                qd_new = qd_new.at[g.dof_idx.reshape(-1)].set(
                    qd_g2.reshape(-1))

        # bilateral equality constraints (CONNECT/WELD/JOINT): exact solve
        for gi, g in enumerate(gc.groups):
            eplan = self.equality_plans[gi]
            if eplan is None or eplan.rows == 0:
                continue
            M, Minv, _ = group_data[gi]
            qd_g = qd_new[g.dof_idx]
            qd_g2 = self._solve_equality(model, g, eplan, Minv, qd_g,
                                         v_o, w_o, body_q, q, dt)
            qd_new = qd_new.at[g.dof_idx.reshape(-1)].set(qd_g2.reshape(-1))

        # velocity limits: per-dof model limits + the global safety ceiling
        qd_new = jnp.clip(qd_new, -model.joint_velocity_limit,
                          model.joint_velocity_limit)
        qd_new = jnp.clip(qd_new, -self.max_velocity, self.max_velocity)
        qd_new = jnp.where(jnp.isfinite(qd_new), qd_new, 0.0)

        # integrate coordinates and recompute kinematics for the output state.
        # RK4 positions advance with the tableau-weighted stage velocities
        # (MuJoCo mj_RungeKutta); impulse corrections (contacts/limits) ride
        # on top as a delta so contact-free scenes are pure RK4
        if self.integrator == "rk4":
            v_int = v_avg + (qd_new - qd_smooth)
            # v_avg/qd_smooth are raw stage sums: a blown stage (contact
            # impulse -> explicit-damping instability) would bypass the
            # qd_new ceiling above and poison positions with inf/NaN, which
            # no later guard can recover. Apply the same ceiling + finite
            # guard to the position-integration velocity.
            v_int = jnp.clip(v_int, -self.max_velocity, self.max_velocity)
            v_int = jnp.where(jnp.isfinite(v_int), v_int, 0.0)
        else:
            v_int = qd_new
        q_new = integrate_coords(model, q, v_int, body_q, dt)
        out = eval_fk(model, q_new, qd_new, state_in)
        if act_new is not None:
            out = out.replace(custom={**out.custom, "mjc:act": act_new})
        if overflow_custom:
            # only update keys pre-allocated by init_state: injecting new
            # custom keys mid-step would change the State pytree structure
            # under a lax.scan carry
            upd = {k: v for k, v in overflow_custom.items()
                   if k in out.custom}
            if upd:
                out = out.replace(custom={**out.custom, **upd})

        if self.sleep_threshold > 0.0:
            if "sleep:count:0" not in state_in.custom:
                # lazy counter allocation: zeros have static shapes, so
                # seeding them here is jit-safe; the output state carries
                # them forward (init_state remains the explicit alternative)
                state_in = self.init_state(state_in)
            out = self._apply_sleep(model, state_in, out, control)
        return out

    def init_state(self, state: State) -> State:
        """Allocate sleep counters / warm-start buffers in State.custom."""
        custom = dict(state.custom)
        if self.sleep_threshold > 0.0:
            for gi, g in enumerate(self.gc.groups):
                custom.setdefault(f"sleep:count:{gi}",
                                  jnp.zeros((g.n,), dtype=jnp.int32))
        if self.warm_start:
            for gi, g in enumerate(self.gc.groups):
                plan = self.contact_plans[gi]
                if plan is not None and plan.c:
                    custom.setdefault(
                        f"contact:lam:{gi}",
                        jnp.zeros((g.n, 3 * plan.c), dtype=jnp.float32))
        for gi, g in enumerate(self.gc.groups):
            plan = self.contact_plans[gi]
            if (plan is not None and plan.c
                    and self._plan_cap(plan.c) < plan.c):
                # dropped-active-contact diagnostic (see
                # _build_contact_system top-K compaction)
                custom.setdefault(f"contact:overflow:{gi}",
                                  jnp.zeros((g.n,), dtype=jnp.int32))
        return state.replace(custom=custom)

    def _apply_sleep(self, model, state_in, out, control):
        """Freeze quiescent articulations (per-group env masks)."""
        gc = self.gc
        counters = dict(state_in.custom)
        q_new, qd_new = out.joint_q, out.joint_qd
        bq, bqd = out.body_q, out.body_qd
        for gi, g in enumerate(gc.groups):
            key = f"sleep:count:{gi}"
            cnt = counters.get(key, jnp.zeros((g.n,), dtype=jnp.int32))
            speed = jnp.max(jnp.abs(qd_new[g.dof_idx]), axis=-1)
            # external drive wakes an env up
            drive = (jnp.max(jnp.abs(control.joint_f[g.dof_idx]), axis=-1)
                     if control is not None else jnp.zeros_like(speed))
            quiet = (speed < self.sleep_threshold) & (drive == 0.0)
            cnt = jnp.where(quiet, cnt + 1, 0)
            asleep = cnt >= self.sleep_steps
            counters[key] = cnt
            mq = asleep[:, None]
            q_new = q_new.at[g.coord_idx].set(
                jnp.where(mq, state_in.joint_q[g.coord_idx],
                          q_new[g.coord_idx]))
            qd_new = qd_new.at[g.dof_idx].set(
                jnp.where(mq, 0.0, qd_new[g.dof_idx]))
            mb = asleep[:, None, None]
            bq = bq.at[g.body_idx].set(
                jnp.where(mb, state_in.body_q[g.body_idx], bq[g.body_idx]))
            bqd = bqd.at[g.body_idx].set(
                jnp.where(mb, 0.0, bqd[g.body_idx]))
        return out.replace(joint_q=q_new, joint_qd=qd_new, body_q=bq,
                           body_qd=bqd, custom=counters)

    def _solve_equality(self, model, g, eplan, Minv, qd_g, v_o, w_o,
                        body_q, q_coords, dt):
        """Exact bilateral impulse solve for equality constraints
        (reference: mujoco equality rows; kamino bilateral constraints)."""
        from ...math import quat_conjugate, quat_mul, transform_point
        dtype = qd_g.dtype
        n_env, d = qd_g.shape
        anc = jnp.asarray(g.anc, dtype=dtype)               # (b, d)
        vg = v_o[g.dof_idx]                                 # (n, d, 3)
        wg = w_o[g.dof_idx]
        beta = self.baumgarte / dt

        rows_J = []   # list of (n, d)
        rows_b = []   # list of (n,)

        bq_g = body_q[g.body_idx]                           # (n, b, 7)
        eye3 = jnp.eye(3, dtype=dtype)

        def body_anc(lb):
            if lb < 0:
                return jnp.zeros((g.d,), dtype=dtype)
            return anc[lb]

        for m_i in range(len(eplan.kinds)):
            kind = int(eplan.kinds[m_i])
            if kind == 2:  # JOINT: qd1 - poly'(q2) qd2 = 0
                ld1, ld2 = int(eplan.dof1[m_i]), int(eplan.dof2[m_i])
                lc1, lc2 = int(eplan.coord1[m_i]), int(eplan.coord2[m_i])
                pc = jnp.asarray(eplan.polycoef[m_i], dtype=dtype)
                row = jnp.zeros((n_env, g.d), dtype=dtype).at[:, ld1].set(1.0)
                q1 = q_coords[g.coord_idx[:, lc1]]
                if ld2 >= 0:
                    x2 = q_coords[g.coord_idx[:, lc2]]
                    dpoly = (pc[1] + 2 * pc[2] * x2 + 3 * pc[3] * x2 ** 2
                             + 4 * pc[4] * x2 ** 3)
                    row = row.at[:, ld2].set(-dpoly)
                    target = (pc[0] + pc[1] * x2 + pc[2] * x2 ** 2
                              + pc[3] * x2 ** 3 + pc[4] * x2 ** 4)
                else:
                    target = pc[0]
                rows_J.append(row[:, None, :])
                rows_b.append((beta * (q1 - target))[:, None])
                continue
            lb1, lb2 = int(eplan.lb1[m_i]), int(eplan.lb2[m_i])
            a1 = jnp.asarray(eplan.anchor1[m_i], dtype=dtype)
            a2 = jnp.asarray(eplan.anchor2[m_i], dtype=dtype)
            p1 = (transform_point(bq_g[:, lb1], a1) if lb1 >= 0
                  else jnp.broadcast_to(a1, (n_env, 3)))
            p2 = (transform_point(bq_g[:, lb2], a2) if lb2 >= 0
                  else jnp.broadcast_to(a2, (n_env, 3)))
            anc1 = body_anc(lb1)
            anc2 = body_anc(lb2)
            # positional rows: world axes at each side's anchor
            V1 = vg + jnp.cross(wg, p1[:, None, :])         # (n, d, 3)
            V2 = vg + jnp.cross(wg, p2[:, None, :])
            Jpos = (V1 * anc1[None, :, None]
                    - V2 * anc2[None, :, None])             # (n, d, 3)
            rows_J.append(jnp.swapaxes(Jpos, 1, 2))         # (n, 3, d)
            rows_b.append(beta * (p1 - p2))                 # (n, 3)
            if kind == 1:  # WELD adds angular rows
                Jang = wg * (anc1 - anc2)[None, :, None]    # (n, d, 3)
                rows_J.append(jnp.swapaxes(Jang, 1, 2))
                q1r = bq_g[:, lb1, 3:7] if lb1 >= 0 else \
                    jnp.broadcast_to(jnp.array([0, 0, 0, 1], dtype=dtype),
                                     (n_env, 4))
                q2r = bq_g[:, lb2, 3:7] if lb2 >= 0 else \
                    jnp.broadcast_to(jnp.array([0, 0, 0, 1], dtype=dtype),
                                     (n_env, 4))
                rel = jnp.asarray(eplan.relpose[m_i], dtype=dtype)
                target_q = quat_mul(q2r, jnp.broadcast_to(rel, (n_env, 4)))
                qe = quat_mul(q1r, quat_conjugate(target_q))
                qe = jnp.where(qe[:, 3:4] < 0, -qe, qe)
                rows_b.append(beta * 2.0 * qe[:, 0:3])

        J = jnp.concatenate(rows_J, axis=1)                 # (n, r, d)
        b = jnp.concatenate(rows_b, axis=1)                 # (n, r)
        hp = jax.lax.Precision.HIGHEST
        MinvJt = jnp.einsum("nde,nre->ndr", Minv, J, precision=hp)
        A = jnp.einsum("nrd,nds->nrs", J, MinvJt, precision=hp)
        r = A.shape[-1]
        A = A + self.contact_reg * jnp.eye(r, dtype=dtype)
        rhs = -(jnp.einsum("nrd,nd->nr", J, qd_g) + b)
        from .linalg import solve_psd
        lam = solve_psd(A, rhs)
        return qd_g + jnp.einsum("ndr,nr->nd", MinvJt, lam)

    def _solve_limits(self, model, g, Minv, qd_g, q_coords, dt, limit_plan):
        """Limits-only unilateral impulse solve for groups whose contact
        system doesn't run this step (contacts=None or zero contact slots).
        Same rows the unified solve appends (``_build_contact_system``
        limit rows) — without it, constraint-mode joint limits silently
        vanish in contact-free scenes (caught by the spatial-tendon
        trajectory parity gate). Lower/upper rows of one dof are merged
        into one signed row (both can't be active at once)."""
        ld, lc = limit_plan
        nl = len(ld)
        dtype = qd_g.dtype
        qv = q_coords[g.coord_idx[:, lc]]                   # (n, nl)
        lo = model.joint_limit_lower[g.dof_idx[:, ld]]
        hi = model.joint_limit_upper[g.dof_idx[:, ld]]
        act_lo = qv <= lo + 1e-4
        act_hi = qv >= hi - 1e-4
        active = act_lo | act_hi
        s = jnp.where(act_lo, 1.0, -1.0).astype(dtype)      # (n, nl)
        b = self.baumgarte / dt * jnp.where(
            act_lo, jnp.maximum(lo - qv, 0.0), jnp.maximum(qv - hi, 0.0))
        Msub = Minv[:, ld[:, None], ld[None, :]]            # (n, nl, nl)
        A = s[:, :, None] * Msub * s[:, None, :]
        diag = jnp.diagonal(A, axis1=1, axis2=2) + self.contact_reg
        v_free = s * qd_g[:, ld]
        lam = jnp.zeros_like(v_free)
        omega = self.contact_relaxation
        for _ in range(self.contact_iterations):
            r = jnp.einsum("nij,nj->ni", A, lam) + v_free - b
            lam = jnp.maximum(lam - omega * r / diag, 0.0)
            lam = jnp.where(active, lam, 0.0)
        dqd = jnp.einsum("ndj,nj->nd", Minv[:, :, ld], s * lam)
        return qd_g + dqd

    def step_batched(self, state_in: State, state_out: Optional[State] = None,
                     control: Optional[Control] = None,
                     contacts: Optional[Contacts] = None,
                     dt: float = 1e-3) -> State:
        """Step a whole env batch (leading axis W) at once.

        Uses the transposed structure-of-arrays fast path (see
        ``generalized/batched.py``) — ~4x faster than ``jax.vmap(step)`` on
        TPU because the env axis rides the 128-lane dimension. Sleeping and
        equality constraints are covered by the fast path; it falls back to
        the vmapped per-env path only for Newton-QP/ADMM contact backends
        and multi-articulation worlds.
        """
        from .batched import step_batched as _sb
        return _sb(self, state_in, state_out, control, contacts, dt)

    def step_with_contacts(self, state_in, state_out, control, contacts, dt):
        """Like step() but also returns contacts with per-slot force
        reports filled (reference solver.update_contacts flow,
        solver.py:429 + mujoco/solver_mujoco.py:5159)."""
        out = self.step(state_in, state_out, control, contacts, dt)
        force = contacts.rigid_contact_force
        for plan, lam, dirs in self._last_contact_impulses:
            # lam (n, 3c) impulses along (normal, t1, t2); force = impulse/dt
            # duplicated cross-cell entries each carry w=0.5 and SUM into
            # their shared slot (the two halves of the impulse pair)
            n_env = plan.slots.shape[0]
            lam3 = lam.reshape(n_env, plan.c, 3)
            f = jnp.einsum("nck,nckx->ncx", lam3, dirs) / dt
            w = jnp.asarray(np.asarray(plan.w), f.dtype)
            if w.ndim == 1:
                w = jnp.broadcast_to(w[None], (n_env, plan.c))
            force = force.at[plan.slots].add(f * w[..., None])
        return out, contacts.replace(rigid_contact_force=force)

    def update_contacts(self, contacts, state_in, state_out, dt):
        """Recompute per-contact forces for reporting (reference:
        solver.py:429). Prefer step_with_contacts to avoid the extra solve."""
        _, c2 = self.step_with_contacts(state_in, None, None, contacts, dt)
        return c2

    def _plan_cap(self, c: int) -> int:
        """Resolved per-env contact cap for a plan with ``c`` slots."""
        cap = self.contact_cap
        if cap is None:
            return min(c, 32)
        if cap <= 0:
            return c
        return min(c, int(cap))

    # ------------------------------------------------------------------
    def _build_contact_system(self, model, contacts, g, plan, Minv, qd_g,
                              v_o, w_o, state_in, body_q, dt,
                              q_coords=None, limit_plan=None, cap=None):
        """Assemble the per-group contact system: compacted slots, Jacobian
        rows [contacts*3 | limit-lo | limit-hi], Delassus operator pieces,
        bias b, activity masks. Returns a dict shared by the PGS solve and
        the Kamino ADMM solve."""
        from ...math import orthonormal_basis
        st = model.structure
        dtype = qd_g.dtype
        n_env, d = qd_g.shape
        c = plan.c
        slots = plan.slots                                  # (n, c)

        nrm = contacts.rigid_contact_normal[slots]          # (n, c, 3)
        pos = contacts.rigid_contact_position[slots]
        depth = contacts.rigid_contact_depth[slots]
        active = contacts.rigid_contact_mask[slots]
        if plan.valid is not None:
            # heterogeneous padded layout: mask the clamped-read pad entries
            active = active & jnp.asarray(plan.valid)

        # friction coefficient per slot (pad slot index clamps harmlessly —
        # the row is inactive)
        slots_rd = np.minimum(slots, len(self.slot_shape0) - 1) \
            if len(self.slot_shape0) else slots
        mu = 0.5 * (model.shape_material_mu[np.maximum(self.slot_shape0, 0)]
                    + model.shape_material_mu[np.maximum(self.slot_shape1, 0)])
        mu = mu[slots_rd]
        e_rest = 0.5 * (model.shape_material_restitution[np.maximum(self.slot_shape0, 0)]
                        + model.shape_material_restitution[np.maximum(self.slot_shape1, 0)])[slots_rd]

        # restitution pre-velocity on the FULL slot set (cheap, elementwise)
        vn_pre = jnp.einsum("ncx,ncx->nc", nrm,
                            _point_vel(state_in, model, g, plan, pos))

        anc = jnp.asarray(g.anc, dtype=dtype)               # (b, d)
        zero = jnp.zeros((g.d,), dtype=dtype)
        # lb is (c,) for uniform plans, (n, c) per-env for padded ones
        anc1 = jnp.where((plan.lb1 >= 0)[..., None],
                         anc[np.maximum(plan.lb1, 0)], zero)
        anc0 = jnp.where((plan.lb0 >= 0)[..., None],
                         anc[np.maximum(plan.lb0, 0)], zero)
        sign_full = anc1 - anc0                             # (c, d)|(n, c, d)

        # top-K-by-depth compaction: the dense system scales with slots, not
        # with touching contacts; pick the K deepest active slots per env.
        # NOT silent: the dropped-active count per env is surfaced on the
        # output state as custom["contact:overflow:<gi>"] — a nonzero value
        # means the solve ignored real contacts and contact_cap should be
        # raised (0 = uncapped)
        K = self._plan_cap(c) if cap is None else (
            c if cap <= 0 else min(c, int(cap)))
        self._last_overflow = (
            jnp.maximum(jnp.sum(active.astype(jnp.int32), axis=1) - K, 0)
            if K < c else None)
        if K < c:
            score = active.astype(dtype) * jnp.maximum(1.0 + depth, 0.5)
            _, idx = jax.lax.top_k(score, K)                # (n, K)
            g1 = lambda a: jnp.take_along_axis(a, idx, axis=1)
            g3 = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1)
            nrm_c, pos_c = g3(nrm), g3(pos)
            depth_c, active_c = g1(depth), g1(active)
            mu_c, e_rest_c, vn_pre_c = g1(mu), g1(e_rest), g1(vn_pre)
            sign_c = (sign_full[idx] if sign_full.ndim == 2
                      else jnp.take_along_axis(sign_full, idx[..., None],
                                               axis=1))    # (n, K, d)
        else:
            idx = None
            nrm_c, pos_c, depth_c, active_c = nrm, pos, depth, active
            mu_c, e_rest_c, vn_pre_c = mu, e_rest, vn_pre
            sign_c = jnp.broadcast_to(
                sign_full if sign_full.ndim == 3 else sign_full[None],
                (n_env, c, g.d))
        t1, t2 = orthonormal_basis(nrm_c)

        # jacobian J: (n, K, 3, d) — rows n/t1/t2
        vg = v_o[g.dof_idx]                                 # (n, d, 3)
        wg = w_o[g.dof_idx]
        # dof twist linear velocity at contact point: v + w x p
        Vp = vg[:, None, :, :] + jnp.cross(wg[:, None, :, :],
                                           pos_c[:, :, None, :])  # (n,K,d,3)
        dirs = jnp.stack([nrm_c, t1, t2], axis=2)           # (n, K, 3, 3)

        # non-owned moving side (cross-env/-group contacts, plan.ob): its
        # point inverse mass joins the Delassus diagonal and its pre-step
        # point velocity becomes the moving-support target — each cell then
        # computes the SAME two-body impulse and applies its own half
        # (see _plan_group_contacts; together with the duplicated entries
        # this restores Newton's third law across cells)
        ob_np = np.asarray(plan.ob)
        if ob_np.ndim == 1:
            ob_np = np.broadcast_to(ob_np[None], (n_env, c))
        w_other = None
        const_rows = None
        if (ob_np >= 0).any():
            from ...math import quat_to_matrix
            lb1_neg = np.asarray(plan.lb1) < 0
            if lb1_neg.ndim == 1:
                lb1_neg = np.broadcast_to(lb1_neg[None], (n_env, c))
            sgn_np = np.where(lb1_neg, 1.0, -1.0) * (ob_np >= 0)
            ob_t = jnp.asarray(ob_np, jnp.int32)
            sgn_t = jnp.asarray(sgn_np, dtype)
            if idx is not None:
                ob_c = jnp.take_along_axis(ob_t, idx, axis=1)
                sgn_o = jnp.take_along_axis(sgn_t, idx, axis=1)
            else:
                ob_c, sgn_o = ob_t, sgn_t
            on3 = (ob_c >= 0)[..., None]
            obcc = jnp.maximum(ob_c, 0)
            bq_o = state_in.body_q[obcc]                    # (n, K, 7)
            qd_o = state_in.body_qd[obcc]
            com_o = bq_o[..., 0:3] + quat_rotate(bq_o[..., 3:7],
                                                 model.body_com[obcc])
            v_oth = qd_o[..., 0:3] + jnp.cross(qd_o[..., 3:6],
                                               pos_c - com_o)
            v_oth = jnp.where(on3, v_oth, 0.0)
            # restitution pre-velocity gains the other side's motion
            vn_pre_c = vn_pre_c + jnp.einsum("nkx,nkx->nk",
                                             nrm_c, v_oth) * sgn_o
            # constant relative-velocity rows: sign +1 when other is body1
            const_rows = (jnp.einsum("nkdx,nkx->nkd", dirs, v_oth)
                          * sgn_o[..., None]).reshape(n_env, 3 * K)
            # point inverse mass of the other body along each row direction
            R_o = quat_to_matrix(bq_o[..., 3:7])            # (n, K, 3, 3)
            Iinv_w = jnp.einsum("nkab,nkbc,nkdc->nkad", R_o,
                                model.body_inv_inertia[obcc], R_o)
            r_o = pos_c - com_o
            rxd = jnp.cross(jnp.broadcast_to(r_o[:, :, None, :], dirs.shape),
                            dirs)                           # (n, K, 3, 3)
            w3 = (model.body_inv_mass[obcc][..., None]
                  + jnp.einsum("nkda,nkab,nkdb->nkd", rxd, Iinv_w, rxd))
            w_other = jnp.where(on3, w3, 0.0).reshape(n_env, 3 * K)

        # store the Jacobian TRANSPOSED, (n, d, rows): the row count (~91)
        # rides the 128-lane axis with ~1.4x padding, where (rows, d=14)
        # layouts pad 14 -> 128 lanes and 9x every PGS matvec's HBM traffic
        sign_t = jnp.swapaxes(sign_c, 1, 2)[:, :, :, None]  # (n, d, K, 1)
        Jt = (jnp.einsum("nckx,ncdx->ndck", dirs, Vp)
              * sign_t).reshape(n_env, d, 3 * K)

        # joint-limit rows: unilateral constraints in dof space
        # (reference mujoco limit rows; replaces explicit penalty springs)
        nl = 0
        if limit_plan is not None and len(limit_plan[0]):
            ld, lc = limit_plan
            nl = len(ld)
            qv = q_coords[g.coord_idx[:, lc]]               # (n, nl)
            lo_l = model.joint_limit_lower[g.dof_idx[:, ld]]
            hi_l = model.joint_limit_upper[g.dof_idx[:, ld]]
            eye_cols = jnp.zeros((d, nl), dtype=dtype)
            eye_cols = eye_cols.at[ld, jnp.arange(nl)].set(1.0)
            Jt_lo = jnp.broadcast_to(eye_cols, (n_env, d, nl))
            b_lo = self.baumgarte / dt * jnp.maximum(lo_l - qv, 0.0)
            b_hi = self.baumgarte / dt * jnp.maximum(qv - hi_l, 0.0)
            act_lo = qv <= lo_l + 1e-4
            act_hi = qv >= hi_l - 1e-4
            Jt = jnp.concatenate([Jt, Jt_lo, -Jt_lo], axis=2)

        # Delassus in matvec form: materializing A = J M^-1 J^T is (n, r, r)
        # — 135 MB at 4096 ant envs, re-read every PGS iteration (~1.2 GB of
        # HBM traffic per substep). Two (n, r, d) matvecs per iteration move
        # ~60x less.
        hp = jax.lax.Precision.HIGHEST
        MinvJt = jnp.einsum("nde,ner->ndr", Minv, Jt, precision=hp)
        diag_raw = jnp.einsum("ndr,ndr->nr", Jt, MinvJt, precision=hp)
        if w_other is not None:
            # combined two-body effective mass for cross-cell contacts
            diag_raw = diag_raw.at[:, :3 * K].add(w_other)
        diag = (diag_raw * (1.0 + (1.0 - self.impratio) / self.impratio)
                + self.contact_reg)
        v_free = jnp.einsum("ndr,nd->nr", Jt, qd_g)         # (n, r)
        if const_rows is not None:
            # the other side's pre-step velocity: the row now measures the
            # true RELATIVE normal/tangent velocity, so a box riding a
            # sinking/moving support tracks it instead of oscillating
            v_free = v_free.at[:, :3 * K].add(const_rows)

        # desired normal velocity: restitution + Baumgarte stabilization;
        # margin-active but separated rows (depth < 0) must still allow
        # closing speed up to gap/dt or everything floats one margin above
        # every surface (caught by the MuJoCo resting-height parity gate).
        # A genuine impact (closing faster than the jitter threshold) takes
        # the FULL restitution target even on a still-separated row —
        # summing the gap allowance into it undercounted every bounce by
        # gap/dt (a 4 m/s drop rebounded at 1.8 instead of 3.5 m/s)
        rest = jnp.where(vn_pre_c < -2.0 * 9.81 * dt,
                         -e_rest_c * vn_pre_c, 0.0)
        pen_term = jnp.minimum(
            self.baumgarte / dt * jnp.maximum(
                depth_c - self.contact_slop, 0.0),
            self.depenetration_velocity)
        gap_allow = jnp.minimum(depth_c, 0.0) / dt
        b_n = jnp.where(depth_c > 0, rest + pen_term,
                        jnp.where(rest > 0, rest, gap_allow))
        b = jnp.zeros((n_env, K, 3), dtype=dtype)
        b = b.at[:, :, 0].set(jnp.where(active_c, b_n, 0.0))
        b = b.reshape(n_env, 3 * K)
        act3 = jnp.repeat(active_c, 3, axis=-1).reshape(n_env, 3 * K)
        if nl:
            b = jnp.concatenate([b, b_lo, b_hi], axis=1)
            act3 = jnp.concatenate([act3, act_lo, act_hi], axis=1)

        w_extra = None
        if w_other is not None:
            # (n, r) diagonal extension of the Delassus operator: the other
            # body's point inverse mass (zero on limit rows)
            w_extra = jnp.zeros((n_env, diag.shape[1]), dtype=dtype
                                ).at[:, :3 * K].set(w_other)
        return dict(Jt=Jt, MinvJt=MinvJt, diag=diag, v_free=v_free, b=b,
                    act3=act3, mu=mu_c, K=K, nl=nl, idx=idx, dirs=dirs,
                    c=c, n_env=n_env, d=d, w_extra=w_extra)

    def _solve_contacts(self, model, contacts, g, plan, Minv, qd_g,
                        v_o, w_o, state_in, body_q, dt,
                        q_coords=None, limit_plan=None, group_index=None):
        """Projected-Jacobi impulse solve with pyramidal friction.

        Rows: 3 per contact slot (normal, 2 tangents). Returns updated
        (n, d) group velocities.
        """
        dtype = qd_g.dtype
        sys = self._build_contact_system(
            model, contacts, g, plan, Minv, qd_g, v_o, w_o, state_in,
            body_q, dt, q_coords=q_coords, limit_plan=limit_plan)
        Jt, MinvJt = sys["Jt"], sys["MinvJt"]
        diag, v_free, b = sys["diag"], sys["v_free"], sys["b"]
        act3, mu3 = sys["act3"], sys["mu"]
        K, nl, idx, dirs = sys["K"], sys["nl"], sys["idx"], sys["dirs"]
        c, n_env, d = sys["c"], sys["n_env"], sys["d"]
        hp = jax.lax.Precision.HIGHEST
        omega = self.contact_relaxation
        w_extra = sys["w_extra"]

        def Avec(x):
            y = jnp.einsum("ndr,nd->nr", Jt,
                           jnp.einsum("ndr,nr->nd", MinvJt, x,
                                      precision=hp), precision=hp)
            if w_extra is not None:
                # cross-cell contacts: the other body's inverse mass acts
                # diagonally (exact for its single contact; the Jacobi
                # sweep absorbs the cross terms when it carries several)
                y = y + w_extra * x
            return y

        # diagonally-scaled Jacobi diverges when many rows couple (humanoid
        # pile-ups); cap the step by a matrix-free power-iteration estimate
        # of lambda_max(D^-1/2 A D^-1/2) so the sweep stays a contraction
        # 3 power iterations; the estimate is ||A u_3|| with u_3 the
        # normalized last iterate (tighter than the Rayleigh quotient by
        # Cauchy-Schwarz; 1.1 margin covers the remaining underestimate) —
        # must mirror pgs_pallas.pgs_core exactly for the
        # batched-vs-vmapped parity tests
        from .pgs_pallas import spectral_iters
        n_pi = spectral_iters(diag.shape[1])
        inv_sqrt_d = jax.lax.rsqrt(diag)
        u = jnp.where(act3, 1.0, 0.0)
        u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1.0)
        lam_max = None
        for it in range(n_pi):
            u2 = inv_sqrt_d * Avec(inv_sqrt_d * u) * act3
            nrm = jnp.linalg.norm(u2, axis=-1, keepdims=True)
            if it == n_pi - 1:
                lam_max = nrm[..., 0]
            u = u2 / jnp.maximum(nrm, 1e-9)
        step_scale = jnp.minimum(1.0,
                                 1.8 / jnp.maximum(1.1 * lam_max, 1e-9))

        use_cone = self.friction_cone == "cone"

        def pgs_iter(lam, scale_cur, prev_dn):
            # mirrors pgs_pallas.pgs_core exactly (batched-vs-vmapped
            # parity) incl. the ||dlam||-growth divergence guard
            r = Avec(lam) + v_free - b
            lam_full = lam - (scale_cur[:, None] / diag) * r
            if nl:
                lam_lim = jnp.maximum(lam_full[:, 3 * K:], 0.0)
                lam_lim = jnp.where(act3[:, 3 * K:], lam_lim, 0.0)
            lam_new = lam_full[:, :3 * K].reshape(n_env, K, 3)
            ln = jnp.maximum(lam_new[:, :, 0], 0.0)
            cap = mu3 * ln
            if use_cone:
                # exact ice-cream-cone projection of the tangential part
                # (the reference's kamino NCP treats friction as a true cone)
                tmag = jnp.sqrt(lam_new[:, :, 1] ** 2
                                + lam_new[:, :, 2] ** 2)
                scale = jnp.minimum(cap / jnp.maximum(tmag, 1e-9), 1.0)
                lt1 = lam_new[:, :, 1] * scale
                lt2 = lam_new[:, :, 2] * scale
            else:
                lt1 = jnp.clip(lam_new[:, :, 1], -cap, cap)
                lt2 = jnp.clip(lam_new[:, :, 2], -cap, cap)
            lam_new = jnp.stack([ln, lt1, lt2], axis=-1).reshape(n_env, 3 * K)
            lam_new = jnp.where(act3[:, :3 * K], lam_new, 0.0)
            if nl:
                lam_new = jnp.concatenate([lam_new, lam_lim], axis=1)
            # divergence guard: a non-finite row resets instead of poisoning
            # the whole environment
            lam_new = jnp.where(jnp.isfinite(lam_new), lam_new, 0.0)
            dlt = lam_new - lam
            dn = jnp.sum(dlt * dlt, axis=1)             # (n_env,)
            if prev_dn is not None:
                scale_cur = jnp.where(dn > prev_dn * 1.02, scale_cur * 0.5,
                                      scale_cur)
            return lam_new, scale_cur, dn

        lam = jnp.zeros((n_env, 3 * K + 2 * nl), dtype=dtype)
        if self.warm_start and group_index is not None:
            prev = state_in.custom.get(f"contact:lam:{group_index}")
            if prev is not None:
                prev3 = prev.reshape(n_env, c, 3)
                if idx is not None:
                    prev3 = jnp.take_along_axis(prev3, idx[..., None], axis=1)
                lam = lam.at[:, :3 * K].set(jnp.where(
                    act3[:, :3 * K], prev3.reshape(n_env, 3 * K), 0.0))
        # trace-time unrolled (small static count): avoids the while-loop
        # carry copies that showed up in the op trace
        scale_cur = omega * step_scale
        prev_dn = None
        for _ in range(self.contact_iterations):
            lam, scale_cur, prev_dn = pgs_iter(lam, scale_cur, prev_dn)
        dqd = jnp.einsum("ndr,nr->nd", MinvJt, lam, precision=hp)
        # scatter lam / dirs back to the full slot space so warm-start
        # storage and force reporting keep their per-slot contracts
        lam3 = lam[:, :3 * K].reshape(n_env, K, 3)
        if idx is not None:
            rows = jnp.arange(n_env)[:, None]
            lam_slots = jnp.zeros((n_env, c, 3), dtype=dtype
                                  ).at[rows, idx].set(lam3)
            dirs_slots = jnp.zeros((n_env, c, 3, 3), dtype=dtype
                                   ).at[rows, idx].set(dirs)
        else:
            lam_slots, dirs_slots = lam3, dirs
        return (qd_g + dqd, lam_slots.reshape(n_env, 3 * c), dirs_slots)


def _solve_contacts_newton(self, model, contacts, g, plan, Minv, qd_g,
                           v_o, w_o, state_in, body_q, dt,
                           q_coords=None, limit_plan=None, group_index=None):
    """Active-set Newton solve of the contact QP on pyramidal facets
    (the reference's SolverMuJoCo ``solver="newton"`` option,
    solver_mujoco.py:430; MuJoCo's Newton solver minimizes the same convex
    objective — here in the dual over nonnegative facet impulses).

    Pyramid decomposition (MuJoCo pyramidal cone): per contact, 4 facet
    directions n ± mu t1, n ± mu t2 with impulses x >= 0; normal impulse
    is the facet sum and tangential mu (x+ - x-). The QP

        min 0.5 x^T (Jf M^-1 Jf^T + R) x + x^T (Jf qd - b),  x >= 0

    is solved by projected Newton with an active-set masked Cholesky —
    (n_env, r, r) batched factorizations, MXU-shaped. Converges in a
    handful of iterations where diagonally-scaled PGS needs dozens
    (stacked/ill-conditioned piles).
    """
    dtype = qd_g.dtype
    sys = self._build_contact_system(
        model, contacts, g, plan, Minv, qd_g, v_o, w_o, state_in,
        body_q, dt, q_coords=q_coords, limit_plan=limit_plan)
    Jt, b, act3 = sys["Jt"], sys["b"], sys["act3"]
    mu, K, nl, idx, dirs = sys["mu"], sys["K"], sys["nl"], sys["idx"], sys["dirs"]
    c, n_env, d = sys["c"], sys["n_env"], sys["d"]
    hp = jax.lax.Precision.HIGHEST

    i_n = 3 * np.arange(K)
    Jn, Jt1, Jt2 = Jt[:, :, i_n], Jt[:, :, i_n + 1], Jt[:, :, i_n + 2]
    mu_b = mu[:, None, :]                                  # (n, 1, K)
    Jf = jnp.concatenate(
        [Jn + mu_b * Jt1, Jn - mu_b * Jt1,
         Jn + mu_b * Jt2, Jn - mu_b * Jt2], axis=2)        # (n, d, 4K)
    b_n = b[:, i_n]
    b_f = jnp.tile(b_n, (1, 4))                            # (n, 4K)
    act_n = act3[:, i_n]
    act_f = jnp.tile(act_n, (1, 4))
    if nl:
        Jf = jnp.concatenate([Jf, Jt[:, :, 3 * K:]], axis=2)
        b_f = jnp.concatenate([b_f, b[:, 3 * K:]], axis=1)
        act_f = jnp.concatenate([act_f, act3[:, 3 * K:]], axis=1)
    r = 4 * K + 2 * nl

    MinvJf = jnp.einsum("nde,ner->ndr", Minv, Jf, precision=hp)
    A = jnp.einsum("ndr,nds->nrs", Jf, MinvJf, precision=hp)
    rr = np.arange(r)
    diag_A = A[:, rr, rr]
    R = diag_A * ((1.0 - self.impratio) / self.impratio) + self.contact_reg
    A = A.at[:, rr, rr].add(R)
    # facet free-velocity from v_free (carries the cross-cell moving-
    # support constant): row value = (Jn +- mu Jt) qd + (cn +- mu ct)
    vf = sys["v_free"]
    vn, vt1, vt2 = vf[:, i_n], vf[:, i_n + 1], vf[:, i_n + 2]
    cvec = jnp.concatenate(
        [vn + mu * vt1, vn - mu * vt1, vn + mu * vt2, vn - mu * vt2],
        axis=1)
    if nl:
        cvec = jnp.concatenate([cvec, vf[:, 3 * K:]], axis=1)
    cvec = cvec - b_f
    if sys["w_extra"] is not None:
        # cross-cell combined effective mass on the facet diagonal
        # (w_n + mu^2 w_t — cross terms drop in the diagonal approximation)
        we = sys["w_extra"]
        wf = jnp.concatenate(
            [we[:, i_n] + mu ** 2 * we[:, i_n + 1],
             we[:, i_n] + mu ** 2 * we[:, i_n + 1],
             we[:, i_n] + mu ** 2 * we[:, i_n + 2],
             we[:, i_n] + mu ** 2 * we[:, i_n + 2]], axis=1)
        if nl:
            wf = jnp.concatenate([wf, we[:, 3 * K:]], axis=1)
        A = A.at[:, rr, rr].add(wf)

    actf = act_f.astype(dtype)
    x = jnp.zeros((n_env, r), dtype=dtype)
    for _ in range(self.newton_iterations):
        grad = jnp.einsum("nrs,ns->nr", A, x, precision=hp) + cvec
        free = (act_f & ((x > 0) | (grad < 0))).astype(dtype)
        # masked SPD system: free rows/cols of A, identity elsewhere
        H = (A * (free[:, :, None] * free[:, None, :])
             ).at[:, rr, rr].add(1.0 - free)
        dx = jnp.linalg.solve(H, -(grad * free)[..., None])[..., 0]
        x = jnp.maximum(x + dx * free, 0.0) * actf
        x = jnp.where(jnp.isfinite(x), x, 0.0)

    dqd = jnp.einsum("ndr,nr->nd", MinvJf, x, precision=hp)

    # report per-contact impulses in [n | t1 | t2] form for force export
    xf = x[:, :4 * K].reshape(n_env, 4, K)
    lam3 = jnp.stack([xf.sum(axis=1),
                      mu * (xf[:, 0] - xf[:, 1]),
                      mu * (xf[:, 2] - xf[:, 3])], axis=-1)  # (n, K, 3)
    if idx is not None:
        rows = jnp.arange(n_env)[:, None]
        lam_slots = jnp.zeros((n_env, c, 3), dtype=dtype
                              ).at[rows, idx].set(lam3)
        dirs_slots = jnp.zeros((n_env, c, 3, 3), dtype=dtype
                               ).at[rows, idx].set(dirs)
    else:
        lam_slots, dirs_slots = lam3, dirs
    return (qd_g + dqd, lam_slots.reshape(n_env, 3 * c), dirs_slots)


SolverFeatherstone._solve_contacts_newton = _solve_contacts_newton


def _point_vel(state_in, model, g, plan, pos):
    """Relative velocity (body1 - body0) at contact points from the
    pre-step state (for restitution). lb tables are (c,) for uniform
    plans, (n, c) per-env for padded heterogeneous ones."""
    import numpy as np
    bq = state_in.body_q
    qd = state_in.body_qd
    x_com = bq[:, 0:3] + quat_rotate(bq[:, 3:7], model.body_com)

    def vel_of(lb):
        if lb.ndim == 1:
            gb = np.where(lb >= 0, g.body_idx[:, np.maximum(lb, 0)], 0)
            on = (lb >= 0)[None, :, None]
        else:
            gb = np.where(lb >= 0, np.take_along_axis(
                g.body_idx, np.maximum(lb, 0), axis=1), 0)   # (n, c)
            on = (lb >= 0)[:, :, None]
        v = qd[gb][:, :, 0:3] + jnp.cross(qd[gb][:, :, 3:6],
                                          pos - x_com[gb])
        return jnp.where(on, v, 0.0)

    return vel_of(plan.lb1) - vel_of(plan.lb0)


class SolverMuJoCo(SolverFeatherstone):
    """API-parity alias for the reference's primary robotics backend
    (reference: solver_mujoco.py:430). Same generalized pipeline with
    MuJoCo-flavored defaults; accepts and ignores bridge-specific kwargs
    (``use_mujoco_contacts``, ``nefc_per_env``, ...) for drop-in use."""

    _IGNORED_BRIDGE_KWARGS = frozenset((
        "use_mujoco_contacts", "nefc_per_env", "ncon_per_env", "disableflags",
        "impratio_mjc", "register_collision_groups", "use_mujoco",
        "save_to_mjcf", "separate_envs_to_worlds", "njmax", "cone",
        "update_data_interval", "contact_stiffness_time_const",
    ))

    def __init__(self, model: Model, iterations: int = 16,
                 ls_iterations: int = 0, solver: str = "pgs",
                 integrator: str = "auto", **kwargs):
        # integrator honored like the reference (solver_mujoco.py:613-614):
        # "auto" reads the MJCF <option integrator=...> captured at import
        # (structure.mjc_options), defaulting to euler
        integ = str(integrator).lower()
        if integ == "auto":
            integ = getattr(model.structure, "mjc_options", {}) \
                .get("integrator", "euler")
            if integ == "rk4":
                import warnings
                warnings.warn(
                    "SolverMuJoCo: asset declares integrator=\"RK4\" "
                    "(honored). Note RK4 runs 4 smooth-dynamics stages with "
                    "contact impulses applied after the stage combination, "
                    "and bypasses the batched fast path — pass "
                    "integrator='euler' explicitly for maximum throughput "
                    "in contact-rich batched workloads.", stacklevel=2)
        known = dict(
            contact_iterations=iterations,
            integrator=integ,
        )
        # reference solver options (solver_mujoco.py:430): "newton"/"cg"
        # both map to the active-set Newton QP (a Krylov contact solve has
        # no advantage at these per-env system sizes); ls_iterations folds
        # into the Newton iteration count
        if solver in ("newton", "cg"):
            known["contact_solver"] = "newton"
            if ls_iterations:
                known["newton_iterations"] = max(8, int(ls_iterations))
        passthrough = ("contact_relaxation", "contact_reg", "baumgarte",
                       "contact_slop", "angular_damping", "friction_cone",
                       "limit_mode", "sleep_threshold", "sleep_steps",
                       "warm_start", "max_velocity",
                       "update_mass_matrix_interval", "pgs_backend",
                       "contact_cap", "impratio", "contact_solver",
                       "newton_iterations", "depenetration_velocity")
        for k in passthrough:
            if k in kwargs:
                known[k] = kwargs.pop(k)
        for k in kwargs:
            # loud drop-in behavior: a silently-swallowed kwarg means
            # silently different physics (reference bridge kwargs,
            # solver_mujoco.py:430)
            import warnings
            if k in self._IGNORED_BRIDGE_KWARGS:
                warnings.warn(
                    f"SolverMuJoCo: bridge-specific kwarg {k!r} has no "
                    "equivalent here and is ignored", stacklevel=2)
            else:
                warnings.warn(
                    f"SolverMuJoCo: unknown kwarg {k!r} ignored — physics "
                    "may differ from what you asked for", stacklevel=2)
        super().__init__(model, **known)


class _GroupEquality:
    """Static per-group equality-constraint plan (CONNECT/WELD/JOINT).

    Mirrors the reference's mujoco equality handling
    (reference: solvers/mujoco/equality.py:44-97) as bilateral rows in the
    generalized velocity solve.
    """

    __slots__ = ("eq_idx", "lb1", "lb2", "kinds", "anchor1", "anchor2",
                 "relpose", "dof1", "dof2", "coord1", "coord2", "polycoef",
                 "rows")

    def __init__(self, eq_idx, lb1, lb2, kinds, anchor1, anchor2, relpose,
                 dof1, dof2, coord1, coord2, polycoef):
        self.eq_idx = eq_idx        # (n_env, m) global equality indices
        self.lb1 = lb1              # (m,) local body index (-1 world)
        self.lb2 = lb2
        self.kinds = kinds          # (m,) 0=connect 1=weld 2=joint
        self.anchor1 = anchor1      # (m, 3) body1-local anchor
        self.anchor2 = anchor2      # (m, 3) body2-local anchor
        self.relpose = relpose      # (m, 4) rel orientation (weld)
        self.dof1 = dof1            # (m,) local dof index (joint kind)
        self.dof2 = dof2
        self.coord1 = coord1        # (m,) local coord index (joint kind)
        self.coord2 = coord2
        self.polycoef = polycoef    # (m, 5)
        self.rows = int(sum(3 if k == 0 else (6 if k == 1 else 1)
                            for k in kinds))


def _plan_group_equality(model, groups):
    """Assign equality constraints to homogeneous (group, env) batches."""
    st = model.structure
    E = st.eq_count
    plans = [None] * len(groups)
    if E == 0:
        return plans
    import numpy as np
    from ...core.host_math import (np_quat_mul, np_transform_inverse,
                                   np_transform_multiply, np_transform_point)
    # vectorized lookup tables (finalize-time: O(bodies+dofs) numpy, not
    # O(worlds x bodies) Python dict inserts)
    bgi, be, blb = _body_env_tables(groups, int(st.body_count))
    body_to_env = _TableLookup(bgi, be, blb)
    D = int(np.concatenate([np.asarray(g.dof_idx).reshape(-1)
                            for g in groups]).max()) + 1 if groups else 0
    dgi = -np.ones(D, dtype=np.int32)
    de = -np.ones(D, dtype=np.int32)
    dld = -np.ones(D, dtype=np.int32)
    for gi, g in enumerate(groups):
        di = np.asarray(g.dof_idx)                           # (n, d)
        em = np.broadcast_to(np.arange(g.n, dtype=np.int32)[:, None],
                             di.shape)
        ldm = np.broadcast_to(np.arange(di.shape[1],
                                        dtype=np.int32)[None, :], di.shape)
        dgi[di.reshape(-1)] = gi
        de[di.reshape(-1)] = em.reshape(-1)
        dld[di.reshape(-1)] = ldm.reshape(-1)
    dof_to_env = _TableLookup(dgi, de, dld)

    bq0 = np.asarray(model.body_q, dtype=np.float64)
    anchors = np.asarray(model.eq_anchor, dtype=np.float64)
    relposes = np.asarray(model.eq_relpose, dtype=np.float64)
    polys = np.asarray(model.eq_polycoef, dtype=np.float64)
    per_env = [dict() for _ in groups]
    from ...sim.enums import EqType
    for e_i in range(E):
        kind = int(st.eq_type[e_i])
        o1, o2 = int(model.eq_obj1[e_i]), int(model.eq_obj2[e_i])
        if kind == int(EqType.JOINT):
            d1 = int(st.joint_qd_start[o1]) if o1 >= 0 else -1
            d2 = int(st.joint_qd_start[o2]) if o2 >= 0 else -1
            owner = dof_to_env.get(d1)
            if owner is None:
                continue
            gi, env, ld1 = owner
            ld2 = dof_to_env.get(d2, (gi, env, -1))[2] if d2 >= 0 else -1
            c_base = int(groups[gi].coord_idx[env][0])
            lc1 = int(st.joint_q_start[o1]) - c_base
            lc2 = (int(st.joint_q_start[o2]) - c_base) if o2 >= 0 else -1
            per_env[gi].setdefault(env, []).append(
                (e_i, -1, -1, 2, np.zeros(3), np.zeros(3),
                 np.array([0., 0, 0, 1]), ld1, ld2, lc1, lc2, polys[e_i]))
        else:
            owner = body_to_env.get(o1) or body_to_env.get(o2)
            if owner is None:
                continue
            gi, env, _ = owner
            lb1 = body_to_env[o1][2] if o1 in body_to_env else -1
            lb2 = body_to_env[o2][2] if o2 in body_to_env else -1
            a1 = anchors[e_i]
            # body2-local anchor from initial poses
            p_w = (np_transform_point(bq0[o1], a1) if o1 >= 0 else a1)
            a2 = (np_transform_point(np_transform_inverse(bq0[o2]), p_w)
                  if o2 >= 0 else p_w)
            k = 0 if kind == int(EqType.CONNECT) else 1
            per_env[gi].setdefault(env, []).append(
                (e_i, lb1, lb2, k, a1, a2, relposes[e_i][3:7], -1, -1,
                 -1, -1, polys[e_i]))

    for gi, g in enumerate(groups):
        envs = per_env[gi]
        if not envs or len(envs) != g.n:
            continue
        counts = {len(v) for v in envs.values()}
        if len(counts) != 1:
            continue
        key0 = lambda x: x[0]
        rows0 = sorted(envs[0], key=key0)
        m = len(rows0)
        eq_idx = np.zeros((g.n, m), dtype=np.int32)
        for env, lst in envs.items():
            eq_idx[env] = [x[0] for x in sorted(lst, key=key0)]
        plans[gi] = _GroupEquality(
            eq_idx,
            np.asarray([x[1] for x in rows0], dtype=np.int32),
            np.asarray([x[2] for x in rows0], dtype=np.int32),
            np.asarray([x[3] for x in rows0], dtype=np.int32),
            np.stack([x[4] for x in rows0]),
            np.stack([x[5] for x in rows0]),
            np.stack([np.asarray(x[6]) for x in rows0]),
            np.asarray([x[7] for x in rows0], dtype=np.int32),
            np.asarray([x[8] for x in rows0], dtype=np.int32),
            np.asarray([x[9] for x in rows0], dtype=np.int32),
            np.asarray([x[10] for x in rows0], dtype=np.int32),
            np.stack([x[11] for x in rows0]),
        )
    return plans


def _island_partition(g, plan, limit_plan):
    """Host-side contact-island partition of a group's contact rows.

    The Delassus operator A = J M^-1 J^T couples two constraint rows only
    when their dof supports overlap: dofs of one articulation (M^-1 is
    block-diagonal across articulations) or the two bodies of a shared
    contact. Connected components of that coupling graph are *islands* —
    A is block-diagonal under the island permutation, so the per-env dense
    factorization can be replaced by per-island blocks (TPU-first
    equivalent of the reference's per-world sparse factorization suite,
    kamino/_src/linalg/factorize/).

    Rows are laid out [3*c contact rows | nl limit-lo | nl limit-hi]
    (matching ``_build_contact_system`` with an uncapped plan). Returns
    ``(P, n_isl, rb)`` where ``P`` is an (n_isl, rb) int32 row-permutation
    table padded with ``r`` (out-of-range ⇒ dropped on scatter), or None
    when the plan is per-env heterogeneous or everything couples into one
    island.
    """
    lb0, lb1 = np.asarray(plan.lb0), np.asarray(plan.lb1)
    if lb0.ndim != 1:
        return None                     # per-env slot→body maps: no static islands
    c = int(plan.c)
    anc = np.asarray(g.anc) != 0        # (b, d) local body → dof support
    d = anc.shape[1]

    parent = np.arange(d + 1)           # extra node d = "static world"

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb_ = find(a), find(b)
        if ra != rb_:
            parent[rb_] = ra

    body_rep = np.full(anc.shape[0], d, dtype=np.int64)
    for b in range(anc.shape[0]):
        dofs = np.nonzero(anc[b])[0]
        if len(dofs):
            body_rep[b] = dofs[0]
            for j in dofs[1:]:
                union(dofs[0], int(j))

    # contacts merge the two touching bodies' dof components
    for i in range(c):
        r0 = body_rep[lb0[i]] if lb0[i] >= 0 else d
        r1 = body_rep[lb1[i]] if lb1[i] >= 0 else d
        if r0 != d and r1 != d:
            union(int(r0), int(r1))

    nl = len(limit_plan[0]) if (limit_plan is not None
                                and len(limit_plan[0])) else 0
    r = 3 * c + 2 * nl
    row_isl = np.empty(r, dtype=np.int64)
    for i in range(c):
        rep = body_rep[lb0[i]] if lb0[i] >= 0 else body_rep[lb1[i]] \
            if lb1[i] >= 0 else d
        rid = find(int(rep)) if rep != d else d
        row_isl[3 * i:3 * i + 3] = rid
    if nl:
        ld = np.asarray(limit_plan[0])
        for j in range(nl):
            rid = find(int(ld[j]))
            row_isl[3 * c + j] = rid
            row_isl[3 * c + nl + j] = rid

    ids = np.unique(row_isl)
    if len(ids) < 2:
        return None
    rows_by = [np.nonzero(row_isl == i)[0] for i in ids]
    rb = max(len(rr) for rr in rows_by)
    P = np.full((len(ids), rb), r, dtype=np.int32)
    for k, rr in enumerate(rows_by):
        P[k, :len(rr)] = rr
    return P, len(ids), rb


class SolverKamino(SolverFeatherstone):
    """Constrained multibody solver for kinematic loops and hard frictional
    contact (reference: kamino/solver_kamino.py:110 — Disney's NCP solver
    with Moreau-Jean time stepping and PADMM).

    Same Moreau-Jean structure as the parent (velocity-level implicit step,
    impulses at the contact set, no acceleration-level forces), but the
    frictional NCP is solved by **proximal ADMM over second-order cones**
    with a per-env direct factorization instead of diagonally-scaled
    projected Jacobi:

        lam_hat = (A + rho I)^-1 (rho (z - u) - q)     [Cholesky, exact]
        z       = Pi_K(lam_hat + u)                    [SOC projection]
        u       = u + lam_hat - z

    where A = J M^-1 J^T + R is the Delassus operator and K the product of
    friction cones / nonnegative orthants. The direct sub-solve converges
    on hard, strongly-coupled contact sets (dense stacks, large mass
    ratios) where the Jacobi sweep stalls — matching the role of the
    reference's PADMM (kamino/_src/solvers/padmm.py). Bilateral equality
    rows (CONNECT/WELD/JOINT kinematic loops) are solved exactly against
    the mass matrix by the shared pipeline (``_solve_equality``).
    """

    use_admm = True

    def __init__(self, model: Model, iterations: int = 32, rho: float = 0.1,
                 use_islands: bool = True, **kwargs):
        kwargs.setdefault("friction_cone", "cone")
        kwargs.setdefault("baumgarte", 0.3)
        super().__init__(model, contact_iterations=iterations, **kwargs)
        self.admm_rho = float(rho)
        # blocked per-island factorization (reference: Kamino's per-world
        # sparse factorization suite, kamino/_src/linalg/factorize/):
        # host-planned island permutation turns the (n, r, r) Cholesky into
        # (n * n_isl, rb, rb) batched blocks — O(sum rb^3) instead of O(r^3)
        self.use_islands = bool(use_islands)
        self._island_plans = {}
        self._last_islands = None

    def _solve_contacts(self, model, contacts, g, plan, Minv, qd_g,
                        v_o, w_o, state_in, body_q, dt,
                        q_coords=None, limit_plan=None, group_index=None):
        dtype = qd_g.dtype
        # island planning happens BEFORE system assembly: the blocked path
        # needs uncapped/uncompacted rows (static slot→row layout), which
        # is the accurate Kamino trade anyway. A user-set positive
        # contact_cap opts out back into the dense top-K path.
        isl = None
        if self.use_islands and not (self.contact_cap and
                                     self.contact_cap > 0):
            key = group_index if group_index is not None else id(plan)
            if key not in self._island_plans:
                self._island_plans[key] = _island_partition(
                    g, plan, limit_plan)
            isl = self._island_plans[key]
        sys = self._build_contact_system(
            model, contacts, g, plan, Minv, qd_g, v_o, w_o, state_in,
            body_q, dt, q_coords=q_coords, limit_plan=limit_plan,
            cap=0 if isl is not None else None)
        Jt, MinvJt = sys["Jt"], sys["MinvJt"]
        v_free, b = sys["v_free"], sys["b"]
        act3, mu3 = sys["act3"], sys["mu"]
        K, nl, idx, dirs = sys["K"], sys["nl"], sys["idx"], sys["dirs"]
        c, n_env, d = sys["c"], sys["n_env"], sys["d"]
        hp = jax.lax.Precision.HIGHEST
        r = 3 * K + 2 * nl

        msk = act3.astype(dtype)
        w_full = None
        if sys["w_extra"] is not None:
            # cross-cell contacts: other body's point inverse mass on the
            # diagonal (combined two-body effective mass)
            w_full = sys["w_extra"]
            if w_full.shape[1] < r:
                w_full = jnp.concatenate(
                    [w_full, jnp.zeros((n_env, r - w_full.shape[1]),
                                       dtype=dtype)], axis=1)
        q = (v_free - b) * msk

        if isl is not None:
            P, n_isl, rb = isl
            self._last_islands = (n_isl, rb, r)
            Pc = np.minimum(P, r - 1)                        # clamped gather
            pad = jnp.asarray(P >= r)                        # (I, rb)
            rr_b = np.arange(rb)
            Jt_b = Jt[:, :, Pc]                              # (n, d, I, rb)
            MJt_b = MinvJt[:, :, Pc]
            A_b = jnp.einsum("ndir,ndis->nirs", Jt_b, MJt_b, precision=hp)
            extra = jnp.full((n_env, r), self.contact_reg, dtype=dtype)
            if w_full is not None:
                extra = extra + w_full
            A_b = A_b.at[:, :, rr_b, rr_b].add(extra[:, Pc])
            # decouple inactive + pad rows (identity diag): pad solutions
            # are dropped on scatter, inactive u-windup must not couple back
            msk_b = msk[:, Pc] * (~pad).astype(dtype)        # (n, I, rb)
            mm_b = msk_b[..., :, None] * msk_b[..., None, :]
            eye_b = jnp.eye(rb, dtype=dtype)
            A_b = A_b * mm_b + (1.0 - mm_b) * eye_b
            diag_b = A_b[:, :, rr_b, rr_b]
            diag_mean = (jnp.sum(diag_b * (~pad).astype(dtype), axis=(1, 2))
                         / float(r))
            rho = (self.admm_rho
                   * jnp.maximum(diag_mean, 1e-9))           # (n,)
            L_b = jnp.linalg.cholesky(
                A_b + rho[:, None, None, None] * eye_b)
            L2 = L_b.reshape(n_env * n_isl, rb, rb)
            P_flat = jnp.asarray(P.reshape(-1), jnp.int32)
            solve_b = jax.vmap(jax.scipy.linalg.cho_solve,
                               in_axes=((0, None), 0))

            def dsolve(rhs):
                rg = rhs[:, Pc].reshape(n_env * n_isl, rb)
                s = solve_b((L2, True), rg).reshape(n_env, n_isl * rb)
                return jnp.zeros((n_env, r), dtype=dtype
                                 ).at[:, P_flat].set(s, mode="drop")

            rho = rho[:, None]                               # (n, 1)
        else:
            self._last_islands = None
            # materialize the Delassus operator: single-island scenes are
            # few-env / hard-contact, the (n, r, r) direct factor is the
            # right trade
            A = jnp.einsum("ndr,nds->nrs", Jt, MinvJt, precision=hp)
            A = A + self.contact_reg * jnp.eye(r, dtype=dtype)
            if w_full is not None:
                A = A + jnp.eye(r, dtype=dtype)[None] * w_full[:, None, :]
            # decouple inactive rows (dynamic mask): otherwise their u
            # windup couples back through A and destabilizes the iteration
            mm = msk[:, :, None] * msk[:, None, :]
            A = A * mm + (1.0 - mm) * jnp.eye(r, dtype=dtype)
            # scale-aware proximal weight: rho relative to the mean diagonal
            diag_mean = jnp.mean(jnp.diagonal(A, axis1=1, axis2=2), axis=-1)
            rho = (self.admm_rho
                   * jnp.maximum(diag_mean, 1e-9))[:, None, None]
            L = jnp.linalg.cholesky(A + rho * jnp.eye(r, dtype=dtype))
            rho = rho[:, :, 0]                               # (n, 1)
            solve_full = jax.vmap(jax.scipy.linalg.cho_solve,
                                  in_axes=((0, None), 0))

            def dsolve(rhs):
                return solve_full((L, True), rhs)

        def proj(x):
            """Project onto the admissible set: SOC per contact, lam >= 0
            for limit rows, 0 for inactive rows."""
            lam3 = x[:, :3 * K].reshape(n_env, K, 3)
            ln, lt1, lt2 = lam3[:, :, 0], lam3[:, :, 1], lam3[:, :, 2]
            tmag = jnp.sqrt(lt1 ** 2 + lt2 ** 2 + 1e-18)
            inside = tmag <= mu3 * ln
            below = mu3 * tmag <= -ln
            # SOC projection (Boyd): blend onto the cone surface
            lnp = (ln + mu3 * tmag) / (1.0 + mu3 ** 2)
            lnp = jnp.maximum(lnp, 0.0)
            scale = jnp.where(tmag > 1e-12, mu3 * lnp / tmag, 0.0)
            ln_o = jnp.where(inside, ln, jnp.where(below, 0.0, lnp))
            sc_o = jnp.where(inside, 1.0, jnp.where(below, 0.0, scale))
            out3 = jnp.stack([ln_o, lt1 * sc_o, lt2 * sc_o], axis=-1)
            out = out3.reshape(n_env, 3 * K)
            if nl:
                out = jnp.concatenate(
                    [out, jnp.maximum(x[:, 3 * K:], 0.0)], axis=1)
            return jnp.where(act3, out, 0.0)

        z = jnp.zeros((n_env, r), dtype=dtype)
        if self.warm_start and group_index is not None:
            prev = state_in.custom.get(f"contact:lam:{group_index}")
            if prev is not None:
                prev3 = prev.reshape(n_env, c, 3)
                if idx is not None:
                    prev3 = jnp.take_along_axis(prev3, idx[..., None], axis=1)
                z = z.at[:, :3 * K].set(jnp.where(
                    act3[:, :3 * K], prev3.reshape(n_env, 3 * K), 0.0))
        u = jnp.zeros_like(z)
        for _ in range(self.contact_iterations):
            rhs = rho * (z - u) - q
            lam_hat = dsolve(rhs)
            z = proj(lam_hat + u)
            u = u + lam_hat - z
        z = jnp.where(jnp.isfinite(z), z, 0.0)
        dqd = jnp.einsum("ndr,nr->nd", MinvJt, z, precision=hp)

        lam3 = z[:, :3 * K].reshape(n_env, K, 3)
        if idx is not None:
            rows = jnp.arange(n_env)[:, None]
            lam_slots = jnp.zeros((n_env, c, 3), dtype=dtype
                                  ).at[rows, idx].set(lam3)
            dirs_slots = jnp.zeros((n_env, c, 3, 3), dtype=dtype
                                   ).at[rows, idx].set(dirs)
        else:
            lam_slots, dirs_slots = lam3, dirs
        return (qd_g + dqd, lam_slots.reshape(n_env, 3 * c), dirs_slots)
