"""XPBD solver: extended position-based dynamics for rigid bodies,
particles, cloth and soft bodies.

TPU-native re-design of reference newton/_src/solvers/xpbd/solver_xpbd.py:35
(step :330) + kernels.py. Differences from the reference's Warp design:

- **Jacobi with relaxation instead of atomics.** The reference scatters
  per-constraint deltas with atomic adds and a relaxation factor; we compute
  all constraint corrections in parallel and combine them with
  ``jax.ops.segment_sum`` — bit-deterministic, differentiable, and maps to
  XLA reductions (no DeterministicMode axis needed).
- **Static contact slots.** Contacts arrive in build-time-fixed slots with
  static slot->body maps (ModelStructure.slot_body0/1), so the contact solve
  is pure gather/segment_sum with no dynamic indexing.
- **lax.scan over iterations** — the solve loop is one fused XLA loop;
  reverse-mode AD works through it (replacing the reference's
  allocate-fresh-arrays-for-wp.Tape pattern, solver_xpbd.py:471-482).

The step contract matches SolverBase: pure function, returns the new State,
and writes joint coordinates back via eval_ik like the reference does.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..math import (
    quat_conjugate,
    safe_norm,
    safe_normalize,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_rotate_inv,
    quat_to_matrix,
    transform_multiply,
    transform_point,
)
from ..sim.articulation import eval_ik
from ..sim.contacts import Contacts
from ..sim.control import Control
from ..sim.enums import JointType
from ..sim.model import Model
from ..sim.state import State
from .solver import SolverBase, integrate_bodies, integrate_particles

__all__ = ["SolverXPBD"]


def _segment_add(data, idx, num):
    """Deterministic scatter-add (rows of ``data`` summed per body index)."""
    return jax.ops.segment_sum(data, idx, num_segments=num)


class SolverXPBD(SolverBase):
    """Extended position-based dynamics (reference: solver_xpbd.py:35).

    Args:
        iterations: positional solver iterations per substep.
        relaxation: Jacobi relaxation factor for accumulated corrections.
        joint_linear_compliance / joint_angular_compliance: XPBD compliance
            for joint constraints (0 = rigid).
        rigid_contact_relaxation: relaxation for contact corrections.
        angular_damping: passed to the semi-implicit integrator.
    """

    def __init__(self, model: Model, iterations: int = 4,
                 relaxation: float = 0.7,
                 joint_linear_compliance: float = 0.0,
                 joint_angular_compliance: float = 0.0,
                 rigid_contact_relaxation: float = 0.8,
                 angular_damping: float = 0.05,
                 enable_restitution: bool = True,
                 enable_particle_particle: bool = True,
                 friction_epsilon: float = 1e-5,
                 max_depenetration_velocity: float = 3.0,
                 friction_model: str = "coulomb",
                 dahl_sigma: float = 2.0e4,
                 particle_max_per_cell: int = 4):
        super().__init__(model)
        self.iterations = int(iterations)
        self.relaxation = float(relaxation)
        self.joint_linear_compliance = float(joint_linear_compliance)
        self.joint_angular_compliance = float(joint_angular_compliance)
        self.rigid_contact_relaxation = float(rigid_contact_relaxation)
        self.angular_damping = float(angular_damping)
        self.enable_restitution = bool(enable_restitution)
        self.enable_particle_particle = bool(enable_particle_particle)
        self.friction_epsilon = float(friction_epsilon)
        # cap the positional push-out rate so resolving a deep overlap does
        # not convert into a launch velocity at reconstruction
        # (reference solver_xpbd max depenetration semantics)
        self.max_depenetration_velocity = float(max_depenetration_velocity)
        # "dahl": bristle-state friction with hysteresis, the model the
        # reference's VBD backend uses for cable bundles (reference:
        # vbd/rigid_vbd_kernels.py Dahl friction state,
        # example_cable_dahl_hysteresis.py). Per static contact slot the
        # tangential bristle force f evolves with slip x as
        # df/dx = sigma * (1 - (f . t̂) / f_c),  f_c = mu * N,
        # persisted across steps in State.custom["xpbd:dahl_f"]
        # (allocate with solver.init_state(state)).
        if friction_model not in ("coulomb", "dahl"):
            raise ValueError(f"unknown friction_model {friction_model!r}")
        self.friction_model = friction_model
        self.dahl_sigma = float(dahl_sigma)
        # hashgrid candidate budget for particle-particle contacts; raise
        # for dense packings (e.g. soft-grid-on-cloth) where 4 slots/cell
        # would drop cross-object partners
        self.particle_max_per_cell = int(particle_max_per_cell)
        self._plan = _XPBDPlan(model)

    def init_state(self, state: State) -> State:
        """Allocate solver-carried custom state (Dahl bristle forces)."""
        custom = dict(state.custom)
        if self.friction_model == "dahl":
            C = len(self._plan.slot_body0)
            custom.setdefault("xpbd:dahl_f",
                              jnp.zeros((C, 3), dtype=jnp.float32))
        return state.replace(custom=custom)

    # ------------------------------------------------------------------
    def step(self, state_in: State, state_out: Optional[State] = None,
             control: Optional[Control] = None,
             contacts: Optional[Contacts] = None, dt: float = 1e-3,
             model: Optional[Model] = None) -> State:
        # `model` overrides self.model with e.g. perturbed physical
        # parameters (same topology/structure): the hook for
        # differentiating a rollout w.r.t. model parameters
        # (spring rest lengths, masses, gravity ...) with jax.grad
        model = self.model if model is None else model
        plan = self._plan
        B = model.body_count
        dtype = state_in.body_q.dtype

        state = state_in
        # 1. joint forces -> body wrenches (reference :437-455)
        if control is not None and model.structure.joint_dof_count:
            state = state.replace(body_f=state.body_f +
                                  plan.joint_forces_to_body_f(model, state, control))

        # 2. predict with semi-implicit integration
        body_q_pred, body_qd_pred = integrate_bodies(
            model, state, dt, self.angular_damping)
        particle_q_pred, particle_qd_pred = integrate_particles(model, state, dt)

        if B:
            x_prev_com = state.body_q[:, 0:3] + quat_rotate(
                state.body_q[:, 3:7], model.body_com)
            x = body_q_pred[:, 0:3] + quat_rotate(body_q_pred[:, 3:7], model.body_com)
            q = body_q_pred[:, 3:7]
            q_prev = state.body_q[:, 3:7]
        else:
            x = jnp.zeros((0, 3), dtype=dtype)
            q = jnp.zeros((0, 4), dtype=dtype)
            x_prev_com = x
            q_prev = q

        px = particle_q_pred
        px_prev = state.particle_q

        # particle-particle neighborhoods (reference: hash-grid rebuild per
        # substep, solver_xpbd.py:404) — static-shape sorted-hash query
        nbr = None
        if model.particle_count > 1 and self.enable_particle_particle:
            from ..geometry.hashgrid import HashGrid
            r_max = float(np.max(np.asarray(model.particle_radius), initial=0.0))
            if r_max > 0:
                grid = HashGrid(cell_size=2.0 * r_max,
                                max_per_cell=self.particle_max_per_cell)
                nbr = grid.query(px, 2.0 * r_max)

        C = contacts.rigid_contact_max if contacts is not None else 0
        lam_n = jnp.zeros((C,), dtype=dtype)

        # contact anchors in collide-time body-local frames: penetration is
        # re-evaluated from *current* poses every iteration (the collide-time
        # depth alone double-corrects once the prediction has moved)
        anchors = None
        if B and contacts is not None and C:
            anchors = plan.contact_local_anchors(model, state_in, contacts)

        # shape surface displacement over the substep at each soft contact
        # (v + w x r of the shape's body): moving/spinning kinematic shapes
        # drag particles through friction (conveyor belts, rollers)
        soft_surf_disp = None
        if (B and model.particle_count and contacts is not None
                and contacts.soft_contact_max):
            sc_shape = contacts.soft_contact_shape
            sc_body = model.shape_body[jnp.maximum(sc_shape, 0)]
            bsafe = jnp.maximum(sc_body, 0)
            com_w = state_in.body_q[bsafe, 0:3] + quat_rotate(
                state_in.body_q[bsafe, 3:7], model.body_com[bsafe])
            v_surf = (state_in.body_qd[bsafe, 0:3]
                      + jnp.cross(state_in.body_qd[bsafe, 3:6],
                                  contacts.soft_contact_position - com_w))
            soft_surf_disp = jnp.where(
                (sc_body >= 0)[:, None], v_surf, 0.0) * dt

        # 3. iterate positional constraints (lax.scan -> differentiable)
        # denom_prev carries the previous iteration's per-body Jacobi
        # averaging denominator into the contact solve: compliant
        # (hydroelastic) rows need the REALIZED fraction of dlam that the
        # averaged-Jacobi update applies, or the XPBD lambda<->impulse
        # correspondence breaks and the patch stiffness is off by the
        # constraint count (one-iteration lag; exact at the fixed point)
        denom_prev = jnp.ones((B,), dtype=dtype)

        def one_iteration(carry, _):
            x, q, px, lam_n, denom_prev = carry
            if B:
                dx, dth, nconst = plan.solve_joints(
                    model, x, q, dt,
                    self.joint_linear_compliance,
                    self.joint_angular_compliance,
                    control)
                if contacts is not None and C:
                    dxc, dthc, ncc, lam_n2 = plan.solve_rigid_contacts(
                        model, x, q, contacts, anchors, lam_n, dt,
                        self.max_depenetration_velocity,
                        gamma_relax=self.rigid_contact_relaxation,
                        denom_prev=denom_prev)
                    dx = dx + dxc * self.rigid_contact_relaxation / self.relaxation
                    dth = dth + dthc * self.rigid_contact_relaxation / self.relaxation
                    nconst = nconst + ncc
                    lam_n = lam_n2
                # averaged Jacobi: divide by per-body constraint count to
                # avoid overshoot (reference uses atomic relaxation weights)
                denom = jnp.maximum(nconst, 1.0)[:, None]
                denom_prev = denom[:, 0]
                x = x + self.relaxation * dx / denom
                dq = quat_mul(jnp.concatenate(
                    [dth / denom, jnp.zeros_like(dth[:, :1])], axis=-1), q)
                q = quat_normalize(q + 0.5 * self.relaxation * dq)
            if model.particle_count:
                dpx, dpxc, pnc = plan.solve_particles(
                    model, px, px_prev, contacts, dt, nbr, soft_surf_disp)
                # averaged Jacobi: structural corrections by constraint
                # degree, contact corrections by active-contact count
                px = px + self.relaxation * (
                    dpx / jnp.asarray(plan.particle_degree)[:, None]
                    + dpxc / jnp.maximum(pnc, 1.0)[:, None])
            return (x, q, px, lam_n, denom_prev), None

        (x, q, px, lam_n, _), _ = jax.lax.scan(
            one_iteration, (x, q, px, lam_n, denom_prev), None,
            length=self.iterations)

        # 4. velocity reconstruction from positions (reference :560+)
        if B:
            v = (x - x_prev_com) / dt
            dq_rel = quat_mul(q, quat_conjugate(q_prev))
            w = 2.0 / dt * dq_rel[:, 0:3]
            w = jnp.where(dq_rel[:, 3:4] < 0.0, -w, w)
            # kinematic/static bodies keep integrator velocities
            dyn = (model.body_inv_mass > 0)[:, None]
            v = jnp.where(dyn, v, body_qd_pred[:, 0:3])
            w = jnp.where(dyn, w, body_qd_pred[:, 3:6])
        else:
            v = jnp.zeros((0, 3), dtype=dtype)
            w = jnp.zeros((0, 3), dtype=dtype)

        # 5. contact velocity pass: restitution + dynamic friction
        dahl_new = None
        if B and contacts is not None and C:
            dahl_f = None
            if self.friction_model == "dahl":
                dahl_f = state_in.custom.get("xpbd:dahl_f")
                if dahl_f is None:
                    raise ValueError(
                        "friction_model='dahl': initialize the state with "
                        "solver.init_state(state) to allocate bristle state")
            v, w, dahl_new = plan.velocity_pass(
                model, x, q, v, w, state_in, contacts, lam_n, dt,
                self.enable_restitution, dahl_f, self.dahl_sigma)
            if dahl_f is None:
                # the velocity pass is an averaged-Jacobi projection: one
                # pass under-damps coupled slip (a resting offset box
                # slowly spins up and rolls off); a few fixed iterations
                # converge it (Dahl mode keeps one pass — its bristle
                # state must integrate exactly once per substep)
                for _ in range(3):
                    v, w, _ = plan.velocity_pass(
                        model, x, q, v, w, state_in, contacts, lam_n, dt,
                        self.enable_restitution)
        if B and plan.has_cables:
            v, w = plan.cable_velocity_pass(model, x, q, v, w, dt)

        if model.particle_count:
            pv = (px - px_prev) / dt
            active = (model.particle_inv_mass > 0)[:, None]
            pv = jnp.where(active, pv, state_in.particle_qd)
            px = jnp.where(active, px, state_in.particle_q)
        else:
            pv = state_in.particle_qd

        if B:
            body_q = jnp.concatenate([x - quat_rotate(q, model.body_com), q], axis=-1)
            body_qd = jnp.concatenate([v, w], axis=-1)
        else:
            body_q, body_qd = state_in.body_q, state_in.body_qd

        out = state_in.replace(body_q=body_q, body_qd=body_qd,
                               particle_q=px, particle_qd=pv)
        if dahl_new is not None:
            out = out.replace(custom={**out.custom, "xpbd:dahl_f": dahl_new})
        # write back generalized coordinates (reference updates joint_q via IK)
        if model.structure.joint_count:
            jq, jqd = eval_ik(model, out)
            out = out.replace(joint_q=jq, joint_qd=jqd)
        self._last_lam_n = lam_n
        return out

    def step_with_contacts(self, state_in, state_out, control, contacts, dt):
        """step() + contact force report from accumulated normal impulses
        (reference: xpbd/solver_xpbd.py:865 update_contacts)."""
        out = self.step(state_in, state_out, control, contacts, dt)
        if contacts is None or contacts.rigid_contact_max == 0:
            return out, contacts
        # positional lambda -> force: f = relax * lambda / dt^2 (XPBD;
        # only the relaxed fraction of each accumulated impulse is applied)
        fmag = self.rigid_contact_relaxation * self._last_lam_n / (dt * dt)
        # hydroelastic slots report the patch pressure integral directly:
        # F = c * depth is exact at the converged state (the lambda-based
        # report would carry the Jacobi-averaging factor)
        stiff = contacts.rigid_contact_stiffness
        if stiff.shape[0] == fmag.shape[0]:
            fmag = jnp.where(stiff > 0.0,
                             stiff * contacts.rigid_contact_depth, fmag)
        force = contacts.rigid_contact_normal * fmag[:, None]
        return out, contacts.replace(rigid_contact_force=force)

    def update_contacts(self, contacts, state_in, state_out, dt):
        _, c2 = self.step_with_contacts(state_in, None, None, contacts, dt)
        return c2


class _XPBDPlan:
    """Host-precomputed static plans + vectorized constraint kernels."""

    def __init__(self, model: Model):
        st = model.structure
        self.st = st
        J = st.joint_count
        jt = st.joint_type
        self.has_joints = J > 0
        # per-joint static masks
        self.j_parent = np.maximum(st.joint_parent, 0)
        self.j_has_parent = (st.joint_parent >= 0)
        self.j_child = st.joint_child
        self.is_free = np.isin(jt, [int(JointType.FREE), int(JointType.DISTANCE)])
        self.is_ball = jt == int(JointType.BALL)
        self.is_fixed = jt == int(JointType.FIXED)
        self.is_rev = jt == int(JointType.REVOLUTE)
        self.is_pris = jt == int(JointType.PRISMATIC)
        self.is_cable = jt == int(JointType.CABLE)
        self.has_cables = bool(self.is_cable.any()) if J else False
        self.lock_rot = self.is_fixed | self.is_pris
        # first dof index per joint (axis/limit lookup for 1-dof joints)
        self.dof0 = st.joint_qd_start[:-1] if J else np.zeros(0, np.int32)
        self.coord0 = st.joint_q_start[:-1] if J else np.zeros(0, np.int32)
        if self.has_cables:
            # per-joint dof indices for the 6 cable stiffness slots
            # [shear_x, shear_y, stretch_z, bend_x, bend_y, twist_z]
            # (clipped so non-cable rows stay in bounds; they are masked out)
            D = max(int(st.joint_dof_count), 1)
            self.cable_dof = np.minimum(
                self.dof0[:, None] + np.arange(6)[None, :], D - 1)

        # contact slot -> body maps
        self.slot_body0 = getattr(st, "slot_body0", np.zeros(0, np.int32))
        self.slot_body1 = getattr(st, "slot_body1", np.zeros(0, np.int32))
        self.slot_shape0 = getattr(st, "slot_shape0", np.zeros(0, np.int32))
        self.slot_shape1 = getattr(st, "slot_shape1", np.zeros(0, np.int32))

        # particle constraint topology + static Jacobi averaging degree
        self.has_springs = st.spring_count > 0
        self.has_tris = st.tri_count > 0
        self.has_tets = st.tet_count > 0
        self.has_edges = st.edge_count > 0
        N = st.particle_count
        deg = np.zeros(N, dtype=np.float32)
        if N:
            import numpy as _np
            if st.spring_count:
                si = _np.asarray(model.spring_indices)
                _np.add.at(deg, si.reshape(-1), 1.0)
            if st.tri_count:
                ti = _np.asarray(model.tri_indices)
                _np.add.at(deg, ti.reshape(-1), 2.0)  # 3 edges / 3 verts x2
            if st.tet_count:
                tt = _np.asarray(model.tet_indices)
                _np.add.at(deg, tt.reshape(-1), 4.0)  # volume + 6 edges / 4
            deg += 1.0  # contact slot
        self.particle_degree = np.maximum(deg, 1.0)

    # ------------------------------------------------------------------
    @staticmethod
    def _inv_inertia_world(model: Model, q):
        R = quat_to_matrix(q)
        return jnp.einsum("bij,bjk,blk->bil", R, model.body_inv_inertia, R)

    def joint_forces_to_body_f(self, model: Model, state: State,
                               control: Control):
        """Map generalized dof forces to body wrenches for 1-dof joints
        (reference xpbd apply_joint_forces)."""
        st = self.st
        B = model.body_count
        dtype = state.body_q.dtype
        f_out = jnp.zeros((B, 6), dtype=dtype)
        if not self.has_joints:
            return f_out
        one_dof = self.is_rev | self.is_pris
        if not one_dof.any():
            return f_out
        j = np.nonzero(one_dof)[0]
        dof = self.dof0[j]
        tau = control.joint_f[dof]                          # (nj,)
        # world axis from parent anchor frame
        parent = self.j_parent[j]
        hasp = jnp.asarray(self.j_has_parent[j])[:, None]
        X_wp = jnp.where(hasp, state.body_q[parent],
                         jnp.zeros((7,), dtype=dtype).at[6].set(1.0))
        X_pj = transform_multiply(X_wp, model.joint_X_p[j])
        axis_w = quat_rotate(X_pj[:, 3:7], model.joint_axis[dof])
        child = self.j_child[j]
        rev = jnp.asarray(self.is_rev[j])[:, None]
        # revolute: pure torque about the axis
        torque = axis_w * tau[:, None]
        # prismatic: force along the axis at the joint anchor
        force = axis_w * tau[:, None]
        anchor = X_pj[:, 0:3]
        com_c = transform_point(state.body_q[child], model.body_com[child])
        com_p = transform_point(X_wp, model.body_com[parent])
        arm_c = anchor - com_c
        arm_p = anchor - com_p
        f_c = jnp.where(rev, 0.0, force)
        t_c = jnp.where(rev, torque, jnp.cross(arm_c, force))
        f_p = -f_c
        t_p = jnp.where(rev, -torque, jnp.cross(arm_p, -force))
        wrench_c = jnp.concatenate([f_c, t_c], axis=-1)
        wrench_p = jnp.concatenate([f_p, t_p], axis=-1) * hasp
        f_out = f_out.at[child].add(wrench_c)
        f_out = f_out.at[parent].add(wrench_p)
        return f_out

    # ------------------------------------------------------------------
    def solve_joints(self, model: Model, x, q, dt, lin_compliance,
                     ang_compliance, control):
        """Positional + angular joint corrections, Jacobi over all joints.

        Returns (dx (B,3), dtheta (B,3), nconstraints (B,)).
        """
        st = self.st
        B = model.body_count
        dtype = x.dtype
        J = st.joint_count
        dx = jnp.zeros((B, 3), dtype=dtype)
        dth = jnp.zeros((B, 3), dtype=dtype)
        ncon = jnp.zeros((B,), dtype=dtype)
        if J == 0:
            return dx, dth, ncon

        parent = self.j_parent
        child = self.j_child
        hasp = jnp.asarray(self.j_has_parent)[:, None]
        identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)

        # body origin poses from (x_com, q)
        p_origin = x - quat_rotate(q, model.body_com)
        body_pose = jnp.concatenate([p_origin, q], axis=-1)

        X_wp = jnp.where(hasp, body_pose[parent], identity)
        X_pj = transform_multiply(X_wp, model.joint_X_p)
        X_cj = transform_multiply(body_pose[child], model.joint_X_c)

        inv_m = model.body_inv_mass
        Iinv = self._inv_inertia_world(model, q)
        im_p = jnp.where(hasp[:, 0], inv_m[parent], 0.0)
        im_c = inv_m[child]
        Iinv_p = jnp.where(hasp[:, :, None], Iinv[parent], 0.0)
        Iinv_c = Iinv[child]

        free = jnp.asarray(self.is_free)[:, None]

        # ---------------- positional constraint ----------------
        e = X_cj[:, 0:3] - X_pj[:, 0:3]
        # prismatic: allow motion along the world axis within limits
        axis_w = quat_rotate(X_pj[:, 3:7], model.joint_axis[self.dof0])
        pris = jnp.asarray(self.is_pris)[:, None]
        s_along = jnp.sum(e * axis_w, axis=-1)
        lo = model.joint_limit_lower[self.dof0]
        hi = model.joint_limit_upper[self.dof0]
        s_clamped = jnp.clip(s_along, lo, hi)
        e_pris = e - axis_w * s_along[:, None] + axis_w * (s_along - s_clamped)[:, None]
        e = jnp.where(pris, e_pris, e)
        e = jnp.where(free, 0.0, e)
        if self.has_cables:  # cables use compliant split constraints below
            e = jnp.where(jnp.asarray(self.is_cable)[:, None], 0.0, e)

        c = safe_norm(e)
        n = safe_normalize(e)
        r_p = X_pj[:, 0:3] - jnp.where(hasp, x[parent], 0.0)
        r_c = X_cj[:, 0:3] - x[child]
        rpn = jnp.cross(r_p, n)
        rcn = jnp.cross(r_c, n)
        w_p = im_p + jnp.einsum("jc,jcd,jd->j", rpn, Iinv_p, rpn)
        w_c = im_c + jnp.einsum("jc,jcd,jd->j", rcn, Iinv_c, rcn)
        alpha = lin_compliance / (dt * dt)
        dlam = c / jnp.maximum(w_p + w_c + alpha, 1e-9)
        imp = n * dlam[:, None]                               # push child -> parent anchor
        active = (c > 1e-9)
        imp = imp * active[:, None]

        dx = dx.at[child].add(-imp * im_c[:, None])
        dth = dth.at[child].add(-jnp.einsum("jcd,jd->jc", Iinv_c, jnp.cross(r_c, imp)))
        dx = dx.at[parent].add(imp * im_p[:, None])
        dth = dth.at[parent].add(jnp.einsum("jcd,jd->jc", Iinv_p, jnp.cross(r_p, imp)))
        ncon = ncon.at[child].add(active.astype(dtype))
        ncon = ncon.at[parent].add((active & self.j_has_parent).astype(dtype))

        # ---------------- angular constraints ----------------
        # total angular error vector (world) the child must rotate by -dO
        q_rel = quat_mul(quat_conjugate(X_pj[:, 3:7]), X_cj[:, 3:7])
        q_rel = jnp.where(q_rel[:, 3:4] < 0, -q_rel, q_rel)
        lock = jnp.asarray(self.lock_rot)[:, None]
        # full lock: dO = 2 * vec(q_rel) in parent-anchor frame -> world
        dO_lock = quat_rotate(X_pj[:, 3:7], 2.0 * q_rel[:, 0:3])
        # revolute: align axes + limits about the axis
        rev = jnp.asarray(self.is_rev)[:, None]
        a_p = axis_w
        a_c = quat_rotate(X_cj[:, 3:7], model.joint_axis[self.dof0])
        dO_align = jnp.cross(a_p, a_c)
        # revolute joint limits: twist angle about axis
        twist = 2.0 * jnp.arctan2(jnp.sum(q_rel[:, 0:3] * model.joint_axis[self.dof0],
                                          axis=-1), q_rel[:, 3])
        t_clamped = jnp.clip(twist, lo, hi)
        dO_limit = a_p * (twist - t_clamped)[:, None]
        dO = jnp.where(lock, dO_lock,
                       jnp.where(rev, dO_align + dO_limit, 0.0))

        th = safe_norm(dO)
        n_a = safe_normalize(dO)
        wa_p = jnp.einsum("jc,jcd,jd->j", n_a, Iinv_p, n_a)
        wa_c = jnp.einsum("jc,jcd,jd->j", n_a, Iinv_c, n_a)
        alpha_a = ang_compliance / (dt * dt)
        dlam_a = th / jnp.maximum(wa_p + wa_c + alpha_a, 1e-9)
        imp_a = n_a * dlam_a[:, None]
        active_a = th > 1e-9
        imp_a = imp_a * active_a[:, None]
        dth = dth.at[child].add(-jnp.einsum("jcd,jd->jc", Iinv_c, imp_a))
        dth = dth.at[parent].add(jnp.einsum("jcd,jd->jc", Iinv_p, imp_a)
                                 * hasp)
        ncon = ncon.at[child].add(active_a.astype(dtype))
        ncon = ncon.at[parent].add((active_a & self.j_has_parent).astype(dtype))

        # ---------------- cable (Cosserat) constraints ----------------
        # split stretch/shear (linear) + bend/twist (angular) compliant
        # constraints with the parent-anchor local +Z as material tangent
        # (reference: builder.py:5166 add_joint_cable semantics,
        # vbd/rigid_vbd_kernels.py:421 bend/twist measure)
        if self.has_cables:
            cab = jnp.asarray(self.is_cable)
            ke6 = model.joint_target_ke[jnp.asarray(self.cable_dof)]  # (J, 6)
            z_l = jnp.zeros((3,), dtype=dtype).at[2].set(1.0)
            t_p = quat_rotate(X_pj[:, 3:7], jnp.broadcast_to(z_l, (J, 3)))
            t_c = quat_rotate(X_cj[:, 3:7], jnp.broadcast_to(z_l, (J, 3)))
            e_full = X_cj[:, 0:3] - X_pj[:, 0:3]
            s_ax = jnp.sum(e_full * t_p, axis=-1)
            e_ax = t_p * s_ax[:, None]
            e_sh = e_full - e_ax

            def lin_c(e_vec, ke, mask):
                nonlocal dx, dth, ncon
                c_ = safe_norm(e_vec)
                n_ = safe_normalize(e_vec)
                rpn_ = jnp.cross(r_p, n_)
                rcn_ = jnp.cross(r_c, n_)
                wp_ = im_p + jnp.einsum("jc,jcd,jd->j", rpn_, Iinv_p, rpn_)
                wc_ = im_c + jnp.einsum("jc,jcd,jd->j", rcn_, Iinv_c, rcn_)
                al_ = 1.0 / jnp.maximum(ke, 1e-12) / (dt * dt)
                dl_ = c_ / jnp.maximum(wp_ + wc_ + al_, 1e-9)
                act = mask & (c_ > 1e-9) & (ke > 0)
                im_ = n_ * (dl_ * act)[:, None]
                dx = dx.at[child].add(-im_ * im_c[:, None])
                dth = dth.at[child].add(
                    -jnp.einsum("jcd,jd->jc", Iinv_c, jnp.cross(r_c, im_)))
                dx = dx.at[parent].add(im_ * im_p[:, None])
                dth = dth.at[parent].add(
                    jnp.einsum("jcd,jd->jc", Iinv_p, jnp.cross(r_p, im_)))
                ncon = ncon.at[child].add(act.astype(dtype))
                ncon = ncon.at[parent].add(
                    (act & jnp.asarray(self.j_has_parent)).astype(dtype))

            def ang_c(dO_vec, ke, mask):
                nonlocal dth, ncon
                th_ = safe_norm(dO_vec)
                n_ = safe_normalize(dO_vec)
                wp_ = jnp.einsum("jc,jcd,jd->j", n_, Iinv_p, n_)
                wc_ = jnp.einsum("jc,jcd,jd->j", n_, Iinv_c, n_)
                al_ = 1.0 / jnp.maximum(ke, 1e-12) / (dt * dt)
                dl_ = th_ / jnp.maximum(wp_ + wc_ + al_, 1e-9)
                act = mask & (th_ > 1e-9) & (ke > 0)
                im_ = n_ * (dl_ * act)[:, None]
                dth = dth.at[child].add(-jnp.einsum("jcd,jd->jc", Iinv_c, im_))
                dth = dth.at[parent].add(
                    jnp.einsum("jcd,jd->jc", Iinv_p, im_)
                    * jnp.asarray(self.j_has_parent)[:, None])
                ncon = ncon.at[child].add(act.astype(dtype))
                ncon = ncon.at[parent].add(
                    (act & jnp.asarray(self.j_has_parent)).astype(dtype))

            lin_c(e_ax, ke6[:, 2], cab)       # stretch along tangent
            lin_c(e_sh, ke6[:, 0], cab)       # transverse shear
            ang_c(jnp.cross(t_p, t_c), ke6[:, 3], cab)   # bend: align tangents
            # twist about the tangent from the swing-twist decomposition
            tw = 2.0 * jnp.arctan2(q_rel[:, 2], q_rel[:, 3])
            t_mid = safe_normalize(t_p + t_c)
            ang_c(t_mid * tw[:, None], ke6[:, 5], cab)

        # position/velocity target drives (compliance = 1/ke) about the axis
        if control is not None:
            ke = model.joint_target_ke[self.dof0]
            has_drive = (self.is_rev | self.is_pris)
            tq = control.joint_target_q[self.coord0]
            # revolute drive: rotate about axis toward target angle
            drive_err_rot = a_p * (twist - tq)[:, None]
            alpha_d = 1.0 / jnp.maximum(ke, 1e-9) / (dt * dt)
            wd = wa_p + wa_c
            dlam_d = jnp.where(jnp.asarray(has_drive) & (ke > 0),
                               safe_norm(drive_err_rot)
                               / jnp.maximum(wd + alpha_d, 1e-9), 0.0)
            nd = safe_normalize(drive_err_rot)
            imp_d = nd * dlam_d[:, None] * jnp.asarray(self.is_rev)[:, None]
            dth = dth.at[child].add(-jnp.einsum("jcd,jd->jc", Iinv_c, imp_d))
            dth = dth.at[parent].add(jnp.einsum("jcd,jd->jc", Iinv_p, imp_d) * hasp)
            # prismatic drive: translate along axis toward target
            drive_err_lin = a_p * (s_along - tq)[:, None]
            wdp = w_p + w_c
            dlam_p = jnp.where(jnp.asarray(self.is_pris) & (ke > 0),
                               safe_norm(drive_err_lin)
                               / jnp.maximum(wdp + alpha_d, 1e-9), 0.0)
            ndp = safe_normalize(drive_err_lin)
            imp_p2 = ndp * dlam_p[:, None]
            dx = dx.at[child].add(-imp_p2 * im_c[:, None])
            dx = dx.at[parent].add(imp_p2 * im_p[:, None])

        return dx, dth, ncon

    # ------------------------------------------------------------------
    def cable_velocity_pass(self, model: Model, x, q, v, w, dt):
        """Implicit per-dof-group cable damping (stretch/shear/bend/twist
        ``joint_target_kd`` slots), applied to the reconstructed velocities
        (reference: add_joint_cable damping semantics)."""
        st = self.st
        J = st.joint_count
        dtype = x.dtype
        B = model.body_count
        cab = jnp.asarray(self.is_cable)
        kd6 = model.joint_target_kd[jnp.asarray(self.cable_dof)]  # (J, 6)
        parent, child = self.j_parent, self.j_child
        hasp = jnp.asarray(self.j_has_parent)
        identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
        p_origin = x - quat_rotate(q, model.body_com)
        body_pose = jnp.concatenate([p_origin, q], axis=-1)
        X_wp = jnp.where(hasp[:, None], body_pose[parent], identity)
        X_pj = transform_multiply(X_wp, model.joint_X_p)
        X_cj = transform_multiply(body_pose[child], model.joint_X_c)
        z_l = jnp.zeros((3,), dtype=dtype).at[2].set(1.0)
        t_p = quat_rotate(X_pj[:, 3:7], jnp.broadcast_to(z_l, (J, 3)))

        r_p = X_pj[:, 0:3] - x[parent]
        r_c = X_cj[:, 0:3] - x[child]
        v_p = jnp.where(hasp[:, None],
                        v[parent] + jnp.cross(w[parent], r_p), 0.0)
        v_c = v[child] + jnp.cross(w[child], r_c)
        v_rel = v_c - v_p
        w_rel = w[child] - jnp.where(hasp[:, None], w[parent], 0.0)

        inv_m = model.body_inv_mass
        Iinv = self._inv_inertia_world(model, q)
        im_p = jnp.where(hasp, inv_m[parent], 0.0)
        im_c = inv_m[child]
        Iinv_p = jnp.where(hasp[:, None, None], Iinv[parent], 0.0)
        Iinv_c = Iinv[child]

        dv = jnp.zeros((B, 3), dtype=dtype)
        dw = jnp.zeros((B, 3), dtype=dtype)

        def lin_d(v_vec, kd):
            nonlocal dv, dw
            c_ = safe_norm(v_vec)
            n_ = safe_normalize(v_vec)
            rpn_ = jnp.cross(r_p, n_)
            rcn_ = jnp.cross(r_c, n_)
            wg_ = (im_p + jnp.einsum("jc,jcd,jd->j", rpn_, Iinv_p, rpn_)
                   + im_c + jnp.einsum("jc,jcd,jd->j", rcn_, Iinv_c, rcn_))
            g_ = kd * dt
            lam = g_ * c_ / jnp.maximum(1.0 + g_ * wg_, 1e-9)
            act = cab & (kd > 0)
            imp = -n_ * (lam * act)[:, None]
            dv = dv.at[child].add(imp * im_c[:, None])
            dw = dw.at[child].add(
                jnp.einsum("jcd,jd->jc", Iinv_c, jnp.cross(r_c, imp)))
            dv = dv.at[parent].add(-imp * im_p[:, None])
            dw = dw.at[parent].add(
                -jnp.einsum("jcd,jd->jc", Iinv_p, jnp.cross(r_p, imp)))

        def ang_d(w_vec, kd):
            nonlocal dw
            c_ = safe_norm(w_vec)
            n_ = safe_normalize(w_vec)
            wg_ = (jnp.einsum("jc,jcd,jd->j", n_, Iinv_p, n_)
                   + jnp.einsum("jc,jcd,jd->j", n_, Iinv_c, n_))
            g_ = kd * dt
            lam = g_ * c_ / jnp.maximum(1.0 + g_ * wg_, 1e-9)
            act = cab & (kd > 0)
            imp = -n_ * (lam * act)[:, None]
            dw = dw.at[child].add(jnp.einsum("jcd,jd->jc", Iinv_c, imp))
            dw = dw.at[parent].add(
                -jnp.einsum("jcd,jd->jc", Iinv_p, imp)
                * hasp[:, None])

        v_ax = t_p * jnp.sum(v_rel * t_p, axis=-1)[:, None]
        lin_d(v_ax, kd6[:, 2])            # stretch damping
        lin_d(v_rel - v_ax, kd6[:, 0])    # shear damping
        w_ax = t_p * jnp.sum(w_rel * t_p, axis=-1)[:, None]
        ang_d(w_ax, kd6[:, 5])            # twist damping
        ang_d(w_rel - w_ax, kd6[:, 3])    # bend damping

        dyn = (inv_m > 0)[:, None]
        return v + dv * dyn, w + dw * dyn

    # ------------------------------------------------------------------
    def contact_bodies(self, contacts: Contacts):
        """Per-slot body indices + dynamic masks from the contact buffer's
        shape indices. Works for static-slot AND dynamic-pair pipelines
        (dynamic mode assigns slot->shape per frame, so the static
        slot_body tables cannot be used; reference: runtime broad phase,
        collide.py:1391-1410)."""
        sbody = jnp.asarray(np.asarray(self.st.shape_body))
        s0 = contacts.rigid_contact_shape0
        s1 = contacts.rigid_contact_shape1
        b0r = sbody[jnp.maximum(s0, 0)]
        b1r = sbody[jnp.maximum(s1, 0)]
        dyn0 = (s0 >= 0) & (b0r >= 0)
        dyn1 = (s1 >= 0) & (b1r >= 0)
        return (jnp.where(dyn0, b0r, 0), jnp.where(dyn1, b1r, 0),
                dyn0, dyn1)

    def contact_local_anchors(self, model: Model, state_in: State,
                              contacts: Contacts):
        """Contact surface points in collide-time body-local frames.

        Returns (l0, l1): local offsets from each body's COM such that the
        world anchors track the bodies as they move during the solve."""
        b0, b1, dyn0v, dyn1v = self.contact_bodies(contacts)
        x_in = state_in.body_q[:, 0:3] + quat_rotate(
            state_in.body_q[:, 3:7], model.body_com)
        q_in = state_in.body_q[:, 3:7]
        n = contacts.rigid_contact_normal
        p = contacts.rigid_contact_position
        d = contacts.rigid_contact_depth[:, None]
        p0 = p + n * (0.5 * d)        # shape0's deepest point (into shape1)
        p1 = p - n * (0.5 * d)        # shape1's deepest point (into shape0)
        # static shapes (body < 0) keep world-fixed anchors: store the world
        # point itself (decoded by the matching where() in solve)
        dyn0 = dyn0v[:, None]
        dyn1 = dyn1v[:, None]
        l0 = jnp.where(dyn0, quat_rotate_inv(q_in[b0], p0 - x_in[b0]), p0)
        l1 = jnp.where(dyn1, quat_rotate_inv(q_in[b1], p1 - x_in[b1]), p1)
        return l0, l1

    def solve_rigid_contacts(self, model: Model, x, q, contacts: Contacts,
                             anchors, lam_n, dt, max_depen_vel=3.0,
                             gamma_relax=1.0, denom_prev=None):
        """Non-penetration positional corrections for all contact slots.

        Penetration is re-evaluated at current poses from the collide-time
        local anchors: C = (a1 - a0) . n with separation positive."""
        st = self.st
        B = model.body_count
        dtype = x.dtype
        b0, b1, dyn0, dyn1 = self.contact_bodies(contacts)

        inv_m = model.body_inv_mass
        Iinv = self._inv_inertia_world(model, q)
        im0 = jnp.where(dyn0, inv_m[b0], 0.0)
        im1 = jnp.where(dyn1, inv_m[b1], 0.0)
        I0 = jnp.where(dyn0[:, None, None], Iinv[b0], 0.0)
        I1 = jnp.where(dyn1[:, None, None], Iinv[b1], 0.0)

        n = contacts.rigid_contact_normal                     # 0 -> 1
        l0, l1 = anchors
        a0 = jnp.where(dyn0[:, None], x[b0] + quat_rotate(q[b0], l0), l0)
        a1 = jnp.where(dyn1[:, None], x[b1] + quat_rotate(q[b1], l1), l1)
        # current penetration: at collide time (a1 - a0).n == -depth
        depth = -jnp.sum((a1 - a0) * n, axis=-1)
        active = contacts.rigid_contact_mask & (depth > 0.0)
        # rate-limit push-out: deep overlaps resolve over several substeps
        # instead of becoming launch velocity at reconstruction
        depth = jnp.minimum(depth, max_depen_vel * dt)

        r0 = a0 - x[b0]
        r1 = a1 - x[b1]
        r0n = jnp.cross(r0, n)
        r1n = jnp.cross(r1, n)
        w0 = im0 + jnp.einsum("cd,cde,ce->c", r0n, I0, r0n)
        w1 = im1 + jnp.einsum("cd,cde,ce->c", r1n, I1, r1n)
        # hydroelastic pressure-field contacts carry a finite normal
        # stiffness c (N/m, from the integrated patch pressure): solve them
        # as standard XPBD compliant constraints with alpha = 1/c, so the
        # converged state satisfies F = c * penetration — the patch force
        # integral(p dA) (geometry/contact_reduction.py
        # reduce_contact_set_hydro; reference sdf_hydroelastic.py:1521).
        # stiffness 0 = rigid contact, the plain PBD projection below.
        stiff = contacts.rigid_contact_stiffness
        if stiff.shape[0] != depth.shape[0]:
            stiff = jnp.zeros_like(depth)
        # the averaged-Jacobi update applies only gamma_c of each dlam to
        # the positions (relaxation / per-body constraint count), so the
        # realized constraint-space correction per unit lambda is
        # gamma_c * (w0 + w1), not (w0 + w1). Scale the compliance term by
        # gamma_c so the REALIZED force converges to c * depth exactly:
        # fixed point depth = alpha' * lam with alpha' = gamma_c * alpha
        # gives realized force gamma_c * lam / dt^2 = c * depth.
        if denom_prev is not None and denom_prev.shape[0]:
            d0 = jnp.maximum(denom_prev[b0], 1.0)
            d1 = jnp.maximum(denom_prev[b1], 1.0)
        else:
            d0 = d1 = jnp.ones_like(im0)
        gamma_c = gamma_relax * jnp.where(
            w0 + w1 > 0.0,
            (w0 / d0 + w1 / d1) / jnp.maximum(w0 + w1, 1e-12), 1.0)
        stiff_safe = jnp.where(stiff > 0.0, stiff, 1.0)
        alpha_t = jnp.where(stiff > 0.0,
                            gamma_c / (stiff_safe * dt * dt), 0.0)
        dlam = jnp.where(active,
                         (depth - alpha_t * lam_n)
                         / jnp.maximum(w0 + w1 + alpha_t, 1e-9), 0.0)
        # compliant contacts may not pull (the pad pushes only): clamp the
        # accumulated impulse at zero instead of letting a negative residual
        # turn the patch adhesive
        dlam = jnp.maximum(dlam, -lam_n)
        lam_n = lam_n + dlam
        # n points from shape0 toward shape1: separate by moving body1 +n,
        # body0 -n
        imp = n * dlam[:, None]

        # positional (static) friction: cancel tangential drift of the anchor
        # pair accumulated during the solve, limited to the mu*lam_n cone
        # (reference xpbd rigid friction kernels; Macklin et al. XPBD rigids)
        s0m = jnp.maximum(contacts.rigid_contact_shape0, 0)
        s1m = jnp.maximum(contacts.rigid_contact_shape1, 0)
        mu = 0.5 * (model.shape_material_mu[s0m] + model.shape_material_mu[s1m])
        t_err = (a1 - a0)
        t_err = t_err - n * jnp.sum(t_err * n, axis=-1, keepdims=True)
        t_len = safe_norm(t_err)
        t_dir = safe_normalize(t_err)
        r0t = jnp.cross(r0, t_dir)
        r1t = jnp.cross(r1, t_dir)
        w0t = im0 + jnp.einsum("cd,cde,ce->c", r0t, I0, r0t)
        w1t = im1 + jnp.einsum("cd,cde,ce->c", r1t, I1, r1t)
        dlam_t = jnp.where(active & (t_len > 1e-9),
                           t_len / jnp.maximum(w0t + w1t, 1e-9), 0.0)
        dlam_t = jnp.minimum(dlam_t, mu * lam_n)
        # tangential error is a1 - a0: reduce it by moving body1 -t, body0 +t
        imp_t = -t_dir * dlam_t[:, None]
        imp = imp + imp_t

        seg = jnp.concatenate([b1, b0])
        dx = _segment_add(jnp.concatenate([imp * im1[:, None] * dyn1[:, None],
                                           -imp * im0[:, None] * dyn0[:, None]], axis=0),
                          seg, B)
        tor1 = jnp.einsum("cde,ce->cd", I1, jnp.cross(r1, imp)) * dyn1[:, None]
        tor0 = -jnp.einsum("cde,ce->cd", I0, jnp.cross(r0, imp)) * dyn0[:, None]
        dth = _segment_add(jnp.concatenate([tor1, tor0], axis=0), seg, B)
        act_f = active.astype(dtype)
        ncon = _segment_add(jnp.concatenate([act_f * dyn1, act_f * dyn0]),
                            seg, B)
        return dx, dth, ncon, lam_n

    # ------------------------------------------------------------------
    def velocity_pass(self, model: Model, x, q, v, w, state_in: State,
                      contacts: Contacts, lam_n, dt, enable_restitution,
                      dahl_f=None, dahl_sigma=0.0):
        """Velocity-level friction + restitution at contacts
        (reference solver_xpbd.py velocity update / restitution kernels).
        With ``dahl_f`` (C, 3) the tangential force comes from the Dahl
        bristle state instead of memoryless Coulomb; returns the updated
        state as the third output (None in Coulomb mode)."""
        st = self.st
        B = model.body_count
        dtype = v.dtype
        b0, b1, dyn0, dyn1 = self.contact_bodies(contacts)
        s0 = jnp.maximum(contacts.rigid_contact_shape0, 0)
        s1 = jnp.maximum(contacts.rigid_contact_shape1, 0)

        inv_m = model.body_inv_mass
        Iinv = self._inv_inertia_world(model, q)
        im0 = jnp.where(dyn0, inv_m[b0], 0.0)
        im1 = jnp.where(dyn1, inv_m[b1], 0.0)
        I0 = jnp.where(dyn0[:, None, None], Iinv[b0], 0.0)
        I1 = jnp.where(dyn1[:, None, None], Iinv[b1], 0.0)

        n = contacts.rigid_contact_normal
        p = contacts.rigid_contact_position
        active = contacts.rigid_contact_mask & (lam_n > 0.0)

        r0 = p - x[b0]
        r1 = p - x[b1]
        v0 = jnp.where(dyn0[:, None], v[b0] + jnp.cross(w[b0], r0), 0.0)
        v1 = jnp.where(dyn1[:, None], v[b1] + jnp.cross(w[b1], r1), 0.0)
        v_rel = v1 - v0
        vn = jnp.sum(v_rel * n, axis=-1)
        vt = v_rel - n * vn[:, None]
        vt_norm = safe_norm(vt)

        # generalized masses along n and t
        t_dir = safe_normalize(vt)
        r0t = jnp.cross(r0, t_dir)
        r1t = jnp.cross(r1, t_dir)
        w_t = (im0 + jnp.einsum("cd,cde,ce->c", r0t, I0, r0t)
               + im1 + jnp.einsum("cd,cde,ce->c", r1t, I1, r1t))
        r0n = jnp.cross(r0, n)
        r1n = jnp.cross(r1, n)
        w_n = (im0 + jnp.einsum("cd,cde,ce->c", r0n, I0, r0n)
               + im1 + jnp.einsum("cd,cde,ce->c", r1n, I1, r1n))

        mu = 0.5 * (model.shape_material_mu[s0] + model.shape_material_mu[s1])
        dahl_new = None
        if dahl_f is not None:
            # Dahl bristle friction: integrate df/dx = sigma (1 - f.t̂/f_c)
            # over this step's slip, clamp to the friction cone, and apply
            # the bristle force as an impulse (hysteresis memory lives in
            # the returned state)
            f_c = mu * lam_n / dt                     # normal force ~ lam/dt
            slip = vt_norm * dt
            f_par = jnp.sum(dahl_f * t_dir, axis=-1)
            df = dahl_sigma * slip * (1.0 - f_par / jnp.maximum(f_c, 1e-9))
            f_new = dahl_f + t_dir * df[:, None]
            f_mag = safe_norm(f_new)
            f_new = f_new * (jnp.minimum(f_mag, f_c)
                             / jnp.maximum(f_mag, 1e-9))[:, None]
            f_new = jnp.where(active[:, None], f_new, 0.0)
            # impulse opposing the bristle force, capped so it cannot
            # reverse the slip within the step
            imp_mag = jnp.minimum(safe_norm(f_new) * dt,
                                  vt_norm / jnp.maximum(w_t, 1e-9))
            imp_t = -safe_normalize(f_new) * jnp.where(
                active, imp_mag, 0.0)[:, None]
            dahl_new = f_new
        else:
            # dynamic friction: |dv_t| <= mu * lam_n / dt (impulse-consistent)
            dv_t_mag = jnp.minimum(vt_norm,
                                   mu * lam_n / dt * jnp.maximum(w_t, 1e-9))
            imp_t = -t_dir * jnp.where(active & (vt_norm > 1e-9),
                                       dv_t_mag
                                       / jnp.maximum(w_t, 1e-9), 0.0)[:, None]

        # velocity stop + restitution against the pre-step normal velocity
        # (reference xpbd/kernels.py:2578 apply_rigid_restitution, Eq. 29-34):
        # for every contact that was APPROACHING before the step (including
        # resting contacts, which approach by g*dt), cancel the post-solve
        # normal velocity and replace it with -e * vn_old. This is what
        # prevents the depenetration launch — velocity gained from the
        # positional pushout of deep overlaps is removed every substep, so
        # bodies creep apart at the position rate instead of being fired.
        imp_total = imp_t
        if enable_restitution:
            import numpy as _np
            x_in = state_in.body_q[:, 0:3] + quat_rotate(
                state_in.body_q[:, 3:7], model.body_com)
            r0_in = p - x_in[b0]
            r1_in = p - x_in[b1]
            w_idx = _np.maximum(st.body_world, 0) if B else _np.zeros(0, int)
            g_dt = model.gravity[w_idx] * dt                  # (B, 3)
            v0_in = jnp.where(dyn0[:, None],
                              state_in.body_qd[:, 0:3][b0] + g_dt[b0]
                              + jnp.cross(state_in.body_qd[:, 3:6][b0], r0_in), 0.0)
            v1_in = jnp.where(dyn1[:, None],
                              state_in.body_qd[:, 0:3][b1] + g_dt[b1]
                              + jnp.cross(state_in.body_qd[:, 3:6][b1], r1_in), 0.0)
            vn_old = jnp.sum((v1_in - v0_in) * n, axis=-1)
            e = 0.5 * (model.shape_material_restitution[s0]
                       + model.shape_material_restitution[s1])
            vn_target = jnp.maximum(-e * vn_old, 0.0)
            # compliant (hydroelastic) slots participate in the velocity
            # stop too: compliant in POSITION, inelastic in VELOCITY
            # (unless restitution > 0). The equilibrium penetration is set
            # by the positional compliant solve, so statics stay exact —
            # zeroing the approach velocity each substep just removes the
            # undamped spring ringing (the pad otherwise oscillates
            # forever: XPBD compliance carries no dissipation).
            stiff_va = contacts.rigid_contact_stiffness
            if stiff_va.shape[0] != vn_old.shape[0]:
                stiff_va = jnp.zeros_like(vn_old)
            rest_active = active & (vn_old < 0.0)
            # depenetration-bias removal: separating velocity gained from
            # resolving penetration that ALREADY existed at substep start
            # (collide-time depth d0) is positional bias, not physics —
            # remove it up to d0/dt. New overlaps (d0 ~ 0) keep their
            # reconstructed velocity (the implicit contact impulse).
            # Between two dynamic bodies vn_old cancels the g*dt kick, so
            # the approaching-contact stop above never fires there; this
            # term is what prevents a deep-overlap init from firing bodies
            # apart at metres per second.
            d0 = jnp.maximum(contacts.rigid_contact_depth, 0.0)
            excess = jnp.clip(vn - jnp.maximum(vn_old, 0.0), 0.0, d0 / dt)
            bias_active = active & (excess > 0.0) & (stiff_va <= 0.0)
            dvn = jnp.where(rest_active, vn_target - vn,
                            jnp.where(bias_active, -excess, 0.0))
            rest_active = rest_active | bias_active
            imp_n = n * (dvn / jnp.maximum(w_n, 1e-9))[:, None]
            imp_n = jnp.where(rest_active[:, None], imp_n, 0.0)

        seg = jnp.concatenate([b1, b0])
        # Jacobi averaging: each slot's impulse was sized to cancel the
        # full relative velocity at that slot; summing N same-manifold
        # slots un-averaged over-applies N-fold (a flat 9-slot landing
        # LAUNCHED the body upward at ~3x impact speed). Divide by each
        # body's active-slot count like the positional solve does.
        act_f = active.astype(dtype)
        cnt = _segment_add(jnp.concatenate([act_f * dyn1, act_f * dyn0]),
                           seg, B)
        div = jnp.maximum(jnp.maximum(cnt[b1] * dyn1, cnt[b0] * dyn0), 1.0)
        imp_total = imp_total / div[:, None]
        if enable_restitution:
            rest_f = rest_active.astype(dtype)
            cnt_r = _segment_add(
                jnp.concatenate([rest_f * dyn1, rest_f * dyn0]), seg, B)
            div_r = jnp.maximum(jnp.maximum(cnt_r[b1] * dyn1,
                                            cnt_r[b0] * dyn0), 1.0)
            imp_total = imp_total + imp_n / div_r[:, None]
        dv = _segment_add(
            jnp.concatenate([imp_total * im1[:, None] * dyn1[:, None],
                             -imp_total * im0[:, None] * dyn0[:, None]], axis=0),
            seg, B)
        tor1 = jnp.einsum("cde,ce->cd", I1, jnp.cross(r1, imp_total)) * dyn1[:, None]
        tor0 = -jnp.einsum("cde,ce->cd", I0, jnp.cross(r0, imp_total)) * dyn0[:, None]
        dw = _segment_add(jnp.concatenate([tor1, tor0], axis=0), seg, B)
        return v + dv, w + dw, dahl_new

    # ------------------------------------------------------------------
    def solve_particles(self, model: Model, px, px_prev,
                        contacts: Optional[Contacts], dt, nbr=None,
                        soft_surf_disp=None):
        """Distance/volume constraints + particle-shape contacts (Jacobi)."""
        st = self.st
        N = model.particle_count
        dtype = px.dtype
        dx = jnp.zeros((N, 3), dtype=dtype)
        inv_m = model.particle_inv_mass

        def add_distance(dx, i, j, rest, compliance):
            d = px[j] - px[i]
            dist = safe_norm(d)
            n = safe_normalize(d)
            c = dist - rest
            wsum = inv_m[i] + inv_m[j]
            dlam = c / jnp.maximum(wsum + compliance / (dt * dt), 1e-9)
            imp = n * dlam[:, None]
            dx = dx.at[i].add(imp * inv_m[i][:, None])
            dx = dx.at[j].add(-imp * inv_m[j][:, None])
            return dx

        if model.structure.spring_count:
            si = np.asarray(model.spring_indices)     # static topology
            ke = model.spring_stiffness
            compliance = 1.0 / jnp.maximum(ke, 1e-9)
            dx = add_distance(dx, si[:, 0], si[:, 1],
                              model.spring_rest_length, compliance)
        if model.structure.tri_count:
            ti = np.asarray(model.tri_indices)
            # membrane approximated by edge-distance constraints (v1; the
            # dedicated cloth solvers implement full FEM, reference kernels.py)
            p0, p1, p2 = px[ti[:, 0]], px[ti[:, 1]], px[ti[:, 2]]
            ke = model.tri_materials[:, 0]
            compliance = 1.0 / jnp.maximum(ke, 1e-9)
            rest01 = jnp.linalg.norm(
                model.particle_q[ti[:, 1]] - model.particle_q[ti[:, 0]], axis=-1)
            rest12 = jnp.linalg.norm(
                model.particle_q[ti[:, 2]] - model.particle_q[ti[:, 1]], axis=-1)
            rest20 = jnp.linalg.norm(
                model.particle_q[ti[:, 0]] - model.particle_q[ti[:, 2]], axis=-1)
            dx = add_distance(dx, ti[:, 0], ti[:, 1], rest01, compliance)
            dx = add_distance(dx, ti[:, 1], ti[:, 2], rest12, compliance)
            dx = add_distance(dx, ti[:, 2], ti[:, 0], rest20, compliance)
        if model.structure.tet_count:
            tt = np.asarray(model.tet_indices)
            # volume conservation constraint per tet
            a, b, c_, d_ = tt[:, 0], tt[:, 1], tt[:, 2], tt[:, 3]
            p0, p1, p2, p3 = px[a], px[b], px[c_], px[d_]
            vol = jnp.einsum("tc,tc->t", jnp.cross(p1 - p0, p2 - p0), p3 - p0) / 6.0
            q0 = model.particle_q
            vol0 = jnp.einsum("tc,tc->t", jnp.cross(q0[b] - q0[a], q0[c_] - q0[a]),
                              q0[d_] - q0[a]) / 6.0
            g1 = jnp.cross(p2 - p0, p3 - p0) / 6.0
            g2 = jnp.cross(p3 - p0, p1 - p0) / 6.0
            g3 = jnp.cross(p1 - p0, p2 - p0) / 6.0
            g0 = -(g1 + g2 + g3)
            c = vol - vol0
            wsum = (inv_m[a] * jnp.sum(g0 * g0, -1) + inv_m[b] * jnp.sum(g1 * g1, -1)
                    + inv_m[c_] * jnp.sum(g2 * g2, -1) + inv_m[d_] * jnp.sum(g3 * g3, -1))
            k_lambda = model.tet_materials[:, 1]
            compliance = 1.0 / jnp.maximum(k_lambda, 1e-9) / (dt * dt)
            dlam = -c / jnp.maximum(wsum + compliance, 1e-9)
            dx = dx.at[a].add(g0 * (dlam * inv_m[a])[:, None])
            dx = dx.at[b].add(g1 * (dlam * inv_m[b])[:, None])
            dx = dx.at[c_].add(g2 * (dlam * inv_m[c_])[:, None])
            dx = dx.at[d_].add(g3 * (dlam * inv_m[d_])[:, None])
            # edge distance regularization for shear stiffness
            k_mu = model.tet_materials[:, 0]
            comp_mu = 1.0 / jnp.maximum(k_mu, 1e-9)
            for (u, w_) in ((a, b), (a, c_), (a, d_), (b, c_), (b, d_), (c_, d_)):
                rest = jnp.linalg.norm(q0[w_] - q0[u], axis=-1)
                dx = add_distance(dx, u, w_, rest, comp_mu)

        # contact corrections accumulate separately so they are averaged by
        # the number of ACTIVE contacts, not by the structural constraint
        # degree — dividing a contact push by a tet particle's ~25
        # structural constraints made dense soft bodies tunnel through cloth
        dxc = jnp.zeros((N, 3), dtype=dtype)
        ncon = jnp.zeros((N,), dtype=dtype)

        # particle-particle non-penetration (Jacobi over neighbor candidates)
        if nbr is not None:
            idx, nmask = nbr
            d = px[idx] - px[:, None, :]                  # (N, M, 3)
            dist = safe_norm(d)
            nrm = safe_normalize(d)
            overlap = (model.particle_radius[:, None]
                       + model.particle_radius[idx] - dist)
            act = nmask & (overlap > 0)
            wsum = inv_m[:, None] + inv_m[idx]
            dlam = jnp.where(act, overlap / jnp.maximum(wsum, 1e-9), 0.0)
            # each particle accumulates only its own side (Jacobi symmetric)
            dxc = dxc - jnp.sum(nrm * (dlam * inv_m[:, None])[..., None], axis=1)
            ncon = ncon + jnp.sum(act.astype(dtype), axis=1)

        # soft particle-shape contacts: linearized depth at the current
        # particle position (contact frame frozen within the substep)
        if contacts is not None and contacts.soft_contact_max:
            pi = contacts.soft_contact_particle
            n = contacts.soft_contact_normal              # outward from shape
            depth0 = contacts.soft_contact_depth
            radius = model.particle_radius[pi]
            # particle position when the contact was generated
            p_then = contacts.soft_contact_position + n * (radius - depth0)[:, None]
            c = depth0 - jnp.sum((px[pi] - p_then) * n, axis=-1)
            act = contacts.soft_contact_mask & (c > 0)
            # one-sided constraint against the shape: the full positional
            # correction goes to the particle (w_p / (w_p + 0) = 1); pinned
            # particles (inv_mass 0) receive nothing
            corr = n * jnp.where(act, c, 0.0)[:, None]
            # position-level Coulomb friction (reference:
            # xpbd/kernels.py solve_particle_shape_contacts): tangential
            # slip over the substep relative to the shape SURFACE motion
            # (soft_surf_disp carries v + w x r of the shape body, so
            # conveyors and rollers drag particles), clamped to mu * c
            s = contacts.soft_contact_shape
            mu = 0.5 * (model.shape_material_mu[jnp.maximum(s, 0)]
                        + model.particle_mu)
            slip = px[pi] - px_prev[pi]
            if soft_surf_disp is not None:
                slip = slip - soft_surf_disp
            slip_t = slip - n * jnp.sum(slip * n, axis=-1, keepdims=True)
            t_len = safe_norm(slip_t)
            f_max = mu * jnp.where(act, c, 0.0)
            corr = corr - slip_t * jnp.minimum(
                1.0, f_max / jnp.maximum(t_len, 1e-9))[:, None]
            dxc = dxc.at[pi].add(corr * (inv_m[pi] > 0)[:, None])
            ncon = ncon.at[pi].add(act.astype(dtype))
        return dx, dxc, ncon
