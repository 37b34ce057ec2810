"""Coupled solver: multi-solver co-simulation over one Model.

TPU-native re-design of reference
newton/_src/solvers/coupled/solver_coupled.py:308 (+ interface.py:110,
model_view.py:60). The reference partitions Model entities into per-solver
ownership lists and couples at shared contacts via ADMM consensus or proxy
bodies; here the partition is by entity *kind* (rigid bodies+joints vs
particles — the partition every reference example actually uses) and the
coupling runs through the shared soft-contact buffer: the particle solver
resolves particle-shape contacts, and the equal-and-opposite reaction
wrenches are applied to the rigid side before its step (one explicit
consensus sweep per substep; iterate substeps for tighter coupling).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..math import quat_rotate
from ..sim.contacts import Contacts
from ..sim.control import Control
from ..sim.model import Model
from ..sim.state import State
from .solver import SolverBase

__all__ = ["SolverCoupled"]


class SolverCoupled(SolverBase):
    """Two-way rigid/particle co-simulation (reference: solver_coupled.py:308).

    Args:
        rigid_solver: steps bodies/joints/rigid contacts (e.g. SolverMuJoCo,
            SolverXPBD).
        particle_solver: steps particles/cloth/soft (e.g. SolverVBD,
            SolverStyle3D, SolverXPBD).
        coupling_ke/kd: penalty gains for the reaction wrench estimate.
    """

    def __init__(self, model: Model, rigid_solver: SolverBase,
                 particle_solver: Optional[SolverBase] = None,
                 coupling_ke: float = 1.0e4, coupling_kd: float = 50.0,
                 consensus_iters: int = 3, rho: float = 0.6,
                 second_rigid_solver: Optional[SolverBase] = None,
                 body_partition=None):
        super().__init__(model)
        self.rigid_solver = rigid_solver
        self.particle_solver = particle_solver
        self.coupling_ke = float(coupling_ke)
        self.coupling_kd = float(coupling_kd)
        # ADMM-style consensus: iterate the dual contact impulse so the
        # post-step relative normal velocity at shared contacts vanishes
        # (reference solver_coupled_admm.py:424 iterates the same consensus;
        # one iteration reproduces the old single penalty sweep)
        self.consensus_iters = int(consensus_iters)
        self.rho = float(rho)

        # arbitrary BODY partitions (reference: per-solver Entry ownership
        # lists, solver_coupled.py:327 + ModelView proxy bodies): with
        # ``body_partition`` (B,) bool, ``rigid_solver`` owns the True
        # bodies and ``second_rigid_solver`` the rest. Each solver steps
        # the full model — the other partition's bodies act as live proxy
        # bodies at their latest poses — and the staggered Gauss-Seidel
        # exchange repeats ``consensus_iters`` times.
        self.second_rigid_solver = second_rigid_solver
        self.body_partition = None
        if body_partition is not None:
            if second_rigid_solver is None:
                raise ValueError("body_partition requires second_rigid_solver")
            bp = np.asarray(body_partition, dtype=bool)
            if bp.shape != (model.body_count,):
                raise ValueError("body_partition must be (body_count,) bool")
            self.body_partition = bp
            st = model.structure
            # joint coords/dofs follow their child body's owner
            jc = np.asarray(st.joint_child)
            own_j = bp[jc] if len(jc) else np.zeros(0, bool)
            qmask = np.zeros(int(st.joint_coord_count), dtype=bool)
            dmask = np.zeros(int(st.joint_dof_count), dtype=bool)
            for j in range(st.joint_count):
                if own_j[j]:
                    qmask[st.joint_q_start[j]:st.joint_q_start[j + 1]] = True
                    dmask[st.joint_qd_start[j]:st.joint_qd_start[j + 1]] = True
            self._part_masks = (bp, qmask, dmask)
        elif particle_solver is None:
            raise ValueError("SolverCoupled needs a particle_solver or a "
                             "body_partition + second_rigid_solver")

    def step(self, state_in: State, state_out: Optional[State] = None,
             control: Optional[Control] = None,
             contacts: Optional[Contacts] = None, dt: float = 1e-3) -> State:
        model = self.model
        if self.body_partition is not None:
            return self._step_partitioned(state_in, control, contacts, dt)
        has_coupling = (contacts is not None and contacts.soft_contact_max
                        and model.body_count)
        if not has_coupling:
            rigid_out = self.rigid_solver.step(state_in, None, control,
                                               contacts, dt)
            particle_out = self.particle_solver.step(state_in, None, control,
                                                     contacts, dt)
            return self._merge(state_in, rigid_out, particle_out, None)

        st = model.structure
        n_soft = contacts.soft_contact_max
        dtype = state_in.body_q.dtype
        lam = jnp.zeros((n_soft,), dtype=dtype)        # dual normal impulse
        residuals = []
        pi = contacts.soft_contact_particle
        si_static = getattr(st, "soft_pairs", np.zeros((0, 2), np.int32))[:, 1]
        body_idx = np.asarray(st.shape_body)[si_static]
        dyn = jnp.asarray(body_idx >= 0)
        b_c = np.maximum(body_idx, 0)
        nrm = contacts.soft_contact_normal
        act = (contacts.soft_contact_mask
               & (contacts.soft_contact_depth > 0) & dyn)
        m_p = model.particle_mass[pi]

        rigid_out = particle_out = None
        for _ in range(max(self.consensus_iters, 1)):
            wrench = (self._reaction_wrenches(state_in, contacts)
                      + self._lambda_wrench(state_in, contacts, lam, b_c, dt))
            state_r = state_in.replace(body_f=state_in.body_f + wrench)
            rigid_out = self.rigid_solver.step(state_r, None, control,
                                               contacts, dt)
            particle_out = self.particle_solver.step(state_in, None, control,
                                                     contacts, dt)
            # consensus residual: remaining approach velocity at contacts
            vp = particle_out.particle_qd[pi]
            vb = self._body_point_vel(rigid_out, contacts, b_c)
            vn_rel = jnp.sum((vp - vb) * nrm, axis=-1)      # >0 separating
            gap = jnp.where(act, jnp.minimum(vn_rel, 0.0), 0.0)
            residuals.append(jnp.sqrt(jnp.mean(gap ** 2) + 1e-20))
            # dual ascent with projection onto lam >= 0
            lam = jnp.maximum(lam + self.rho * m_p * (-gap), 0.0)
        return self._merge(state_in, rigid_out, particle_out,
                           jnp.stack(residuals))

    def _step_partitioned(self, state_in, control, contacts, dt):
        """Staggered Gauss-Seidel co-simulation over a body partition."""
        bp, qmask, dmask = self._part_masks
        mA = jnp.asarray(bp)[:, None]
        mQ = jnp.asarray(qmask)
        mD = jnp.asarray(dmask)

        def merge(cur, out, keep_body, keep_q, keep_d):
            return cur.replace(
                body_q=jnp.where(keep_body, out.body_q, cur.body_q),
                body_qd=jnp.where(keep_body, out.body_qd, cur.body_qd),
                joint_q=jnp.where(keep_q, out.joint_q, cur.joint_q)
                if cur.joint_q.shape[0] else cur.joint_q,
                joint_qd=jnp.where(keep_d, out.joint_qd, cur.joint_qd)
                if cur.joint_qd.shape[0] else cur.joint_qd,
                custom={**cur.custom, **out.custom})

        # fixed-point exchange: every iteration re-steps dt from state_in,
        # with the partner partition's bodies shown at the previous
        # iterate's post-step poses (proxy-body prediction). Iter 1 is a
        # plain symmetric Jacobi split; more iterations tighten agreement
        # without advancing time twice.
        prev = state_in
        for _ in range(max(self.consensus_iters, 1)):
            inA = merge(state_in, prev, ~mA, ~mQ, ~mD)
            inB = merge(state_in, prev, mA, mQ, mD)
            outA = self.rigid_solver.step(inA, None, control, contacts, dt)
            outB = self.second_rigid_solver.step(inB, None, control,
                                                 contacts, dt)
            prev = merge(merge(state_in, outA, mA, mQ, mD),
                         outB, ~mA, ~mQ, ~mD)
        cur = prev
        if self.particle_solver is not None and self.model.particle_count:
            outP = self.particle_solver.step(cur, None, control, contacts, dt)
            cur = cur.replace(particle_q=outP.particle_q,
                              particle_qd=outP.particle_qd,
                              custom={**cur.custom, **outP.custom})
        return cur

    def init_state(self, state: State) -> State:
        """Opt in to per-step convergence reporting: allocates the
        ``coupled:residuals`` buffer so scan carries stay structurally
        stable."""
        custom = dict(state.custom)
        custom.setdefault("coupled:residuals",
                          jnp.zeros((max(self.consensus_iters, 1),),
                                    dtype=state.body_q.dtype))
        return state.replace(custom=custom)

    def _merge(self, state_in, rigid_out, particle_out, residuals):
        custom = {**particle_out.custom, **rigid_out.custom}
        if residuals is not None and "coupled:residuals" in state_in.custom:
            # convergence measurement: per-iteration consensus residual
            custom["coupled:residuals"] = residuals
        return state_in.replace(
            body_q=rigid_out.body_q,
            body_qd=rigid_out.body_qd,
            joint_q=rigid_out.joint_q,
            joint_qd=rigid_out.joint_qd,
            particle_q=particle_out.particle_q,
            particle_qd=particle_out.particle_qd,
            custom=custom,
        )

    def _body_point_vel(self, state, contacts, b_c):
        p = contacts.soft_contact_position
        bq = state.body_q[b_c]
        x_com = bq[:, 0:3] + quat_rotate(bq[:, 3:7],
                                         self.model.body_com[b_c])
        qd = state.body_qd[b_c]
        return qd[:, 0:3] + jnp.cross(qd[:, 3:6], p - x_com)

    def _lambda_wrench(self, state, contacts, lam, b_c, dt):
        """Wrench on bodies from the consensus dual impulse lam."""
        model = self.model
        B = model.body_count
        f = -contacts.soft_contact_normal * (lam / dt)[:, None]
        p = contacts.soft_contact_position
        bq = state.body_q[b_c]
        x_com = bq[:, 0:3] + quat_rotate(bq[:, 3:7], model.body_com[b_c])
        tau = jnp.cross(p - x_com, f)
        return jax.ops.segment_sum(jnp.concatenate([f, tau], axis=-1),
                                   b_c, B)

    def _reaction_wrenches(self, state: State, contacts: Contacts):
        """Equal-and-opposite penalty wrench on bodies from particle contacts
        (the proxy/ADMM consensus force of the reference, one sweep)."""
        model = self.model
        st = model.structure
        B = model.body_count
        dtype = state.body_q.dtype
        pi = contacts.soft_contact_particle
        si = contacts.soft_contact_shape
        n = contacts.soft_contact_normal
        depth = contacts.soft_contact_depth
        act = contacts.soft_contact_mask & (depth > 0)
        # shape->body map must stay static: use the pipeline's precomputed
        # soft pair shapes (contacts.soft_contact_shape mirrors them)
        si_static = getattr(st, "soft_pairs",
                            np.zeros((0, 2), np.int32))[:, 1]
        body_idx = np.asarray(st.shape_body)[si_static]
        dyn = jnp.asarray(body_idx >= 0)
        b_c = np.maximum(body_idx, 0)

        vp = state.particle_qd[pi]
        vn = jnp.sum(vp * n, axis=-1)
        f_mag = jnp.where(act & dyn,
                          self.coupling_ke * depth - self.coupling_kd * vn,
                          0.0)
        f_mag = jnp.maximum(f_mag, 0.0)
        # force on the BODY is opposite the particle push direction
        f = -n * f_mag[:, None]
        p = contacts.soft_contact_position
        x_com = (state.body_q[b_c][:, 0:3]
                 + quat_rotate(state.body_q[b_c][:, 3:7],
                               model.body_com[b_c]))
        tau = jnp.cross(p - x_com, f)
        wrench = jnp.concatenate([f, tau], axis=-1)
        return jax.ops.segment_sum(wrench, b_c, B)
