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
                 particle_solver: SolverBase,
                 coupling_ke: float = 1.0e4, coupling_kd: float = 50.0):
        super().__init__(model)
        self.rigid_solver = rigid_solver
        self.particle_solver = particle_solver
        self.coupling_ke = float(coupling_ke)
        self.coupling_kd = float(coupling_kd)

    def step(self, state_in: State, state_out: Optional[State] = None,
             control: Optional[Control] = None,
             contacts: Optional[Contacts] = None, dt: float = 1e-3) -> State:
        model = self.model
        state = state_in

        # reaction of particle contacts onto rigid bodies
        if (contacts is not None and contacts.soft_contact_max
                and model.body_count):
            state = state.replace(
                body_f=state.body_f + self._reaction_wrenches(state, contacts))

        rigid_out = self.rigid_solver.step(state, None, control, contacts, dt)
        particle_out = self.particle_solver.step(state, None, control,
                                                 contacts, dt)
        return state_in.replace(
            body_q=rigid_out.body_q,
            body_qd=rigid_out.body_qd,
            joint_q=rigid_out.joint_q,
            joint_qd=rigid_out.joint_qd,
            particle_q=particle_out.particle_q,
            particle_qd=particle_out.particle_qd,
            custom={**particle_out.custom, **rigid_out.custom},
        )

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
