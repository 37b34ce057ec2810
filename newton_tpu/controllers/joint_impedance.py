"""Joint-impedance controllers, model-based and model-free.

TPU-native re-design of reference
newton/_src/controllers/impl/joint_impedance/model_based.py:32 and
model_free.py:43. The model-based variant shapes the closed-loop dynamics
with the mass matrix and compensates bias forces (gravity/Coriolis) using
the same batched CRBA/RNEA as the generalized solver.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..solvers.generalized.dynamics import (
    dof_subspace,
    get_generalized_cache,
    group_bias_forces,
    group_mass_matrix,
)

__all__ = ["JointImpedanceModelFree", "JointImpedanceModelBased"]


class JointImpedanceModelFree:
    """tau = kp (q* - q) + kd (qd* - qd) (reference: model_free.py:43)."""

    def __init__(self, kp, kd, coord_indices=None):
        self.kp = jnp.asarray(kp)
        self.kd = jnp.asarray(kd)
        self.coord_indices = coord_indices

    def __call__(self, model, state, command, dof_indices):
        ci = self.coord_indices if self.coord_indices is not None else dof_indices
        q = state.joint_q[np.asarray(ci)]
        qd = state.joint_qd[np.asarray(dof_indices)]
        command = jnp.asarray(command)
        qt = command if command.ndim == 1 else command[0]
        qdt = jnp.zeros_like(qd) if command.ndim == 1 else command[1]
        return self.kp * (qt - q) + self.kd * (qdt - qd)


class JointImpedanceModelBased:
    """tau = M(q) (kp e + kd ed) + bias(q, qd)
    (reference: model_based.py:32) — exact gravity/Coriolis compensation via
    the batched generalized dynamics."""

    def __init__(self, model, kp, kd, coord_indices=None):
        self.model = model
        self.kp = jnp.asarray(kp)
        self.kd = jnp.asarray(kd)
        self.coord_indices = coord_indices
        self.gc = get_generalized_cache(model.structure)

    def __call__(self, model, state, command, dof_indices):
        ci = self.coord_indices if self.coord_indices is not None else dof_indices
        q = state.joint_q[np.asarray(ci)]
        qd = state.joint_qd[np.asarray(dof_indices)]
        command = jnp.asarray(command)
        qt = command if command.ndim == 1 else command[0]
        qdt = jnp.zeros_like(qd) if command.ndim == 1 else command[1]
        a_des_full = jnp.zeros_like(state.joint_qd)
        a_des_full = a_des_full.at[np.asarray(dof_indices)].set(
            self.kp * (qt - q) + self.kd * (qdt - qd))

        v_o, w_o = dof_subspace(model, state.body_q, state.joint_q)
        tau_bias = group_bias_forces(model, state.body_q, state.body_qd,
                                     v_o, w_o)
        tau = jnp.zeros_like(state.joint_qd)
        for g in self.gc.groups:
            M = group_mass_matrix(model, state.body_q, g, v_o, w_o)
            tg = jnp.einsum("nde,ne->nd", M, a_des_full[g.dof_idx])
            tau = tau.at[g.dof_idx.reshape(-1)].set(tg.reshape(-1))
        tau = tau + tau_bias
        return tau[np.asarray(dof_indices)]
