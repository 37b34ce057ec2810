"""PID controller with explicit integral carry
(reference: newton/_src/controllers/controller_pid.py:62)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["ControllerPID"]


class ControllerPID:
    """Stateful PID: call ``step(carry, model, state, command, dof_indices,
    dt)`` -> (carry, effort). Use :meth:`init` for the zero integral carry."""

    def __init__(self, kp, ki, kd, i_limit=jnp.inf, coord_indices=None):
        self.kp = jnp.asarray(kp)
        self.ki = jnp.asarray(ki)
        self.kd = jnp.asarray(kd)
        self.i_limit = i_limit
        self.coord_indices = coord_indices

    def init(self, n):
        return jnp.zeros((n,))

    def step(self, integral, model, state, command, dof_indices, dt):
        ci = self.coord_indices if self.coord_indices is not None else dof_indices
        q = state.joint_q[np.asarray(ci)]
        qd = state.joint_qd[np.asarray(dof_indices)]
        err = jnp.asarray(command) - q
        integral = jnp.clip(integral + err * dt, -self.i_limit, self.i_limit)
        effort = self.kp * err + self.ki * integral - self.kd * qd
        return integral, effort
