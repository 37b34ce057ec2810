"""PD / PID controllers (reference: newton/_src/controllers/controller_pd.py:51,
controller_pid.py:62). Pure functions matching the Actuator controller
signature; PID carries integral state explicitly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["ControllerPD"]


class ControllerPD:
    """effort = kp (q_target - q) + kd (qd_target - qd)
    (reference: controller_pd.py:51). ``command`` is the position target
    (optionally stacked [q_target, qd_target])."""

    def __init__(self, kp, kd, coord_indices=None):
        self.kp = jnp.asarray(kp)
        self.kd = jnp.asarray(kd)
        self.coord_indices = coord_indices

    def __call__(self, model, state, command, dof_indices):
        ci = self.coord_indices if self.coord_indices is not None else dof_indices
        q = state.joint_q[np.asarray(ci)]
        qd = state.joint_qd[np.asarray(dof_indices)]
        command = jnp.asarray(command)
        if command.ndim == 2:  # [q_target, qd_target]
            qt, qdt = command[0], command[1]
        else:
            qt, qdt = command, jnp.zeros_like(qd)
        return self.kp * (qt - q) + self.kd * (qdt - qd)
