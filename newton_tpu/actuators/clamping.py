"""Effort clamping models (reference: newton/_src/actuators/clamping/*.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["ClampMaxEffort", "ClampPositionBased", "ClampDCMotor"]


class ClampMaxEffort:
    """Symmetric effort limit (reference: clamping/max_effort.py)."""

    def __init__(self, max_effort=None):
        self.max_effort = max_effort

    def __call__(self, model, state, effort, dof_indices):
        cap = (model.joint_effort_limit[dof_indices]
               if self.max_effort is None else self.max_effort)
        return jnp.clip(effort, -cap, cap)


class ClampPositionBased:
    """Effort limit scaled down near joint limits
    (reference: clamping/position_based.py)."""

    def __init__(self, margin: float = 0.1):
        self.margin = float(margin)

    def __call__(self, model, state, effort, dof_indices):
        # assumes 1-coord dofs (coord index == dof index ordering)
        q = state.joint_q[dof_indices] if state.joint_q.shape[0] > int(np.max(dof_indices, initial=0)) else None
        lo = model.joint_limit_lower[dof_indices]
        hi = model.joint_limit_upper[dof_indices]
        cap = model.joint_effort_limit[dof_indices]
        if q is None:
            return jnp.clip(effort, -cap, cap)
        up_scale = jnp.clip((hi - q) / self.margin, 0.0, 1.0)
        dn_scale = jnp.clip((q - lo) / self.margin, 0.0, 1.0)
        return jnp.clip(effort, -cap * dn_scale, cap * up_scale)


class ClampDCMotor:
    """DC-motor torque-speed curve (reference: clamping/dc_motor.py):
    available torque falls linearly with |velocity| up to the no-load speed."""

    def __init__(self, stall_torque: float, no_load_speed: float):
        self.stall_torque = float(stall_torque)
        self.no_load_speed = float(no_load_speed)

    def __call__(self, model, state, effort, dof_indices):
        qd = state.joint_qd[dof_indices]
        avail_pos = self.stall_torque * jnp.clip(
            1.0 - qd / self.no_load_speed, 0.0, 1.0)
        avail_neg = self.stall_torque * jnp.clip(
            1.0 + qd / self.no_load_speed, 0.0, 1.0)
        return jnp.clip(effort, -avail_neg, avail_pos)
