"""IMU sensor: proper acceleration + angular velocity at site frames.

TPU-native re-design of reference newton/_src/sensors/sensor_imu.py:72
(update :180). The reference requires the opt-in ``body_qdd`` extended state
attribute; here acceleration is computed by finite-differencing the twist of
the previous step (passed functionally), which is what the extended attr
stores anyway.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..math import quat_rotate_inv, transform_multiply, transform_point
from ..sim.model import Model
from ..sim.state import State

__all__ = ["SensorIMU"]


class SensorIMU:
    """Accelerometer + gyroscope at site shapes (reference: sensor_imu.py:72).

    Args:
        model: finalized model.
        sites: shape indices (or keys) of the IMU mounting sites.

    ``update(state, prev_state, dt)`` returns (lin_acc (n,3), ang_vel (n,3))
    in each site's local frame; gravity is included in the accelerometer
    reading (proper acceleration), matching the reference.
    """

    def __init__(self, model: Model, sites: Sequence):
        self.model = model
        st = model.structure
        idx = []
        for s in sites:
            if isinstance(s, str):
                idx.append(st.shape_key.index(s))
            else:
                idx.append(int(s))
        self.site_idx = np.asarray(idx, dtype=np.int32)
        self.body_idx = st.shape_body[self.site_idx]
        if (self.body_idx < 0).any():
            raise ValueError("IMU sites must be attached to bodies")

    def update(self, state: State, prev_state: Optional[State] = None,
               dt: float = 1e-3):
        model = self.model
        b = self.body_idx
        X_b = state.body_q[b]
        X_s = transform_multiply(X_b, model.shape_transform[self.site_idx])
        p_site = X_s[:, 0:3]
        q_site = X_s[:, 3:7]

        from ..math import quat_rotate
        w = state.body_qd[b][:, 3:6]
        v_com = state.body_qd[b][:, 0:3]
        x_com = X_b[:, 0:3] + quat_rotate(X_b[:, 3:7], model.body_com[b])

        if prev_state is not None:
            w_prev = prev_state.body_qd[b][:, 3:6]
            v_prev = prev_state.body_qd[b][:, 0:3]
            a_com = (v_com - v_prev) / dt
            alpha = (w - w_prev) / dt
        else:
            a_com = jnp.zeros_like(v_com)
            alpha = jnp.zeros_like(w)

        r = p_site - x_com
        a_site = a_com + jnp.cross(alpha, r) + jnp.cross(w, jnp.cross(w, r))
        w_idx = np.maximum(model.structure.body_world[b], 0)
        g = model.gravity[w_idx]
        # proper acceleration (what an accelerometer measures)
        a_proper = a_site - g
        lin_acc = quat_rotate_inv(q_site, a_proper)
        ang_vel = quat_rotate_inv(q_site, w)
        return lin_acc, ang_vel
