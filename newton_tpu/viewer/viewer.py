"""Viewer base class: the logging API every backend implements.

TPU-native re-design of reference newton/_src/viewer/viewer.py:92 (20K LoC
across backends). The logging surface is preserved — set_model,
begin_frame/end_frame, log_state, log_contacts, log_shapes/log_points/
log_lines, log_scalar, set_visible_worlds — but all inputs are host numpy
(device arrays are pulled once per frame at the log boundary, outside jit).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..sim.contacts import Contacts
from ..sim.model import Model
from ..sim.state import State

__all__ = ["ViewerBase"]


class ViewerBase:
    """Abstract viewer (reference: viewer/viewer.py:92)."""

    def __init__(self):
        self.model: Optional[Model] = None
        self.time = 0.0
        self._frame = -1
        self._visible_worlds: Optional[List[int]] = None
        self._world_offsets: Optional[np.ndarray] = None
        self.scalars: Dict[str, List[float]] = {}

    # -- lifecycle -----------------------------------------------------
    def set_model(self, model: Model):
        self.model = model

    def begin_frame(self, time: float):
        self.time = float(time)
        self._frame += 1

    def end_frame(self):
        pass

    def is_running(self) -> bool:
        return True

    def close(self):
        pass

    # -- multi-world display (reference: viewer.py:687,:808) ------------
    def set_visible_worlds(self, worlds):
        self._visible_worlds = list(worlds)

    def set_world_offsets(self, offsets):
        self._world_offsets = np.asarray(offsets)

    # -- logging API -----------------------------------------------------
    def log_state(self, state: State):
        """Record body/particle state for the current frame."""

    def log_contacts(self, contacts: Contacts, state: Optional[State] = None):
        pass

    def log_shapes(self, name: str, shape_type, scale, xforms, colors=None):
        pass

    def log_points(self, name: str, points, radius=0.01, colors=None):
        pass

    def log_lines(self, name: str, starts, ends, colors=None):
        pass

    def log_mesh(self, name: str, vertices, indices, xform=None, colors=None):
        pass

    def log_gaussian(self, name: str, means, scales, quats=None,
                     colors=None, opacities=None):
        """Log a Gaussian-splat cloud (reference viewer.py log_gaussian;
        geometry/types.py:2334 Gaussian). Headless backends ignore it."""
        pass

    def log_scalar(self, name: str, value):
        self.scalars.setdefault(name, []).append(float(value))

    def log_image(self, name: str, image):
        pass

    def log_array(self, name: str, array):
        pass

    # -- interaction (reference: viewer.py:1990) -------------------------
    def apply_forces(self, state: State) -> State:
        """Interactive picking force hook; headless backends are identity."""
        return state

    def pick(self, state: State, origin, direction):
        """Raycast pick: returns (shape_index, t) of the closest hit or
        (-1, inf) (reference viewer/picking.py:17 GPU raycast picking)."""
        import jax.numpy as jnp

        from ..geometry.raycast import raycast_model
        if self.model is None:
            return -1, float("inf")
        o = jnp.asarray(origin, dtype=state.body_q.dtype)[None]
        d = jnp.asarray(direction, dtype=state.body_q.dtype)[None]
        t, sidx, _ = raycast_model(self.model, state, o, d)
        return int(sidx[0]), float(t[0])
