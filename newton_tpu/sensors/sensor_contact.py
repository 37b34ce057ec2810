"""Contact sensor: aggregated net contact force between shape sets.

TPU-native re-design of reference newton/_src/sensors/sensor_contact.py:279
(update :684). Consumes ``Contacts.rigid_contact_force`` (filled by the
solver's ``update_contacts``) and reduces per-(set x set) net force/torque
with masked segment sums — no atomics, no shape-set size limits.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..sim.contacts import Contacts
from ..sim.model import Model
from ..sim.state import State
from .sensor_frame_transform import _resolve_shapes

__all__ = ["SensorContact"]


class SensorContact:
    """Net contact force/torque between shape sets
    (reference: sensor_contact.py:279).

    Args:
        model: finalized model.
        sensing_shapes: list of shape-index lists (or key patterns); one
            output row per entry.
        counterpart_shapes: optional matching list restricting which
            opposing shapes count (default: any).

    ``update(contacts, state)`` returns (force (n, 3), torque (n, 3)) — the
    net world-frame wrench applied TO the sensing set, torque about the
    world origin.
    """

    def __init__(self, model: Model, sensing_shapes: Sequence,
                 counterpart_shapes: Sequence = None):
        self.model = model
        st = model.structure
        S = st.shape_count
        self.n = len(sensing_shapes)
        # membership matrices (n_sensors, S)
        self.sense = np.zeros((self.n, S), dtype=bool)
        for i, spec in enumerate(sensing_shapes):
            self.sense[i, _resolve_shapes(st, spec)] = True
        if counterpart_shapes is not None:
            self.counter = np.zeros((self.n, S), dtype=bool)
            for i, spec in enumerate(counterpart_shapes):
                self.counter[i, _resolve_shapes(st, spec)] = True
        else:
            self.counter = np.ones((self.n, S), dtype=bool)

    def update(self, contacts: Contacts, state: State = None):
        s0 = jnp.maximum(contacts.rigid_contact_shape0, 0)
        s1 = jnp.maximum(contacts.rigid_contact_shape1, 0)
        f = contacts.rigid_contact_force               # force on shape1 body
        p = contacts.rigid_contact_position
        mask = contacts.rigid_contact_mask
        sense = jnp.asarray(self.sense)
        counter = jnp.asarray(self.counter)

        # contact contributes +f to shape1's set, -f to shape0's set
        in1 = sense[:, s1] & counter[:, s0] & mask[None, :]   # (n, C)
        in0 = sense[:, s0] & counter[:, s1] & mask[None, :]
        sign = in1.astype(f.dtype) - in0.astype(f.dtype)      # (n, C)
        force = jnp.einsum("nc,cx->nx", sign, f)
        torque = jnp.einsum("nc,cx->nx", sign, jnp.cross(p, f))
        return force, torque
