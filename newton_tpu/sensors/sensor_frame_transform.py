"""Frame-transform sensor: relative poses between frames/sites.

TPU-native re-design of reference
newton/_src/sensors/sensor_frame_transform.py:81.
"""

from __future__ import annotations

import fnmatch
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..math import transform_inverse, transform_multiply
from ..sim.model import Model
from ..sim.state import State

__all__ = ["SensorFrameTransform", "_resolve_shapes"]


def _resolve_shapes(st, spec) -> List[int]:
    """Shape indices from an index list or key glob."""
    if isinstance(spec, str):
        return [i for i, k in enumerate(st.shape_key)
                if fnmatch.fnmatch(k, spec)]
    if isinstance(spec, (int, np.integer)):
        return [int(spec)]
    return [int(s) for s in spec]


class SensorFrameTransform:
    """Relative transforms target-in-reference-frame
    (reference: sensor_frame_transform.py:81).

    Frames are shapes/sites (by index or key). ``update(state)`` returns
    (n, 7) transforms of each target frame expressed in its reference frame.
    """

    def __init__(self, model: Model, reference_frames: Sequence,
                 target_frames: Sequence):
        self.model = model
        st = model.structure
        refs, tgts = [], []
        for spec in reference_frames:
            r = _resolve_shapes(st, spec)
            if len(r) != 1:
                raise ValueError(f"reference {spec!r} matched {len(r)} shapes")
            refs.append(r[0])
        for spec in target_frames:
            t = _resolve_shapes(st, spec)
            if len(t) != 1:
                raise ValueError(f"target {spec!r} matched {len(t)} shapes")
            tgts.append(t[0])
        if len(refs) == 1 and len(tgts) > 1:
            refs = refs * len(tgts)
        self.ref_idx = np.asarray(refs, dtype=np.int32)
        self.tgt_idx = np.asarray(tgts, dtype=np.int32)
        self.ref_body = st.shape_body[self.ref_idx]
        self.tgt_body = st.shape_body[self.tgt_idx]

    def _frame(self, state: State, shape_idx, body_idx):
        model = self.model
        dtype = state.body_q.dtype
        has_body = jnp.asarray(body_idx >= 0)[:, None]
        identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
        X_b = jnp.where(has_body, state.body_q[np.maximum(body_idx, 0)],
                        identity)
        return transform_multiply(X_b, model.shape_transform[shape_idx])

    def update(self, state: State) -> jnp.ndarray:
        X_ref = self._frame(state, self.ref_idx, self.ref_body)
        X_tgt = self._frame(state, self.tgt_idx, self.tgt_body)
        return transform_multiply(transform_inverse(X_ref), X_tgt)
