"""Control input pytree (reference: newton/_src/sim/control.py:16-117)."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct

__all__ = ["Control"]


class Control(struct.PyTreeNode):
    """Per-step control inputs.

    Attributes:
        joint_target_q: position targets, ``(joint_coord_count,)``
            (coordinate layout — the reference's ``use_coord_layout_targets=True``
            layout, which is its forward-compatible mode).
        joint_target_qd: velocity targets ``(joint_dof_count,)``.
        joint_f: generalized force input ``(joint_dof_count,)``.
        custom: namespaced solver control arrays (e.g. ``mjc:ctrl``).
    """

    joint_target_q: jnp.ndarray
    joint_target_qd: jnp.ndarray
    joint_f: jnp.ndarray
    muscle_activations: jnp.ndarray = None
    tendon_f: jnp.ndarray = None  # (muscle_count,) in [0, 1]
    custom: Dict[str, Any] = struct.field(default_factory=dict)

    def clear(self) -> "Control":
        return self.replace(joint_f=jnp.zeros_like(self.joint_f))
