"""Simulation state pytree.

TPU-native equivalent of reference newton/_src/sim/state.py:57-299. In the
reference, State is a mutable container of device arrays updated in place;
here it is an immutable pytree — solver steps are pure functions
``state_out = solver.step(state_in, ...)`` and JAX autodiff flows through it.
The reference's ``State.assign`` (CUDA-graph-safe swap, state.py:202) is
unnecessary: functional dataflow replaces buffer swapping.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct

__all__ = ["State"]


class State(struct.PyTreeNode):
    """Time-varying simulation state.

    Attributes:
        body_q: rigid body transforms ``(body_count, 7)`` [p, q_xyzw].
        body_qd: spatial twists ``(body_count, 6)`` **[v_com, omega]**, world
            frame — linear velocity of the COM first, then angular velocity
            (reference convention, docs/concepts/conventions.rst:110).
        body_f: external body wrenches ``(body_count, 6)`` **[f, tau]**, world
            frame, applied at the body COM.
        joint_q: generalized joint coordinates ``(joint_coord_count,)``.
        joint_qd: generalized joint velocities ``(joint_dof_count,)``.
        particle_q: particle positions ``(particle_count, 3)``.
        particle_qd: particle velocities ``(particle_count, 3)``.
        particle_f: external particle forces ``(particle_count, 3)``.
        custom: namespaced solver-specific state arrays (e.g. warm starts).
    """

    body_q: jnp.ndarray
    body_qd: jnp.ndarray
    body_f: jnp.ndarray
    joint_q: jnp.ndarray
    joint_qd: jnp.ndarray
    particle_q: jnp.ndarray
    particle_qd: jnp.ndarray
    particle_f: jnp.ndarray
    custom: Dict[str, Any] = struct.field(default_factory=dict)

    @property
    def body_count(self) -> int:
        return self.body_q.shape[0]

    @property
    def particle_count(self) -> int:
        return self.particle_q.shape[0]

    @property
    def requires_grad(self) -> bool:
        # JAX arrays are always differentiable; kept for API parity.
        return True

    def clear_forces(self) -> "State":
        """Return a state with zeroed force accumulators (reference: state.py:189)."""
        return self.replace(
            body_f=jnp.zeros_like(self.body_f),
            particle_f=jnp.zeros_like(self.particle_f),
        )
