"""Fixed-capacity contact buffers (reference: newton/_src/sim/contacts.py:95-494).

The reference already uses fixed-capacity SoA buffers with an atomic counter —
exactly the static-shape design a TPU needs. We go one step further: contacts
are **slot-indexed, mask-validated** rather than count-compacted. Each
candidate shape pair owns a fixed number of slots; inactive slots carry
``mask = False`` and zero penetration so solver kernels can process every slot
unconditionally (branch-free, VPU-friendly). ``count`` is a derived reduction
used for diagnostics/overflow reporting, not for control flow.

Conventions:
- ``normal``: unit world-frame normal pointing **from shape0 toward shape1**.
- ``depth``: penetration depth, positive when overlapping (after accounting
  for the shapes' ``thickness`` offsets).
- ``position``: world-frame contact point (midpoint of the overlap segment).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct

__all__ = ["Contacts"]


class Contacts(struct.PyTreeNode):
    """Contact data pytree with static capacity.

    Rigid (shape-shape) contacts, capacity ``C``:
        rigid_contact_mask: (C,) bool — slot validity.
        rigid_contact_shape0/1: (C,) int32 shape indices (-1 when invalid).
        rigid_contact_position: (C, 3) world contact point.
        rigid_contact_normal: (C, 3) world normal, shape0 -> shape1.
        rigid_contact_depth: (C,) penetration depth (>0 overlapping).
        rigid_contact_force: (C, 3) world-frame force applied to shape1's body
            (filled by ``solver.update_contacts``; reference Contacts.force).

    Soft (particle-shape) contacts, capacity ``P``:
        soft_contact_mask, soft_contact_particle, soft_contact_shape,
        soft_contact_normal, soft_contact_depth.
    """

    rigid_contact_mask: jnp.ndarray
    rigid_contact_shape0: jnp.ndarray
    rigid_contact_shape1: jnp.ndarray
    rigid_contact_position: jnp.ndarray
    rigid_contact_normal: jnp.ndarray
    rigid_contact_depth: jnp.ndarray
    rigid_contact_force: jnp.ndarray

    soft_contact_mask: jnp.ndarray
    soft_contact_particle: jnp.ndarray
    soft_contact_shape: jnp.ndarray
    soft_contact_position: jnp.ndarray
    soft_contact_normal: jnp.ndarray
    soft_contact_depth: jnp.ndarray

    # hydroelastic pressure-field contacts (reference:
    # geometry/sdf_hydroelastic.py:1521-1539): per-slot normal stiffness
    # c such that F_n = c * depth reproduces the aggregated patch force
    # integral(p dA) at the generating frame's penetration. 0 = rigid
    # contact (complementarity / hard projection). Compliant solvers
    # (XPBD) consume it as compliance 1/c; rigid solvers may ignore it.
    rigid_contact_stiffness: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((0,), dtype=jnp.float32))

    # dynamic broad phase: overlapping candidate pairs dropped because the
    # per-class pair budget overflowed this frame (reference: narrow-phase
    # overflow counters, collide.py:883-889). 0 in static-pair mode.
    broad_phase_dropped: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), dtype=jnp.int32))

    # mesh narrow phase: in-contact SDF samples that overflowed the per-pair
    # slot budget this frame (reference overflow counters,
    # narrow_phase.py:1512-1528) — a nonzero value means the manifold was
    # thinned and mesh_sample_count / slot budgets should be raised
    mesh_samples_dropped: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), dtype=jnp.int32))

    custom: Dict[str, Any] = struct.field(default_factory=dict)

    @property
    def rigid_contact_max(self) -> int:
        return self.rigid_contact_mask.shape[0]

    @property
    def soft_contact_max(self) -> int:
        return self.soft_contact_mask.shape[0]

    @property
    def rigid_contact_count(self) -> jnp.ndarray:
        return jnp.sum(self.rigid_contact_mask.astype(jnp.int32))

    @property
    def soft_contact_count(self) -> jnp.ndarray:
        return jnp.sum(self.soft_contact_mask.astype(jnp.int32))

    @classmethod
    def zeros(cls, rigid_capacity: int, soft_capacity: int = 0,
              dtype=jnp.float32) -> "Contacts":
        C, P = int(rigid_capacity), int(soft_capacity)
        return cls(
            rigid_contact_mask=jnp.zeros((C,), dtype=bool),
            rigid_contact_shape0=-jnp.ones((C,), dtype=jnp.int32),
            rigid_contact_shape1=-jnp.ones((C,), dtype=jnp.int32),
            rigid_contact_position=jnp.zeros((C, 3), dtype=dtype),
            rigid_contact_normal=jnp.zeros((C, 3), dtype=dtype),
            rigid_contact_depth=jnp.zeros((C,), dtype=dtype),
            rigid_contact_force=jnp.zeros((C, 3), dtype=dtype),
            soft_contact_mask=jnp.zeros((P,), dtype=bool),
            soft_contact_particle=-jnp.ones((P,), dtype=jnp.int32),
            soft_contact_shape=-jnp.ones((P,), dtype=jnp.int32),
            soft_contact_position=jnp.zeros((P, 3), dtype=dtype),
            soft_contact_normal=jnp.zeros((P, 3), dtype=dtype),
            soft_contact_depth=jnp.zeros((P,), dtype=dtype),
            rigid_contact_stiffness=jnp.zeros((C,), dtype=dtype),
        )
