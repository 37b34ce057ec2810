"""Collision pipeline: candidate pairs -> Contacts, fully jitted.

TPU-native re-design of reference newton/_src/sim/collide.py:741-1671.
The reference runs broad phase (NXN/SAP/explicit) then a narrow phase that
appends to atomic-counter buffers; our pipeline is **static end to end**:

1. Candidate pairs were precomputed at ``finalize()`` (the reference's
   EXPLICIT broad-phase mode, builder.py:12413) and carry build-time contact
   slot offsets.
2. A sphere-radius cull masks distant pairs (the AABB test of
   collide.py:1357 reduced to its branch-free essence).
3. Pairs are grouped by (GeoType, GeoType) class on the host; each class runs
   one vectorized narrow-phase function over all its pairs and writes its
   manifold into the Contacts pytree at static offsets.

Everything is differentiable; the reference's separate "differentiable
contacts" augmentation (geometry/differentiable_contacts.py) is unnecessary —
``jax.grad`` flows through the whole pipeline.

Soft (particle-shape) contacts use the same precomputed-pair scheme against
the model's particle list.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry.narrow_phase import contact_fn_for
from ..geometry.types import GeoType
from ..math import (
    quat_rotate,
    transform_multiply,
    transform_point,
    transform_point_inv,
)
from .contacts import Contacts
from .model import Model
from .state import State

__all__ = ["CollisionPipeline", "collide"]


class _PairClass:
    """Host-side grouping of candidate pairs sharing a contact function."""

    __slots__ = ("fn", "swapped", "slots", "pair_idx", "shape0", "shape1",
                 "out_offsets")

    def __init__(self, fn, swapped, slots):
        self.fn = fn
        self.swapped = swapped
        self.slots = slots
        self.pair_idx: List[int] = []
        self.shape0: List[int] = []
        self.shape1: List[int] = []
        self.out_offsets: List[int] = []


class CollisionPipeline:
    """Precompiled collision plan for one Model (reference: collide.py:741).

    Usage::

        pipeline = CollisionPipeline(model)
        contacts = pipeline.collide(state)   # pure function, jit-safe
    """

    def __init__(self, model: Model, rigid_contact_margin: float = 0.01,
                 soft_contact_margin: float = 0.01):
        self.model = model
        self.rigid_contact_margin = float(rigid_contact_margin)
        self.soft_contact_margin = float(soft_contact_margin)
        st = model.structure
        self.rigid_contact_max = st.rigid_contact_max
        self.soft_contact_max = st.soft_contact_max

        # group candidate pairs by type class
        classes: Dict[Tuple[int, int, bool], _PairClass] = {}
        pairs = st.candidate_pairs
        slots = st.candidate_pair_slots
        types = st.shape_type
        unsupported = set()
        for i, (a, b) in enumerate(pairs):
            t0, t1 = int(types[a]), int(types[b])
            fn, swapped, k = contact_fn_for(t0, t1)
            if fn is None:
                unsupported.add((t0, t1))
                continue
            key = (min(t0, t1), max(t0, t1), swapped)
            pc = classes.get(key)
            if pc is None:
                pc = classes[key] = _PairClass(fn, swapped, k)
            pc.pair_idx.append(i)
            pc.shape0.append(int(a))
            pc.shape1.append(int(b))
            pc.out_offsets.append(int(slots[i]))
        self.classes = list(classes.values())
        for pc in self.classes:
            pc.shape0 = np.asarray(pc.shape0, dtype=np.int32)
            pc.shape1 = np.asarray(pc.shape1, dtype=np.int32)
            # slot indices (n, K) into the flat contact buffer
            offs = np.asarray(pc.out_offsets, dtype=np.int32)
            pc.out_offsets = offs[:, None] + np.arange(pc.slots, dtype=np.int32)[None, :]
        if unsupported:
            import warnings
            warnings.warn(
                f"collision pairs with unsupported type classes skipped: {sorted(unsupported)}")

        # soft contacts: particle vs shape pairs
        sp = getattr(st, "soft_pairs", np.zeros((0, 2), dtype=np.int32))
        self.soft_particle = sp[:, 0]
        self.soft_shape = sp[:, 1]

    # ------------------------------------------------------------------
    def contacts(self) -> Contacts:
        """Allocate a zeroed Contacts buffer sized for this pipeline."""
        return Contacts.zeros(self.rigid_contact_max, self.soft_contact_max,
                              dtype=self.model.body_q.dtype)

    # ------------------------------------------------------------------
    def collide(self, state: State,
                contacts: Optional[Contacts] = None) -> Contacts:
        """Generate contacts for the current state (reference: collide.py:1296).

        Pure function of (model, state); the optional ``contacts`` argument is
        accepted for API parity with the reference's in-place signature and
        only supplies the capacity.
        """
        model = self.model
        dtype = state.body_q.dtype
        C = self.rigid_contact_max
        P = self.soft_contact_max
        out = Contacts.zeros(C, P, dtype=dtype) if contacts is None else \
            Contacts.zeros(contacts.rigid_contact_max, contacts.soft_contact_max,
                           dtype=dtype)

        if C > 0 and self.classes:
            # world transform of every shape frame: body pose * local offset
            sb = model.structure.shape_body
            body_idx = np.maximum(sb, 0)
            is_static = jnp.asarray(sb < 0)[:, None]
            X_body = jnp.where(is_static,
                               jnp.zeros((7,), dtype=dtype).at[6].set(1.0),
                               state.body_q[body_idx])
            X_ws = transform_multiply(X_body, model.shape_transform)

            mask_all = out.rigid_contact_mask
            pos_all = out.rigid_contact_position
            nrm_all = out.rigid_contact_normal
            dep_all = out.rigid_contact_depth
            s0_all = out.rigid_contact_shape0
            s1_all = out.rigid_contact_shape1

            for pc in self.classes:
                i0, i1 = pc.shape0, pc.shape1
                a, b = (i1, i0) if pc.swapped else (i0, i1)
                X0, X1 = X_ws[a], X_ws[b]
                s0, s1 = model.shape_scale[a], model.shape_scale[b]
                # sphere-radius cull (skip when either side is a plane)
                r0 = model.shape_collision_radius[a]
                r1 = model.shape_collision_radius[b]
                pos, nrm, depth = pc.fn(X0, X1, s0, s1)
                if pc.swapped:
                    nrm = -nrm  # restore shape0 -> shape1 orientation
                thick = (model.shape_thickness[i0] + model.shape_thickness[i1])
                depth = depth + thick[:, None]
                active = depth > -self.rigid_contact_margin
                # cull wildly separated pairs for numerical hygiene
                center_d = jnp.linalg.norm(X1[:, 0:3] - X0[:, 0:3], axis=-1)
                near = center_d < (r0 + r1 + self.rigid_contact_margin)
                active = active & near[:, None]

                idx = pc.out_offsets                      # (n, K) static
                mask_all = mask_all.at[idx].set(active)
                pos_all = pos_all.at[idx].set(pos)
                nrm_all = nrm_all.at[idx].set(nrm)
                dep_all = dep_all.at[idx].set(jnp.where(active, depth, 0.0))
                s0_all = s0_all.at[idx].set(
                    jnp.broadcast_to(jnp.asarray(i0, dtype=jnp.int32)[:, None], idx.shape))
                s1_all = s1_all.at[idx].set(
                    jnp.broadcast_to(jnp.asarray(i1, dtype=jnp.int32)[:, None], idx.shape))

            out = out.replace(
                rigid_contact_mask=mask_all,
                rigid_contact_position=pos_all,
                rigid_contact_normal=nrm_all,
                rigid_contact_depth=dep_all,
                rigid_contact_shape0=s0_all,
                rigid_contact_shape1=s1_all,
            )

        if P > 0 and len(self.soft_particle):
            out = self._collide_soft(state, out)
        return out

    # ------------------------------------------------------------------
    def _collide_soft(self, state: State, out: Contacts) -> Contacts:
        """Particle-vs-shape contacts over precomputed pairs.

        Uses per-geom-type signed distance (plane/sphere/box/capsule) in the
        shape frame (reference: soft contact kernels in collide.py)."""
        model = self.model
        dtype = state.body_q.dtype
        pi = self.soft_particle
        si = self.soft_shape
        sb = model.structure.shape_body[si]
        body_idx = np.maximum(sb, 0)
        is_static = jnp.asarray(sb < 0)[:, None]
        X_body = jnp.where(is_static,
                           jnp.zeros((7,), dtype=dtype).at[6].set(1.0),
                           state.body_q[body_idx])
        X_ws = transform_multiply(X_body, model.shape_transform[si])
        p = state.particle_q[pi]
        radius = model.particle_radius[pi]
        scale = model.shape_scale[si]

        p_local = transform_point_inv(X_ws, p)
        d, g = _shape_sdf(self.model.structure.shape_type[si], p_local, scale, dtype)
        n_world = quat_rotate(X_ws[:, 3:7], g)
        depth = radius - d
        active = depth > -self.soft_contact_margin
        pos = p - n_world * d[:, None]
        return out.replace(
            soft_contact_mask=active,
            soft_contact_particle=jnp.asarray(pi, dtype=jnp.int32),
            soft_contact_shape=jnp.asarray(si, dtype=jnp.int32),
            soft_contact_position=pos,
            soft_contact_normal=n_world,  # outward: push direction for the particle
            soft_contact_depth=jnp.where(active, depth, 0.0),
        )


def _shape_sdf(shape_types: np.ndarray, p_local: jnp.ndarray,
               scale: jnp.ndarray, dtype):
    """Signed distance + gradient for primitive shapes at local points.

    shape_types is static numpy; evaluated branch-free with where-select.
    Gradient points away from the shape surface (outward).
    """
    from ..geometry.narrow_phase import _box_sdf_local

    t = shape_types
    # plane: z
    d_plane = p_local[:, 2]
    g_plane = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=dtype),
                               p_local.shape)
    # sphere
    r = jnp.linalg.norm(p_local, axis=-1)
    safe_r = jnp.maximum(r, 1e-9)
    d_sphere = r - scale[:, 0]
    g_sphere = p_local / safe_r[:, None]
    # box
    d_box, g_box = _box_sdf_local(p_local, scale)
    # capsule (axis Z, radius s0, half-height s1)
    z = jnp.clip(p_local[:, 2], -scale[:, 1], scale[:, 1])
    closest = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1)
    dc = p_local - closest
    dist_c = jnp.linalg.norm(dc, axis=-1)
    d_cap = dist_c - scale[:, 0]
    g_cap = dc / jnp.maximum(dist_c, 1e-9)[:, None]

    is_plane = jnp.asarray(t == int(GeoType.PLANE))
    is_sphere = jnp.asarray(t == int(GeoType.SPHERE))
    is_box = jnp.asarray(t == int(GeoType.BOX))
    d = jnp.where(is_plane, d_plane,
                  jnp.where(is_sphere, d_sphere,
                            jnp.where(is_box, d_box, d_cap)))
    g = jnp.where(is_plane[:, None], g_plane,
                  jnp.where(is_sphere[:, None], g_sphere,
                            jnp.where(is_box[:, None], g_box, g_cap)))
    return d, g


def collide(model: Model, state: State,
            pipeline: Optional[CollisionPipeline] = None,
            contacts: Optional[Contacts] = None) -> Contacts:
    """Convenience one-shot collide (reference: Model.collide, model.py:1987)."""
    if pipeline is None:
        pipeline = CollisionPipeline(model)
    return pipeline.collide(state, contacts)
