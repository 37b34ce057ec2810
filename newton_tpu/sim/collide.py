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
    quat_rotate_inv,
    transform_multiply,
    transform_point,
    transform_point_inv,
)
from .contacts import Contacts
from .model import Model
from .state import State

__all__ = ["CollisionPipeline", "collide", "match_contacts"]


class _PairClass:
    """Host-side grouping of candidate pairs sharing a contact function.

    ``kind`` selects the dynamic-mode narrow phase: "prim" (analytic pair
    function), "support" (generic support-map MPR — hull and/or analytic
    supports, per-class static types), "plane_convex" (hull vertices vs
    plane SDF).
    """

    __slots__ = ("fn", "swapped", "slots", "pair_idx", "shape0", "shape1",
                 "out_offsets", "cap", "plane_side", "kind", "types01",
                 "bidir", "sap")

    def __init__(self, fn, swapped, slots, kind="prim", types01=None):
        self.sap = None
        self.fn = fn
        self.swapped = swapped
        self.slots = slots
        self.kind = kind
        self.types01 = types01
        self.bidir = False
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
                 soft_contact_margin: float = 0.01,
                 hydroelastic: bool = False,
                 mode: str = "auto",
                 dynamic_pair_budget: Optional[int] = None,
                 persistent_manifolds: bool = False,
                 manifold_slide_tol: float = 0.05,
                 broad_phase: str = "topk",
                 sap_axis: int = 0, sap_window: int = 16):
        self.model = model
        self.rigid_contact_margin = float(rigid_contact_margin)
        self.soft_contact_margin = float(soft_contact_margin)
        # hydroelastic mode: mesh/SDF contacts are generated on the
        # equal-pressure surface between the two penetrating elastic bodies
        # (reference: geometry/sdf_hydroelastic.py:240 HydroelasticSDF).
        # Per-shape elastic modulus comes from shape_material_ke; the series
        # combination E0*E1/(E0+E1) softens the effective depth and the
        # contact point sits where the two pressure fields balance.
        self.hydroelastic = bool(hydroelastic)
        # persistent incremental manifolds (reference:
        # geometry/multicontact.py:118 BodyProjector + :134
        # IncrementalPlaneTracker): contact points/normals are anchored in
        # the two shapes' local frames and carried frame to frame; a slot
        # whose projected anchors still overlap (small tangential slide,
        # aligned normal) KEEPS its cached geometry instead of the freshly
        # sampled one, so solver Jacobians and warm-started impulses stay
        # consistent across frames — the property that makes tall stacks
        # stable. TPU-first: no hashtable matcher, the static slot layout is
        # the correspondence; persistence is three gathers + where-selects.
        self.persistent_manifolds = bool(persistent_manifolds)
        self.manifold_slide_tol = float(manifold_slide_tol)
        st = model.structure
        self.rigid_contact_max = st.rigid_contact_max
        self.soft_contact_max = st.soft_contact_max
        # dynamic-pair mode (reference: runtime broad phase, collide.py:
        # 1391-1410 + broad_phase_sap.py:410): instead of one static slot
        # range per candidate pair (O(S^2) buffer growth), each type class
        # keeps a fixed budget of pair entries; per frame the nearest
        # overlapping candidates are compacted into them with lax.top_k and
        # the overflow count is surfaced on Contacts.broad_phase_dropped.
        # "auto" switches to dynamic when the static pair count exceeds the
        # budget. Slot->shape identity becomes per-frame (traced) — use
        # maximal-coordinate solvers (XPBD/VBD), which read bodies from
        # contact shape indices; the generalized solver's static per-slot
        # plan requires mode="static".
        n_pairs = len(st.candidate_pairs)
        if dynamic_pair_budget is None:
            dynamic_pair_budget = max(64, 8 * st.shape_count)
        self.dynamic_pair_budget = int(dynamic_pair_budget)
        # SAP broad phase (reference: geometry/broad_phase_sap.py:410,
        # launch :523): per-class segmented sweep-and-prune replaces the
        # O(n_pairs) overlap scoring of "topk" with an O(shapes * window)
        # sorted sweep — the win for piles of hundreds of moving shapes
        # where the precomputed pair list is quadratic. Worlds are kept
        # contiguous in the sort with per-world key offsets (the reference's
        # per-world segmenting).
        if broad_phase not in ("topk", "sap"):
            raise ValueError(f"broad_phase must be 'topk' or 'sap', "
                             f"got {broad_phase!r}")
        self.broad_phase = broad_phase
        self.sap_axis = int(sap_axis)
        self.sap_window = int(sap_window)
        if mode == "auto":
            mode = "dynamic" if n_pairs > self.dynamic_pair_budget \
                else "static"
        self.mode = mode
        if mode == "dynamic":
            self._build_dynamic(model)
            return

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
                pc = classes[key] = _PairClass(fn, swapped, k,
                                               types01=(t0, t1))
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
        self._unsupported = unsupported

        # mesh/convex pairs: sample-vs-SDF classes
        self.mesh_classes = _install_mesh_classes(self)
        mt = (int(GeoType.MESH), int(GeoType.CONVEX), int(GeoType.HFIELD))
        unsupported = {(t0, t1) for (t0, t1) in self._unsupported
                       if t0 not in mt and t1 not in mt}
        if unsupported:
            import warnings
            warnings.warn(
                f"collision pairs with unsupported type classes skipped: {sorted(unsupported)}")

        # soft contacts: particle vs shape pairs
        sp = getattr(st, "soft_pairs", np.zeros((0, 2), dtype=np.int32))
        self.soft_particle = sp[:, 0]
        self.soft_shape = sp[:, 1]

    # ------------------------------------------------------------------
    def _build_dynamic(self, model: Model):
        """Group candidate pairs by type class with fixed pair budgets
        (dynamic-pair mode; see __init__)."""
        st = model.structure
        types = st.shape_type
        pairs = st.candidate_pairs
        classes: Dict[Tuple[int, int, bool], _PairClass] = {}
        unsupported = set()
        mt = (int(GeoType.MESH), int(GeoType.HFIELD))
        pt_ = int(GeoType.PLANE)
        mt_full = (int(GeoType.MESH), int(GeoType.HFIELD),
                   int(GeoType.CONVEX))
        prim_t = (int(GeoType.SPHERE), int(GeoType.BOX), int(GeoType.CAPSULE),
                  int(GeoType.CYLINDER), int(GeoType.CONE),
                  int(GeoType.ELLIPSOID))
        sdf_id_np = np.asarray(st.shape_sdf_id)
        tex_id_np = np.asarray(getattr(st, "shape_sdf_tex_id",
                                       np.full(st.shape_count, -1)))
        has_sdf = (sdf_id_np >= 0) | (tex_id_np >= 0)
        for i, (a, b) in enumerate(pairs):
            t0, t1 = int(types[a]), int(types[b])
            if t0 in mt or t1 in mt:
                # runtime mesh/heightfield routing (VERDICT r3 #3; the
                # reference routes every pair type through its runtime
                # pipeline, narrow_phase.py:2236): budgeted top-K candidate
                # selection feeding the same sample-vs-SDF contact math as
                # static mode, with traced shape indices
                from ..geometry.narrow_phase import pair_slot_count
                k = pair_slot_count(t0, t1)
                m_is_0 = t0 in mt
                mesh_shape = int(a) if m_is_0 else int(b)
                other_t = t1 if m_is_0 else t0
                if pt_ in (t0, t1):
                    side = 0 if t0 == pt_ else 1
                    key = ("pm", side, k)
                    pc = classes.get(key)
                    if pc is None:
                        pc = classes[key] = _PairClass(
                            None, False, k, kind="plane_mesh")
                elif (t0 in mt_full or t0 in mt) and \
                        (t1 in mt_full or t1 in mt):
                    # mesh-mesh / mesh-convex: both sides sample into the
                    # other's baked SDF — require the bakes up front
                    for s_i in (int(a), int(b)):
                        if not has_sdf[s_i]:
                            raise ValueError(
                                f"dynamic-pair mode: shape {s_i} (type "
                                f"{int(types[s_i])}) is used as an SDF "
                                "contact side but has no baked SDF grid; "
                                "set sdf_max_resolution on the shape config")
                    key = ("mm2", k)
                    pc = classes.get(key)
                    if pc is None:
                        pc = classes[key] = _PairClass(
                            None, False, k, kind="mesh_mesh")
                elif other_t in prim_t:
                    key = ("mp", other_t, m_is_0, k)
                    pc = classes.get(key)
                    if pc is None:
                        pc = classes[key] = _PairClass(
                            None, False, k, kind="mesh_prim",
                            types01=(t0, t1))
                        pc.bidir = True
                    # bidirectional (primitive samples vs mesh SDF) only
                    # when every mesh in the class carries a baked SDF
                    pc.bidir = bool(pc.bidir and has_sdf[mesh_shape])
                else:
                    unsupported.add((t0, t1))
                    continue
                pc.pair_idx.append(i)
                pc.shape0.append(int(a))
                pc.shape1.append(int(b))
                continue
            if int(GeoType.CONVEX) in (t0, t1):
                from ..geometry.narrow_phase import pair_slot_count
                k = pair_slot_count(t0, t1)
                pt_ = int(GeoType.PLANE)
                if pt_ in (t0, t1):
                    # plane-convex: hull vertices vs plane SDF — own class,
                    # so the convex MPR class stays plane-free and the
                    # plane-height cull below is type-homogeneous (fixes the
                    # mixed-class cull that dropped convex-convex contacts)
                    side = 0 if t0 == pt_ else 1
                    key = (-2, -2, side)
                    pc = classes.get(key)
                    if pc is None:
                        pc = classes[key] = _PairClass(
                            None, False, k, kind="plane_convex")
                else:
                    # support-map MPR, keyed by the static type pair so each
                    # class mixes hull and analytic supports consistently
                    key = (-1, t0, t1)
                    pc = classes.get(key)
                    if pc is None:
                        pc = classes[key] = _PairClass(
                            None, False, k, kind="support", types01=(t0, t1))
                pc.pair_idx.append(i)
                pc.shape0.append(int(a))
                pc.shape1.append(int(b))
                continue
            fn, swapped, k = contact_fn_for(t0, t1)
            if fn is None:
                unsupported.add((t0, t1))
                continue
            key = (min(t0, t1), max(t0, t1), swapped)
            pc = classes.get(key)
            if pc is None:
                pc = classes[key] = _PairClass(fn, swapped, k,
                                               types01=(t0, t1))
            pc.pair_idx.append(i)
            pc.shape0.append(int(a))
            pc.shape1.append(int(b))
        if unsupported:
            import warnings
            warnings.warn("collision pairs with unsupported type classes "
                          f"skipped: {sorted(unsupported)}")
        self.classes = list(classes.values())
        self.mesh_classes = []
        self._unsupported = unsupported
        # infinite planes: center-distance culling is meaningless (the
        # plane's "center" is wherever it was authored) and a resting scene
        # needs every shape-on-ground contact live at once, so plane classes
        # get their full pair count (bounded by O(shape_count)) and only the
        # finite-shape classes share the dynamic budget.
        pt = int(GeoType.PLANE)
        for pc in self.classes:
            pc.plane_side = None
            if len(pc.shape0):
                # only type-homogeneous classes qualify for the plane-height
                # cull (classes are keyed by type pair, so np.all is a
                # safety net, not a per-pair decision)
                s0t = types[np.asarray(pc.shape0, dtype=np.int32)]
                s1t = types[np.asarray(pc.shape1, dtype=np.int32)]
                if np.all(s0t == pt):
                    pc.plane_side = 0
                elif np.all(s1t == pt):
                    pc.plane_side = 1
        n_total = sum(len(pc.pair_idx) for pc in self.classes
                      if pc.plane_side is None) or 1
        budget = self.dynamic_pair_budget
        offset = 0
        for pc in self.classes:
            n_c = len(pc.pair_idx)
            if pc.plane_side is not None:
                cap = n_c
            else:
                cap = min(n_c, max(8, (budget * n_c + n_total - 1) // n_total))
            pc.cap = cap
            pc.shape0 = np.asarray(pc.shape0, dtype=np.int32)
            pc.shape1 = np.asarray(pc.shape1, dtype=np.int32)
            pc.out_offsets = (offset + np.arange(cap * pc.slots, dtype=np.int32)
                              ).reshape(cap, pc.slots)
            offset += cap * pc.slots
        self.rigid_contact_max = offset
        if self.broad_phase == "sap":
            self._build_sap(model)
        sp = getattr(st, "soft_pairs", np.zeros((0, 2), dtype=np.int32))
        self.soft_particle = sp[:, 0]
        self.soft_shape = sp[:, 1]

    def _build_sap(self, model: Model):
        """Per-class SAP metadata: unique member shapes, per-world sort-key
        offsets, and the class's candidate-pair membership matrix
        (reference: broad_phase_sap.py:410 — the per-world segmented sweep;
        here segmenting is a sort-key offset so one lax.sort covers all
        worlds)."""
        st = model.structure
        S = st.shape_count
        world = np.asarray(st.shape_world)
        for pc in self.classes:
            if pc.plane_side is not None:
                continue   # planes keep their full-pair analytic cull
            u = np.unique(np.concatenate([pc.shape0, pc.shape1]))
            member = np.zeros((S, S), dtype=bool)
            member[pc.shape0, pc.shape1] = True
            member |= member.T
            # per-world segment offsets keep the sweep window from leaking
            # across worlds; a shape in world -1 (shared across worlds)
            # forces a global sort (correctness over segmenting)
            if (world[u] < 0).any():
                off = np.zeros(len(u), dtype=np.float32)
            else:
                off = world[u].astype(np.float32) * 1e6
            pc.sap = (u.astype(np.int32), off, jnp.asarray(member))

    def _sap_candidates(self, pc, lo_s, hi_s):
        """Windowed sweep-and-prune candidates for one type class.

        Returns traced (i0, i1, near, n_near) with exactly ``pc.cap``
        entries, type-oriented to the class's static (t0, t1)."""
        import jax
        ax = self.sap_axis
        u, off, member = pc.sap
        m = len(u)
        w = max(1, min(self.sap_window, m - 1))
        offj = jnp.asarray(off, dtype=lo_s.dtype)
        x = lo_s[u, ax] + offj
        hkey = hi_s[u, ax] + offj
        order = jnp.argsort(x)
        us = jnp.asarray(u)[order]
        xs = x[order]
        hs = hkey[order]
        idx = jnp.arange(m)[:, None] + jnp.arange(1, w + 1)[None, :]  # (m,w)
        inb = idx < m
        idxc = jnp.minimum(idx, m - 1)
        a = jnp.broadcast_to(us[:, None], (m, w))
        b = us[idxc]
        sweep = xs[idxc] <= hs[:, None]          # neighbor min <= my max
        ov = (jnp.minimum(hi_s[b], hi_s[a])
              - jnp.maximum(lo_s[b], lo_s[a]))   # (m, w, 3)
        sep = jnp.min(ov, axis=-1)
        mem = member[a, b]
        valid = inb & sweep & mem & (sep > 0.0)
        score = jnp.where(valid, sep, -jnp.inf).reshape(-1)
        n_near = jnp.sum(valid.astype(jnp.int32))
        k = min(pc.cap, m * w)
        _, sel = jax.lax.top_k(score, k)
        af = a.reshape(-1)[sel]
        bf = b.reshape(-1)[sel]
        near = valid.reshape(-1)[sel]
        if k < pc.cap:
            pad = pc.cap - k
            af = jnp.concatenate([af, jnp.zeros(pad, dtype=af.dtype)])
            bf = jnp.concatenate([bf, jnp.zeros(pad, dtype=bf.dtype)])
            near = jnp.concatenate([near, jnp.zeros(pad, dtype=bool)])
        t01 = pc.types01
        if t01 is not None and t01[0] != t01[1]:
            types = np.asarray(self.model.structure.shape_type)
            mt = (int(GeoType.MESH), int(GeoType.HFIELD))
            if (t01[0] in mt) != (t01[1] in mt):
                # mesh/prim classes can mix MESH and HFIELD on the mesh
                # side — orient by mesh-ness, not exact type
                a_is_mesh = jnp.asarray(np.isin(types, mt))[af]
                swap = a_is_mesh != (t01[0] in mt)
            else:
                swap = jnp.asarray(types)[af] != t01[0]
            i0 = jnp.where(swap, bf, af)
            i1 = jnp.where(swap, af, bf)
        else:
            i0, i1 = af, bf
        return i0, i1, near, n_near

    def _collide_dynamic(self, state: State, out: Contacts) -> Contacts:
        """Dynamic-pair collide: per class, top-k nearest overlapping
        candidates into the class's budgeted slots; overflow counted."""
        import jax
        model = self.model
        dtype = state.body_q.dtype
        st = model.structure
        margin = self.rigid_contact_margin
        # exact per-type AABBs from the broad-phase module: tighter culling
        # than center-distance for elongated shapes in clustered scenes
        # (reference runs its AABB kernel before every broad phase,
        # collide.py:1357)
        from ..geometry.broad_phase import compute_shape_aabbs
        lo_s, hi_s, X_ws = compute_shape_aabbs(model, state, margin)

        dropped = jnp.zeros((), dtype=jnp.int32)
        samples_dropped = jnp.zeros((), dtype=jnp.int32)
        for pc in self.classes:
            i0s, i1s = pc.shape0, pc.shape1              # static (n_c,)
            if pc.sap is not None:
                i0, i1, near_sel, n_near = self._sap_candidates(pc, lo_s,
                                                                hi_s)
                dropped = dropped + jnp.maximum(n_near - pc.cap, 0)
            elif pc.plane_side is not None:
                # signed height of the finite shape's center above the
                # plane (local +Z), not AABB overlap — the plane's authored
                # origin is arbitrary for an infinite plane
                pl, other = ((i0s, i1s) if pc.plane_side == 0
                             else (i1s, i0s))
                from ..math import quat_rotate as _qr
                n_w = _qr(X_ws[pl][:, 3:7],
                          jnp.array([0.0, 0.0, 1.0], dtype=dtype))
                h = jnp.sum(n_w * (X_ws[other][:, 0:3] - X_ws[pl][:, 0:3]),
                            axis=-1)
                rsum = model.shape_collision_radius[other] + margin
                near = h < rsum
                score = jnp.where(near, rsum - h, -jnp.inf)
            else:
                ov = (jnp.minimum(hi_s[i1s], hi_s[i0s])
                      - jnp.maximum(lo_s[i1s], lo_s[i0s]))   # (n_c, 3)
                sep = jnp.min(ov, axis=-1)   # > 0 when AABBs overlap
                near = sep > 0.0
                score = jnp.where(near, sep, -jnp.inf)
            if pc.sap is None:
                n_near = jnp.sum(near.astype(jnp.int32))
                dropped = dropped + jnp.maximum(n_near - pc.cap, 0)
                _, sel = jax.lax.top_k(score, pc.cap)    # (cap,) traced
                i0 = jnp.asarray(i0s)[sel]
                i1 = jnp.asarray(i1s)[sel]
                near_sel = near[sel]
            if pc.kind == "plane_convex":
                # hull vertices vs plane SDF: deepest-K vertex contacts
                from ..geometry.narrow_phase import _plane_sdf
                hulls = jnp.asarray(st.shape_hull_verts, dtype=dtype)
                ip = i0 if pc.plane_side == 0 else i1
                ic = i1 if pc.plane_side == 0 else i0
                verts_w = transform_point(X_ws[ic][:, None, :], hulls[ic])
                d, n_pl = _plane_sdf(X_ws[ip][:, None, :], verts_w)
                k = min(pc.slots, d.shape[1])
                negd, sel = jax.lax.top_k(-d, k)             # deepest verts
                p_sel = jnp.take_along_axis(verts_w, sel[..., None], axis=1)
                d_sel = -negd
                # padded hulls repeat vertices — drop duplicate picks
                dup = jnp.zeros(d_sel.shape, dtype=bool)
                for ii in range(1, k):
                    for jj in range(ii):
                        close = jnp.sum((p_sel[:, ii] - p_sel[:, jj]) ** 2,
                                        axis=-1) < 1e-12
                        dup = dup.at[:, ii].set(dup[:, ii] | close)
                depth = jnp.where(dup, -1e9, -d_sel)
                pos = p_sel - n_pl * (d_sel[..., None] * 0.5)
                nrm = jnp.broadcast_to(n_pl, pos.shape)
                if pc.plane_side == 1:
                    nrm = -nrm           # normal must point shape0 -> shape1
                idx = pc.out_offsets[:, :k]
            elif pc.kind == "plane_mesh":
                # mesh/heightfield surface samples vs the plane's SDF
                from ..geometry.narrow_phase import _plane_sdf
                ip = i0 if pc.plane_side == 0 else i1
                im = i1 if pc.plane_side == 0 else i0
                pts_l = model.shape_sample_points[im]          # (c, K, 3)
                pts_w = transform_point(X_ws[im][:, None, :], pts_l)
                d, n_pl = _plane_sdf(X_ws[ip][:, None, :], pts_w)
                thick_c = (model.shape_thickness[i0]
                           + model.shape_thickness[i1])[:, None]
                k = pc.slots
                nrm_b = jnp.broadcast_to(n_pl, pts_w.shape)
                pos, nrm, depth, drop_s = _reduce_k(
                    self, pts_w, nrm_b, -d, k, thick_c)
                samples_dropped = samples_dropped + drop_s
                if pc.plane_side == 1:
                    nrm = -nrm           # normal must point shape0 -> shape1
                idx = pc.out_offsets[:, :k]
            elif pc.kind == "mesh_prim":
                # mesh samples vs the primitive's analytic SDF, plus (when
                # the mesh has a baked SDF) the primitive's samples vs the
                # mesh SDF — the static-mode "ma" class with traced indices
                t0c, t1c = pc.types01
                mt_ = (int(GeoType.MESH), int(GeoType.HFIELD))
                m_is_0 = t0c in mt_
                im = i0 if m_is_0 else i1
                io = i1 if m_is_0 else i0
                t_other = t1c if m_is_0 else t0c
                cap, K = im.shape[0], model.shape_sample_points.shape[1]
                pts_l = model.shape_sample_points[im]
                pts_w = transform_point(X_ws[im][:, None, :], pts_l)
                p_in_o = transform_point_inv(X_ws[io][:, None, :], pts_w)
                scale_o = model.shape_scale[io]
                d, g_loc = _shape_sdf(
                    np.full(cap * K, t_other, dtype=np.int32),
                    p_in_o.reshape(cap * K, 3),
                    jnp.broadcast_to(scale_o[:, None, :],
                                     (cap, K, 3)).reshape(cap * K, 3),
                    dtype)
                d = d.reshape(cap, K)
                n_w = quat_rotate(X_ws[io][:, None, 3:7],
                                  g_loc.reshape(cap, K, 3))  # outward of other
                thick_c = (model.shape_thickness[i0]
                           + model.shape_thickness[i1])[:, None]
                # normal 0 -> 1: mesh side first means -outward-of-other
                if pc.bidir:
                    half = pc.slots // 2
                    posA, nA, depA, dA_ = _reduce_k(
                        self, pts_w, n_w, -d, half, thick_c)
                    pts_lo = model.shape_sample_points[io]
                    pts_wo = transform_point(X_ws[io][:, None, :], pts_lo)
                    p_in_m = transform_point_inv(X_ws[im][:, None, :], pts_wo)
                    dm, gm = _sdf_of_mesh_traced(model, im, p_in_m)
                    n_wm = quat_rotate(X_ws[im][:, None, 3:7], gm)  # out of mesh
                    posB, nB, depB, dB_ = _reduce_k(
                        self, pts_wo, -n_wm, -dm, pc.slots - half, thick_c)
                    samples_dropped = samples_dropped + dA_ + dB_
                    pos = jnp.concatenate([posA, posB], axis=1)
                    n_out = jnp.concatenate([nA, nB], axis=1)
                    depth = jnp.concatenate([depA, depB], axis=1)
                else:
                    pos, n_out, depth, dA_ = _reduce_k(
                        self, pts_w, n_w, -d, pc.slots, thick_c)
                    samples_dropped = samples_dropped + dA_
                nrm = -n_out if m_is_0 else n_out
                idx = pc.out_offsets
            elif pc.kind == "mesh_mesh":
                # both directions: samples of each side vs the other's
                # baked SDF (traced twin of the static "mm" class)
                thick_c = (model.shape_thickness[i0]
                           + model.shape_thickness[i1])[:, None]
                pts0 = transform_point(X_ws[i0][:, None, :],
                                       model.shape_sample_points[i0])
                p0_in_1 = transform_point_inv(X_ws[i1][:, None, :], pts0)
                d01, g01 = _sdf_of_mesh_traced(model, i1, p0_in_1)
                out1 = quat_rotate(X_ws[i1][:, None, 3:7], g01)  # out of i1
                pts1 = transform_point(X_ws[i1][:, None, :],
                                       model.shape_sample_points[i1])
                p1_in_0 = transform_point_inv(X_ws[i0][:, None, :], pts1)
                d10, g10 = _sdf_of_mesh_traced(model, i0, p1_in_0)
                out0 = quat_rotate(X_ws[i0][:, None, 3:7], g10)  # out of i0
                half = pc.slots // 2
                posA, nA, depA, dA_ = _reduce_k(
                    self, pts0, -out1, -d01, half, thick_c)  # n: 0 -> 1
                posB, nB, depB, dB_ = _reduce_k(
                    self, pts1, out0, -d10, pc.slots - half, thick_c)
                samples_dropped = samples_dropped + dA_ + dB_
                pos = jnp.concatenate([posA, posB], axis=1)
                nrm = jnp.concatenate([nA, nB], axis=1)
                depth = jnp.concatenate([depA, depB], axis=1)
                idx = pc.out_offsets
            elif pc.kind == "support":
                # generic support-map MPR manifolds: hull verts for
                # CONVEX/MESH sides, analytic supports otherwise
                from ..geometry.mpr import support_manifold
                from ..geometry.support import make_support, support_center
                t0c, t1c = pc.types01
                hull_t = (int(GeoType.CONVEX), int(GeoType.MESH))
                hulls = jnp.asarray(st.shape_hull_verts, dtype=dtype)
                v0 = hulls[i0] if t0c in hull_t else None
                v1 = hulls[i1] if t1c in hull_t else None
                supA = make_support(t0c, X_ws[i0], model.shape_scale[i0], v0)
                supB = make_support(t1c, X_ws[i1], model.shape_scale[i1], v1)
                ca = support_center(t0c, X_ws[i0], model.shape_scale[i0], v0)
                cb = support_center(t1c, X_ws[i1], model.shape_scale[i1], v1)
                pos, nrm, depth = support_manifold(supA, supB, ca, cb)
                k = min(pc.slots, pos.shape[1])
                if k < pos.shape[1]:
                    top, sel = jax.lax.top_k(depth, k)
                    pos = jnp.take_along_axis(pos, sel[..., None], axis=1)
                    nrm = jnp.take_along_axis(nrm, sel[..., None], axis=1)
                    depth = top
                else:
                    pos, nrm, depth = pos[:, :k], nrm[:, :k], depth[:, :k]
                idx = pc.out_offsets[:, :k]
            else:
                a, b = (i1, i0) if pc.swapped else (i0, i1)
                pos, nrm, depth = pc.fn(X_ws[a], X_ws[b],
                                        model.shape_scale[a],
                                        model.shape_scale[b])
                if pc.swapped:
                    nrm = -nrm
                idx = pc.out_offsets
            thick = model.shape_thickness[i0] + model.shape_thickness[i1]
            depth = depth + thick[:, None]
            active = (depth > -margin) & near_sel[:, None]
            out = out.replace(
                rigid_contact_mask=out.rigid_contact_mask.at[idx].set(active),
                rigid_contact_position=out.rigid_contact_position.at[idx].set(pos),
                rigid_contact_normal=out.rigid_contact_normal.at[idx].set(nrm),
                rigid_contact_depth=out.rigid_contact_depth.at[idx].set(
                    jnp.where(active, depth, 0.0)),
                rigid_contact_shape0=out.rigid_contact_shape0.at[idx].set(
                    jnp.where(active, i0[:, None].astype(jnp.int32), -1)),
                rigid_contact_shape1=out.rigid_contact_shape1.at[idx].set(
                    jnp.where(active, i1[:, None].astype(jnp.int32), -1)),
            )
        out = out.replace(broad_phase_dropped=dropped,
                          mesh_samples_dropped=out.mesh_samples_dropped
                          + samples_dropped)
        if self.soft_contact_max > 0 and len(self.soft_particle):
            out = self._collide_soft(state, out)
        return out

    # ------------------------------------------------------------------
    def contacts(self) -> Contacts:
        """Allocate a zeroed Contacts buffer sized for this pipeline."""
        out = Contacts.zeros(self.rigid_contact_max, self.soft_contact_max,
                             dtype=self.model.body_q.dtype)
        if self.persistent_manifolds:
            # anchor buffers present from the start so a lax.scan carrying
            # Contacts has a stable pytree structure from step 0
            C = self.rigid_contact_max
            dtype = self.model.body_q.dtype
            z3 = jnp.zeros((C, 3), dtype=dtype)
            out = out.replace(custom={**out.custom, "manifold:a0": z3,
                                      "manifold:a1": z3, "manifold:n0": z3})
        return out

    # ------------------------------------------------------------------
    def collide(self, state: State,
                contacts: Optional[Contacts] = None,
                prev: Optional[Contacts] = None) -> Contacts:
        """Generate contacts for the current state (reference: collide.py:1296).

        Pure function of (model, state); the optional ``contacts`` argument is
        accepted for API parity with the reference's in-place signature and
        only supplies the capacity. With ``persistent_manifolds`` enabled,
        pass the previous frame's Contacts as ``prev`` to carry anchored
        contact points forward (reference: geometry/multicontact.py:118).
        """
        model = self.model
        dtype = state.body_q.dtype
        C = self.rigid_contact_max
        P = self.soft_contact_max
        out = Contacts.zeros(C, P, dtype=dtype) if contacts is None else \
            Contacts.zeros(contacts.rigid_contact_max, contacts.soft_contact_max,
                           dtype=dtype)

        if self.mode == "dynamic":
            out = self._collide_dynamic(state, out)
            if self.persistent_manifolds:
                out = self._apply_persistence(state, out, prev)
            return out

        if C > 0 and (self.classes or self.mesh_classes):
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
            for pc in self.mesh_classes:
                if pc.kind == "cc":
                    out = _convex_contacts(self, pc, X_ws, out)
                else:
                    out = _mesh_contacts(self, pc, X_ws, out)

        if P > 0 and len(self.soft_particle):
            out = self._collide_soft(state, out)
        if self.persistent_manifolds:
            out = self._apply_persistence(state, out, prev)
        return out

    # ------------------------------------------------------------------
    def _shape_world_transforms(self, state: State) -> jnp.ndarray:
        """World transform of every shape frame (static shapes: identity
        body transform composed with the authored local offset)."""
        model = self.model
        dtype = state.body_q.dtype
        sb = model.structure.shape_body
        identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
        if model.body_count == 0:
            X_body = jnp.broadcast_to(identity, (len(sb), 7))
        else:
            body_idx = np.maximum(sb, 0)
            is_static = jnp.asarray(sb < 0)[:, None]
            X_body = jnp.where(is_static, identity, state.body_q[body_idx])
        return transform_multiply(X_body, model.shape_transform)

    # ------------------------------------------------------------------
    def _apply_persistence(self, state: State, out: Contacts,
                           prev: Optional[Contacts]) -> Contacts:
        """Persistent incremental manifolds (reference:
        geometry/multicontact.py:118 BodyProjector, :134
        IncrementalPlaneTracker — redesigned for static slots).

        Surface anchor points (one on each shape, in that shape's local
        frame) and the contact normal (in shape0's frame) are stored per
        slot. On the next frame the anchors are projected through the
        current shape transforms; a slot keeps its cached geometry when

        - it was valid last frame AND the fresh narrow phase re-activated it,
        - the projected anchor pair has slid apart tangentially less than
          ``manifold_slide_tol`` x the smaller shape's collision radius,
        - the cached normal still agrees with the fresh one (cos > 0.9),
        - the recomputed gap along the cached normal is within the margin.

        Depth is then recomputed from the projected anchors, so kept
        contacts track the bodies' actual relative motion while their
        points/normals stay fixed in body frames — frame-coherent Jacobians
        are what make warm-started stacks stable.
        """
        dtype = state.body_q.dtype
        X_ws = self._shape_world_transforms(state)
        s0 = jnp.maximum(out.rigid_contact_shape0, 0)
        s1 = jnp.maximum(out.rigid_contact_shape1, 0)
        X0, X1 = X_ws[s0], X_ws[s1]
        pos = out.rigid_contact_position
        nrm = out.rigid_contact_normal
        dep = out.rigid_contact_depth
        # fresh surface anchors: split the overlap segment at the midpoint
        # contact position (depth > 0 penetrating, normal shape0 -> shape1)
        p0s = pos + nrm * (dep * 0.5)[:, None]
        p1s = pos - nrm * (dep * 0.5)[:, None]
        a0 = transform_point_inv(X0, p0s)
        a1 = transform_point_inv(X1, p1s)
        n0 = quat_rotate_inv(X0[:, 3:7], nrm)
        if prev is not None and "manifold:a0" in prev.custom:
            pa0 = transform_point(X0, prev.custom["manifold:a0"])
            pa1 = transform_point(X1, prev.custom["manifold:a1"])
            pn = quat_rotate(X0[:, 3:7], prev.custom["manifold:n0"])
            # gap measured along the FRESH normal: cached points stabilize
            # lever arms, but the contact plane follows the live narrow
            # phase (a stale plane redirects the penetration bias into the
            # tangent space and pumps energy into sliding)
            g = pa1 - pa0
            gn = jnp.sum(g * nrm, axis=-1)         # signed gap (<0 overlap)
            slide = g - nrm * gn[:, None]
            slide2 = jnp.sum(slide * slide, axis=-1)
            r0 = self.model.shape_collision_radius[s0]
            r1 = self.model.shape_collision_radius[s1]
            tol = self.manifold_slide_tol * jnp.minimum(r0, r1)
            align = jnp.sum(pn * nrm, axis=-1)
            new_dep = -gn
            keep = (prev.rigid_contact_mask & out.rigid_contact_mask
                    # dynamic mode reassigns slots per frame (traced
                    # top-k): a slot only keeps its cache if it still
                    # holds the SAME pair (identity in static mode)
                    & (prev.rigid_contact_shape0 == out.rigid_contact_shape0)
                    & (prev.rigid_contact_shape1 == out.rigid_contact_shape1)
                    & (slide2 < tol * tol) & (align > 0.98)
                    & (jnp.abs(new_dep - dep)
                       < 2.0 * self.rigid_contact_margin + 0.1 * tol)
                    & (new_dep > -self.rigid_contact_margin))
            k3 = keep[:, None]
            pos = jnp.where(k3, (pa0 + pa1) * 0.5, pos)
            dep = jnp.where(keep, new_dep, dep)
            a0 = jnp.where(k3, prev.custom["manifold:a0"], a0)
            a1 = jnp.where(k3, prev.custom["manifold:a1"], a1)
            n0 = jnp.where(k3, prev.custom["manifold:n0"], n0)
        custom = dict(out.custom)
        custom.update({"manifold:a0": a0, "manifold:a1": a1,
                       "manifold:n0": n0})
        return out.replace(rigid_contact_position=pos,
                           rigid_contact_normal=nrm,
                           rigid_contact_depth=dep, custom=custom)

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
        identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
        if model.body_count == 0:
            X_body = jnp.broadcast_to(identity, (len(si), 7))
        else:
            body_idx = np.maximum(sb, 0)
            is_static = jnp.asarray(sb < 0)[:, None]
            X_body = jnp.where(is_static, identity, state.body_q[body_idx])
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


def _safe_norm(x, eps=1e-9):
    """L2 norm along the last axis with a finite gradient at 0 (the VJP of
    jnp.linalg.norm at exactly 0 is 0/0 = NaN, which contaminates branch-
    free where-selects even when the branch is untaken)."""
    n2 = jnp.sum(x * x, axis=-1)
    return jnp.sqrt(jnp.maximum(n2, eps * eps))


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
    # NOTE on safe norms: every branch below is evaluated for EVERY point
    # (where-select), and jnp.linalg.norm has a 0/0 = NaN VJP at exactly 0
    # — a point on the capsule axis or at the sphere center NaNs the
    # gradient of the SELECTED branch through jnp.where (zero cotangent
    # times NaN is NaN). _safe_norm clips the squared norm before the
    # sqrt so the backward pass stays finite everywhere.
    # sphere
    r = _safe_norm(p_local)
    d_sphere = r - scale[:, 0]
    g_sphere = p_local / r[:, None]
    # box
    d_box, g_box = _box_sdf_local(p_local, scale)
    # capsule (axis Z, radius s0, half-height s1)
    z = jnp.clip(p_local[:, 2], -scale[:, 1], scale[:, 1])
    closest = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1)
    dc = p_local - closest
    dist_c = _safe_norm(dc)
    d_cap = dist_c - scale[:, 0]
    g_cap = dc / dist_c[:, None]

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


def match_contacts(prev: Contacts, curr: Contacts):
    """Frame-to-frame contact correspondence and new/broken events.

    The reference needs a hashtable matcher (geometry/contact_match.py:623
    ContactMatcher) because its contacts land at arbitrary compacted indices
    each frame. Here every contact lives at a build-time-static slot, so
    correspondence is the identity and the events are two mask ops.

    Returns ``(matched, new, broken)`` boolean slot masks (all jit-safe).
    """
    matched = prev.rigid_contact_mask & curr.rigid_contact_mask
    new = curr.rigid_contact_mask & ~prev.rigid_contact_mask
    broken = prev.rigid_contact_mask & ~curr.rigid_contact_mask
    return matched, new, broken


def collide(model: Model, state: State,
            pipeline: Optional[CollisionPipeline] = None,
            contacts: Optional[Contacts] = None) -> Contacts:
    """Convenience one-shot collide (reference: Model.collide, model.py:1987)."""
    if pipeline is None:
        pipeline = CollisionPipeline(model)
    return pipeline.collide(state, contacts)


class _MeshPairClass:
    """Mesh/convex pairs: fixed-budget sample points vs SDF (analytic or
    baked grid). ``mesh_first`` marks whether shape0 is the mesh side."""

    __slots__ = ("slots", "mesh_idx", "other_idx", "mesh_first", "out_offsets",
                 "mesh_mesh", "kind")

    def __init__(self, slots, mesh_mesh, kind="mesh"):
        self.slots = slots
        self.mesh_mesh = mesh_mesh
        self.kind = kind
        self.mesh_idx = []
        self.other_idx = []
        self.mesh_first = []
        self.out_offsets = []


def _install_mesh_classes(pipeline: "CollisionPipeline"):
    """Group MESH/CONVEX candidate pairs into sample-vs-SDF classes
    (replaces the reference's triangle-pair expansion narrow phase with the
    fixed-budget SDF-sample design, reference narrow_phase.py / sdf_contact.py)."""
    st = pipeline.model.structure
    types = st.shape_type
    pairs = st.candidate_pairs
    slots = st.candidate_pair_slots
    # heightfields ride the same machinery: baked height-function SDF +
    # surface sample points (reference: narrow_phase.py heightfield kernels)
    mesh_types = (int(GeoType.MESH), int(GeoType.CONVEX),
                  int(GeoType.HFIELD))
    analytic = (int(GeoType.PLANE), int(GeoType.SPHERE), int(GeoType.BOX),
                int(GeoType.CAPSULE), int(GeoType.CYLINDER), int(GeoType.CONE),
                int(GeoType.ELLIPSOID))
    classes: Dict[Tuple, _MeshPairClass] = {}
    mpr_ok = (int(GeoType.CONVEX), int(GeoType.BOX))
    for i, (a, b) in enumerate(pairs):
        t0, t1 = int(types[a]), int(types[b])
        in0, in1 = t0 in mesh_types, t1 in mesh_types
        if not (in0 or in1):
            continue
        from ..geometry.narrow_phase import pair_slot_count
        k = pair_slot_count(t0, t1)
        if (t0 in mpr_ok and t1 in mpr_ok
                and int(GeoType.CONVEX) in (t0, t1)):
            # convex-convex / convex-box: direct MPR penetration manifold,
            # no SDF bake (geometry/mpr.py; reference mpr.py:1-635 +
            # multicontact.py:118)
            key = ("cc", k)
            pc = classes.setdefault(key, _MeshPairClass(k, False, kind="cc"))
            pc.mesh_idx.append(int(a))
            pc.other_idx.append(int(b))
            pc.mesh_first.append(True)
        elif in0 and in1:
            key = ("mm", k)
            pc = classes.setdefault(key, _MeshPairClass(k, True))
            pc.mesh_idx.append(int(a))
            pc.other_idx.append(int(b))
            pc.mesh_first.append(True)
        else:
            if in0 and t1 in analytic:
                mesh, other, mf = int(a), int(b), True
            elif in1 and t0 in analytic:
                mesh, other, mf = int(b), int(a), False
            else:
                continue
            # bidirectional when the mesh has a baked SDF: both the mesh's
            # samples (vs the primitive's analytic SDF) and the primitive's
            # samples (vs the mesh SDF) contribute — required when the mesh
            # is large and static (terrain) and the primitive small
            # (planes are excluded: infinite, no meaningful sample points —
            # all K samples degenerate to the origin and would stack K
            # duplicate contacts on the same spot)
            t_other = t1 if in0 else t0
            bidir = ((int(st.shape_sdf_id[mesh]) >= 0
                      or int(getattr(st, "shape_sdf_tex_id",
                                     np.full(1, -1))[mesh]) >= 0)
                     and t_other != int(GeoType.PLANE))
            key = ("ma", k, bidir)
            pc = classes.setdefault(key, _MeshPairClass(k, bidir))
            pc.mesh_idx.append(mesh)
            pc.other_idx.append(other)
            pc.mesh_first.append(mf)
        pc.out_offsets.append(int(slots[i]))
    out = []
    for pc in classes.values():
        pc.mesh_idx = np.asarray(pc.mesh_idx, dtype=np.int32)
        pc.other_idx = np.asarray(pc.other_idx, dtype=np.int32)
        pc.mesh_first = np.asarray(pc.mesh_first, dtype=bool)
        offs = np.asarray(pc.out_offsets, dtype=np.int32)
        pc.out_offsets = offs[:, None] + np.arange(pc.slots, dtype=np.int32)[None, :]
        out.append(pc)
    return out


def _mesh_contacts(pipeline: "CollisionPipeline", pc: _MeshPairClass,
                   X_ws, out: Contacts) -> Contacts:
    """Sample-point narrow phase for one mesh pair class."""
    import jax
    from ..geometry.sdf import sample_sdf_grid, sample_sdf_grad
    model = pipeline.model
    st = model.structure
    dtype = X_ws.dtype
    mi, oi = pc.mesh_idx, pc.other_idx
    n = len(mi)
    K = model.shape_sample_points.shape[1]

    X_m = X_ws[mi]
    X_o = X_ws[oi]
    pts_local = model.shape_sample_points[mi]                # (n, K, 3)
    pts_w = transform_point(X_m[:, None, :], pts_local)      # (n, K, 3)
    p_in_o = transform_point_inv(X_o[:, None, :], pts_w)

    if pc.mesh_mesh:
        # both directions: points of A vs SDF of B, points of B vs SDF of A
        sid_o = st.shape_sdf_id[oi]
        sid_m = st.shape_sdf_id[mi]
        dA, gA = _sdf_of_shape(model, oi, sid_o, p_in_o)
        outA = quat_rotate(X_o[:, None, 3:7], gA)            # outward of oi
        nA = -outA                                           # mi -> oi (0 -> 1)
        pts_local_o = model.shape_sample_points[oi]
        pts_w_o = transform_point(X_o[:, None, :], pts_local_o)
        p_in_m = transform_point_inv(X_m[:, None, :], pts_w_o)
        dB, gB = _sdf_of_shape(model, mi, sid_m, p_in_m)
        outB = quat_rotate(X_m[:, None, 3:7], gB)            # outward of mi
        nB = outB                                            # mi -> oi (0 -> 1)
        half = pc.slots // 2
        thick_ab = (model.shape_thickness[mi]
                    + model.shape_thickness[oi])[:, None]
        f_slots = None
        if pipeline.hydroelastic:
            # move each sample to the equal-pressure surface between the two
            # elastic bodies: t = pen * kh_other / (kh_self + kh_other) along
            # the other shape's outward normal (reference
            # sdf_hydroelastic.py:240; pressure balance kh_m*tA == kh_o*tB)
            Em = model.shape_material_kh[mi][:, None]
            Eo = model.shape_material_kh[oi][:, None]
            fA = (Eo / jnp.maximum(Em + Eo, 1e-12))[..., None]
            fB = (Em / jnp.maximum(Em + Eo, 1e-12))[..., None]
            penA = jnp.maximum(-dA, 0.0)[..., None]
            penB = jnp.maximum(-dB, 0.0)[..., None]
            pts_w = pts_w + outA * penA * fA
            pts_w_o = pts_w_o + outB * penB * fB
            # per-sample patch force = keff * penetration * projected cell
            # area (linear pressure law, reference sdf_hydroelastic.py:147;
            # vector areas give the divergence-theorem-exact projection of
            # each Voronoi cell onto the contact plane). The pressure field
            # is integrated over the FINER-sampled side only — the
            # reference integrates ONE iso-pressure surface; summing both
            # directions would double-count the patch, and a coarse side's
            # huge Voronoi cells would overshoot small patches.
            keff = Em * Eo / jnp.maximum(Em + Eo, 1e-12)
            vaA = quat_rotate(X_m[:, None, 3:7],
                              model.shape_sample_areas[mi])
            aeffA = jnp.maximum(-jnp.sum(vaA * outA, axis=-1), 0.0)
            vaB = quat_rotate(X_o[:, None, 3:7],
                              model.shape_sample_areas[oi])
            aeffB = jnp.maximum(-jnp.sum(vaB * outB, axis=-1), 0.0)
            fmagA = keff * jnp.maximum(-dA + thick_ab, 0.0) * aeffA
            fmagB = keff * jnp.maximum(-dB + thick_ab, 0.0) * aeffB
            cell = st.shape_sample_cell_area
            finerA = jnp.asarray(cell[mi] <= cell[oi])[:, None]   # static
            pos_c = jnp.where(finerA[..., None], pts_w, pts_w_o)
            nrm_c = jnp.where(finerA[..., None], nA, nB)
            pen_c = jnp.where(finerA, -dA, -dB)
            fmag_c = jnp.where(finerA, fmagA, fmagB)
            pos, nrm, depth, f_slots, samples_dropped = _reduce_k_hydro(
                pipeline, pos_c, nrm_c, pen_c, fmag_c, pc.slots, thick_ab)
        else:
            posA, nrmA, depA, dropA = _reduce_k(pipeline, pts_w, nA, -dA,
                                                half, thick_ab)
            posB, nrmB, depB, dropB = _reduce_k(pipeline, pts_w_o, nB, -dB,
                                                pc.slots - half, thick_ab)
            samples_dropped = dropA + dropB
            pos = jnp.concatenate([posA, posB], axis=1)
            nrm = jnp.concatenate([nrmA, nrmB], axis=1)
            depth = jnp.concatenate([depA, depB], axis=1)
        swap = ~jnp.asarray(pc.mesh_first)[:, None, None]
        nrm = jnp.where(swap, -nrm, nrm)
    else:
        d, g_loc = _sdf_of_shape(model, oi, st.shape_sdf_id[oi], p_in_o,
                                 analytic_only=True)
        n_w = quat_rotate(X_o[:, None, 3:7], g_loc)          # outward from other
        # normal 0 -> 1: mesh_first means shape0 = mesh, so normal points
        # from mesh toward other = -outward
        thick_ab = (model.shape_thickness[mi]
                    + model.shape_thickness[oi])[:, None]
        f_slots = None
        if pipeline.hydroelastic:
            Em = model.shape_material_kh[mi][:, None]
            Eo = model.shape_material_kh[oi][:, None]
            frac = (Eo / jnp.maximum(Em + Eo, 1e-12))[..., None]
            pts_w = pts_w + n_w * jnp.maximum(-d, 0.0)[..., None] * frac
            keff = Em * Eo / jnp.maximum(Em + Eo, 1e-12)
            va = quat_rotate(X_m[:, None, 3:7],
                             model.shape_sample_areas[mi])
            aeff = jnp.maximum(-jnp.sum(va * n_w, axis=-1), 0.0)
            fmag = keff * jnp.maximum(-d + thick_ab, 0.0) * aeff
            pos, nrm_out, depth, f_slots, samples_dropped = _reduce_k_hydro(
                pipeline, pts_w, n_w, -d, fmag, pc.slots, thick_ab)
        else:
            pos, nrm_out, depth, samples_dropped = _reduce_k(
                pipeline, pts_w, n_w, -d, pc.slots, thick_ab)
        mf = jnp.asarray(pc.mesh_first)[:, None, None]
        nrm = jnp.where(mf, -nrm_out, nrm_out)

    # shift contact point to the overlap midpoint along the normal
    thick = (model.shape_thickness[mi] + model.shape_thickness[oi])[:, None]
    depth = depth + thick
    active = depth > -pipeline.rigid_contact_margin

    idx = pc.out_offsets
    s0 = np.where(pc.mesh_first, pc.mesh_idx, pc.other_idx)
    s1 = np.where(pc.mesh_first, pc.other_idx, pc.mesh_idx)
    stiff_all = out.rigid_contact_stiffness
    if f_slots is not None:
        # export the patch integral as a linear contact stiffness: solving
        # F = c * depth at the generating penetration reproduces
        # integral(p dA) exactly (reference sdf_hydroelastic.py:1528-1539);
        # non-penetrating margin slots keep a small stabilizing stiffness
        # (reference margin_contact_area * k_eff)
        khm = model.shape_material_kh[mi][:, None]
        kho = model.shape_material_kh[oi][:, None]
        keff_pair = khm * kho / jnp.maximum(khm + kho, 1e-12)
        stiff = jnp.maximum(f_slots / jnp.maximum(depth, 1e-6),
                            keff_pair * 1e-4)
        stiff_all = stiff_all.at[idx].set(jnp.where(active, stiff, 0.0))
    return out.replace(
        rigid_contact_mask=out.rigid_contact_mask.at[idx].set(active),
        rigid_contact_position=out.rigid_contact_position.at[idx].set(pos),
        rigid_contact_normal=out.rigid_contact_normal.at[idx].set(nrm),
        rigid_contact_depth=out.rigid_contact_depth.at[idx].set(
            jnp.where(active, depth, 0.0)),
        rigid_contact_shape0=out.rigid_contact_shape0.at[idx].set(
            jnp.broadcast_to(jnp.asarray(s0, dtype=jnp.int32)[:, None], idx.shape)),
        rigid_contact_shape1=out.rigid_contact_shape1.at[idx].set(
            jnp.broadcast_to(jnp.asarray(s1, dtype=jnp.int32)[:, None], idx.shape)),
        rigid_contact_stiffness=stiff_all,
        mesh_samples_dropped=out.mesh_samples_dropped + samples_dropped,
    )


def _convex_contacts(pipeline: "CollisionPipeline", pc: _MeshPairClass,
                     X_ws, out: Contacts) -> Contacts:
    """MPR penetration manifolds for convex-convex / convex-box pairs
    (geometry/mpr.py; reference mpr.py + multicontact.py:118). Works from
    hull vertex clouds — no SDF bake involved."""
    from ..geometry.mpr import convex_manifold
    model = pipeline.model
    st = model.structure
    dtype = X_ws.dtype
    ai, bi = pc.mesh_idx, pc.other_idx
    hulls = jnp.asarray(st.shape_hull_verts, dtype=dtype)    # (S, H, 3)
    pos, nrm, depth = convex_manifold(hulls[ai], X_ws[ai],
                                      hulls[bi], X_ws[bi])
    k = min(pc.slots, pos.shape[1])
    pos, nrm, depth = pos[:, :k], nrm[:, :k], depth[:, :k]

    thick = (model.shape_thickness[ai] + model.shape_thickness[bi])[:, None]
    depth = depth + thick
    active = depth > -pipeline.rigid_contact_margin

    idx = pc.out_offsets[:, :k]
    s0 = np.asarray(ai, dtype=np.int32)
    s1 = np.asarray(bi, dtype=np.int32)
    return out.replace(
        rigid_contact_mask=out.rigid_contact_mask.at[idx].set(active),
        rigid_contact_position=out.rigid_contact_position.at[idx].set(pos),
        rigid_contact_normal=out.rigid_contact_normal.at[idx].set(nrm),
        rigid_contact_depth=out.rigid_contact_depth.at[idx].set(
            jnp.where(active, depth, 0.0)),
        rigid_contact_shape0=out.rigid_contact_shape0.at[idx].set(
            jnp.broadcast_to(jnp.asarray(s0)[:, None], idx.shape)),
        rigid_contact_shape1=out.rigid_contact_shape1.at[idx].set(
            jnp.broadcast_to(jnp.asarray(s1)[:, None], idx.shape)),
    )


def _top_k(pos, nrm, depth, k):
    """Keep the k deepest sample contacts per pair (n, K, ...) -> (n, k, ...)."""
    import jax
    vals, idx = jax.lax.top_k(depth, k)
    take = lambda arr: jnp.take_along_axis(arr, idx[..., None], axis=1)
    return take(pos), take(nrm), vals


def _reduce_k_hydro(pipeline, pos, nrm, pen, fmag, k, thick):
    """Hydroelastic twin of :func:`_reduce_k`: wrench-conserving reduction
    (geometry/contact_reduction.py reduce_contact_set_hydro; reference
    contact_reduction_hydroelastic.py:1459). ``fmag`` is the per-sample
    integrated force area_i * pressure_i; the returned ``f`` per slot is
    the cluster aggregate, so sum(f) == the patch force integral.
    Returns (pos, nrm, depth, f, n_dropped)."""
    active = (pen + thick) > -pipeline.rigid_contact_margin
    act_per_pair = jnp.sum(active.astype(jnp.int32), axis=-1)
    dropped = jnp.sum(jnp.maximum(act_per_pair - k, 0))
    if pen.shape[-1] <= k:
        import jax
        vals, idx = jax.lax.top_k(pen, k)
        take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1)
        f = jnp.take_along_axis(jnp.where(active, fmag, 0.0), idx, axis=-1)
        return (take(pos), take(nrm), vals, f, jnp.zeros((), jnp.int32))
    from ..geometry.contact_reduction import reduce_contact_set_hydro
    p, n, d, f = reduce_contact_set_hydro(pos, nrm, pen, fmag, k,
                                          active=active)
    return p, n, d, f, dropped


def _reduce_k(pipeline, pos, nrm, pen, k, thick):
    """Diverse representative selection for oversampled mesh contacts
    (geometry/contact_reduction.py; reference GlobalContactReducer,
    contact_reduction_global.py:755). Falls back to plain top-k when the
    candidate count does not exceed the slot budget. Returns
    (pos, nrm, depth, n_dropped) — n_dropped counts in-contact samples that
    did not fit the slot budget (reference surfaces the same overflow,
    collide.py:883-889), so a thin manifold on a big mesh fails loudly
    instead of quietly."""
    active = (pen + thick) > -pipeline.rigid_contact_margin
    act_per_pair = jnp.sum(active.astype(jnp.int32), axis=-1)
    dropped = jnp.sum(jnp.maximum(act_per_pair - k, 0))
    if pen.shape[-1] <= k:
        return (*_top_k(pos, nrm, pen, k), jnp.zeros((), jnp.int32))
    from ..geometry.contact_reduction import reduce_contact_set
    return (*reduce_contact_set(pos, nrm, pen, k, active=active), dropped)


def _sdf_of_mesh_traced(model, idx, p_local):
    """Signed distance + gradient of baked mesh/heightfield SDFs at local
    points, with TRACED shape indices (dynamic-pair mode; the static-mode
    twin is `_sdf_of_shape`). Every shape reachable through ``idx`` must
    carry a baked grid or texture SDF — validated at pipeline build time.

    idx: (n,) traced shape indices; p_local: (n, K, 3).
    """
    import jax
    from ..geometry.sdf import sample_sdf_grad, sample_sdf_grid
    st = model.structure
    dtype = p_local.dtype
    n, K = p_local.shape[0], p_local.shape[1]
    sid_all = jnp.asarray(np.asarray(st.shape_sdf_id), jnp.int32)
    tex_np = getattr(st, "shape_sdf_tex_id", None)
    if tex_np is None:
        tex_np = np.full(st.shape_count, -1, dtype=np.int32)
    tex_all = jnp.asarray(np.asarray(tex_np), jnp.int32)
    sid = sid_all[idx]
    tid = tex_all[idx]
    d = jnp.full((n, K), 1e9, dtype=dtype)
    g = jnp.zeros((n, K, 3), dtype=dtype).at[..., 2].set(1.0)
    if model.sdf_grids.shape[0] > 0:
        s = jnp.maximum(sid, 0)
        grids = model.sdf_grids[s]
        lo, up = model.sdf_lower[s], model.sdf_upper[s]
        d_gr = jax.vmap(sample_sdf_grid)(grids, lo, up, p_local)
        g_gr = jax.vmap(sample_sdf_grad)(grids, lo, up, p_local)
        g_gr = g_gr / _safe_norm(g_gr)[..., None]
        use = (sid >= 0)[:, None]
        d = jnp.where(use, d_gr, d)
        g = jnp.where(use[..., None], g_gr, g)
    if model.sdf_tex_block_index.shape[0] > 0:
        from ..geometry.sdf_texture import sample_texture_sdf
        t = jnp.maximum(tid, 0)

        def samp(bi, co, lo, up, p):
            return sample_texture_sdf(bi, model.sdf_tex_blocks,
                                      model.sdf_tex_scale,
                                      model.sdf_tex_offset,
                                      co, lo, up, p)

        args = (model.sdf_tex_block_index[t], model.sdf_tex_coarse[t],
                model.sdf_tex_lower[t], model.sdf_tex_upper[t])
        d_tx = jax.vmap(samp)(*args, p_local)
        eps = jnp.asarray(1e-3, dtype=dtype)
        offs = jnp.stack([jnp.eye(3, dtype=dtype) * eps,
                          -jnp.eye(3, dtype=dtype) * eps])
        d6 = jax.vmap(lambda bi, co, lo, up, p: samp(
            bi, co, lo, up,
            p[None, None, :, :] + offs[:, :, None, :]))(*args, p_local)
        g_tx = jnp.moveaxis((d6[:, 0] - d6[:, 1]) / (2 * eps), 1, -1)
        g_tx = g_tx / _safe_norm(g_tx)[..., None]
        use = (tid >= 0)[:, None]
        d = jnp.where(use, d_tx, d)
        g = jnp.where(use[..., None], g_tx, g)
    return d, g


def _sdf_of_shape(model, shape_idx, sdf_id, p_local, analytic_only=False):
    """Signed distance + gradient of shapes at local points (n, K, 3):
    analytic for primitives, trilinear grid for baked mesh SDFs."""
    from ..geometry.sdf import sample_sdf_grad, sample_sdf_grid
    st = model.structure
    types = st.shape_type[shape_idx]
    tex_all = getattr(st, "shape_sdf_tex_id", None)
    if tex_all is None:
        tex_all = np.full(st.shape_count, -1, dtype=np.int32)
    tex_id = np.asarray(tex_all)[np.asarray(shape_idx)]
    if not analytic_only:
        # a mesh-typed shape with no baked grid would silently fall into
        # the capsule branch of _shape_sdf — wrong physics; fail loudly
        mesh_like = np.isin(np.asarray(types),
                            [int(GeoType.MESH), int(GeoType.CONVEX),
                             int(GeoType.HFIELD)])
        missing = mesh_like & (np.asarray(sdf_id) < 0) & (tex_id < 0)
        if missing.any():
            raise ValueError(
                "mesh/convex/heightfield shapes "
                f"{np.asarray(shape_idx)[missing].tolist()} are used as an "
                "SDF contact side but have no baked SDF grid; set "
                "sdf_max_resolution on the shape config or route the pair "
                "through the MPR convex path")
    scale = model.shape_scale[shape_idx][:, None, :]
    n, K = p_local.shape[0], p_local.shape[1]
    flat = p_local.reshape(n * K, 3)
    d_an, g_an = _shape_sdf(np.repeat(types, K), flat,
                            jnp.broadcast_to(scale, (n, K, 3)).reshape(n * K, 3),
                            p_local.dtype)
    d_an = d_an.reshape(n, K)
    g_an = g_an.reshape(n, K, 3)
    has_tex = (not analytic_only and (tex_id >= 0).any()
               and model.sdf_tex_block_index.shape[0] > 0)
    if analytic_only or ((np.asarray(sdf_id) < 0).all()
                         and not has_tex) or (
            model.sdf_grids.shape[0] == 0 and not has_tex):
        return d_an, g_an
    import jax
    d, g = d_an, g_an
    if (np.asarray(sdf_id) >= 0).any() and model.sdf_grids.shape[0] > 0:
        sid = np.maximum(sdf_id, 0)
        grids = model.sdf_grids[sid]                         # (n, R, R, R)
        d_gr = jax.vmap(lambda g_, lo, up, p: sample_sdf_grid(g_, lo, up, p))(
            grids, model.sdf_lower[sid], model.sdf_upper[sid], p_local)
        g_gr = jax.vmap(lambda g_, lo, up, p: sample_sdf_grad(g_, lo, up, p))(
            grids, model.sdf_lower[sid], model.sdf_upper[sid], p_local)
        g_gr = g_gr / _safe_norm(g_gr)[..., None]
        use_grid = jnp.asarray(sdf_id >= 0)[:, None]
        d = jnp.where(use_grid, d_gr, d)
        g = jnp.where(use_grid[..., None], g_gr, g)
    if has_tex:
        # sparse quantized texture sampling (geometry/sdf_texture.py;
        # reference sdf_texture.py:126) — shared global blocks pool,
        # per-shape block index / coarse far field
        from ..geometry.sdf_texture import sample_texture_sdf
        tid = np.maximum(tex_id, 0)

        def samp(bi, co, lo, up, p):
            return sample_texture_sdf(bi, model.sdf_tex_blocks,
                                      model.sdf_tex_scale,
                                      model.sdf_tex_offset,
                                      co, lo, up, p)

        args = (model.sdf_tex_block_index[tid], model.sdf_tex_coarse[tid],
                model.sdf_tex_lower[tid], model.sdf_tex_upper[tid])
        d_tx = jax.vmap(samp)(*args, p_local)
        eps = jnp.asarray(1e-3, dtype=p_local.dtype)
        offs = jnp.stack([jnp.eye(3, dtype=p_local.dtype) * eps,
                          -jnp.eye(3, dtype=p_local.dtype) * eps])  # (2,3,3)
        d6 = jax.vmap(lambda bi, co, lo, up, p: samp(
            bi, co, lo, up,
            p[None, None, :, :] + offs[:, :, None, :]))(*args, p_local)
        g_tx = (d6[:, 0] - d6[:, 1]) / (2 * eps)        # (n, 3, K)
        g_tx = jnp.moveaxis(g_tx, 1, -1)                 # (n, K, 3)
        g_tx = g_tx / _safe_norm(g_tx)[..., None]
        use_tex = jnp.asarray(tex_id >= 0)[:, None]
        d = jnp.where(use_tex, d_tx, d)
        g = jnp.where(use_tex[..., None], g_tx, g)
    return d, g
