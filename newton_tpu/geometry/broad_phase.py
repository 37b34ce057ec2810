"""Runtime broad phases: AABB computation, all-pairs, sweep-and-prune.

TPU-native re-design of reference newton/_src/geometry/broad_phase_nxn.py:230
(BroadPhaseAllPairs/BroadPhaseExplicit) and broad_phase_sap.py:410. The
default pipeline precomputes candidate pairs at finalize (EXPLICIT mode) —
these classes serve *dynamic* scenes: they produce a fixed-capacity pair
list each step from current AABBs, deterministically (sorted extraction, no
atomics).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math import quat_rotate, transform_multiply
from .types import GeoType

__all__ = ["compute_shape_aabbs", "BroadPhaseAllPairs", "BroadPhaseSAP",
           "BroadPhaseExplicit"]


def compute_shape_aabbs(model, state, margin: float = 0.0):
    """World-space AABBs for all shapes (reference: collide.py:1357 fused
    AABB kernel). Exact per-type extents for primitives (box: |R| @ half;
    capsule/cylinder/cone: axis-projected; ellipsoid: row-norm of R*S);
    conservative collision-radius bounds for mesh/convex/heightfield and
    planes. Shape types are static, so the per-type extents are where-
    selected branch-free."""
    from ..math import quat_to_matrix
    st = model.structure
    dtype = state.body_q.dtype
    sb = st.shape_body
    identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
    if model.body_count:
        X_body = jnp.where(jnp.asarray(sb < 0)[:, None], identity,
                           state.body_q[np.maximum(sb, 0)])
    else:
        X_body = jnp.broadcast_to(identity, (st.shape_count, 7))
    X_ws = transform_multiply(X_body, model.shape_transform)
    center = X_ws[:, 0:3]
    r_bound = model.shape_collision_radius                     # (S,)
    t = np.asarray(st.shape_type)
    s = model.shape_scale                                      # (S, 3)
    R = quat_to_matrix(X_ws[:, 3:7])                           # (S, 3, 3)
    absR = jnp.abs(R)
    az = jnp.abs(R[:, :, 2])                                   # |world z-axis|
    r0 = s[:, 0:1]
    hh = s[:, 1:2]
    ext_sphere = jnp.broadcast_to(r0, center.shape)
    ext_box = jnp.einsum("sij,sj->si", absR, s)
    ext_capsule = az * hh + r0
    # cylinder/cone: hh along the axis, radius in the orthogonal plane
    ext_cyl = az * hh + jnp.sqrt(jnp.maximum(1.0 - az * az, 0.0)) * r0
    ext_ell = jnp.sqrt(jnp.einsum("sij,sj->si", R * R, s * s))
    ext_rad = jnp.broadcast_to(r_bound[:, None], center.shape)

    def m(gt):
        return jnp.asarray(t == int(gt))[:, None]

    ext = ext_rad
    ext = jnp.where(m(GeoType.SPHERE), ext_sphere, ext)
    ext = jnp.where(m(GeoType.BOX), ext_box, ext)
    ext = jnp.where(m(GeoType.CAPSULE), ext_capsule, ext)
    ext = jnp.where(m(GeoType.CYLINDER) | m(GeoType.CONE), ext_cyl, ext)
    ext = jnp.where(m(GeoType.ELLIPSOID), ext_ell, ext)
    ext = ext + margin
    lo = center - ext
    hi = center + ext
    return lo, hi, X_ws


class _PairFilter:
    """Static (S, S) collidability matrix (world/group/flags/body rules)."""

    def __init__(self, model):
        st = model.structure
        S = st.shape_count
        ok = np.zeros((S, S), dtype=bool)
        from ..sim.builder import ModelBuilder  # for rule parity only
        for a in range(S):
            for b in range(a + 1, S):
                ok[a, b] = _should_collide_static(st, a, b)
        self.ok = ok


def _should_collide_static(st, a, b):
    from .flags import ShapeFlags
    COLL = int(ShapeFlags.COLLIDE_SHAPES)
    if st.shape_body[a] == st.shape_body[b]:
        return False
    if st.shape_body[a] < 0 and st.shape_body[b] < 0:
        return False
    if not (st.shape_flags[a] & COLL) or not (st.shape_flags[b] & COLL):
        return False
    wa, wb = st.shape_world[a], st.shape_world[b]
    if wa != -1 and wb != -1 and wa != wb:
        return False
    ga, gb = st.shape_collision_group[a], st.shape_collision_group[b]
    if ga == 0 or gb == 0:
        return False
    if ga > 0 and not (ga == gb or gb < 0):
        return False
    if ga < 0 and ga == gb:
        return False
    if (min(a, b), max(a, b)) in st.shape_filter_pairs:
        return False
    return True


class BroadPhaseAllPairs:
    """All-pairs AABB overlap with static culling
    (reference: broad_phase_nxn.py:230, launch :318).

    ``launch(model, state)`` returns (pairs (max_pairs, 2) int32, mask):
    the top-max_pairs overlapping collidable pairs, deterministically ordered
    by flat pair index.
    """

    def __init__(self, model, max_pairs: Optional[int] = None,
                 margin: float = 0.01):
        self.model = model
        S = model.structure.shape_count
        self.filter = _PairFilter(model)
        self.max_pairs = max_pairs or max(4 * S, 64)
        self.margin = float(margin)
        iu = np.triu_indices(S, k=1)
        keep = self.filter.ok[iu]
        self.cand_a = iu[0][keep].astype(np.int32)
        self.cand_b = iu[1][keep].astype(np.int32)

    def launch(self, state) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lo, hi, _ = compute_shape_aabbs(self.model, state, self.margin)
        a, b = self.cand_a, self.cand_b
        overlap = jnp.all((lo[a] <= hi[b]) & (lo[b] <= hi[a]), axis=-1)
        k = min(self.max_pairs, len(a))
        # deterministic fixed-capacity extraction: overlapping pairs first,
        # stable by candidate order
        order = jnp.argsort(~overlap, stable=True)[:k]
        pairs = jnp.stack([jnp.asarray(a)[order], jnp.asarray(b)[order]],
                          axis=-1)
        mask = overlap[order]
        return pairs.astype(jnp.int32), mask


class BroadPhaseSAP:
    """Sweep-and-prune along one axis (reference: broad_phase_sap.py:410).

    Sorts AABB minima along ``axis`` and tests each shape against its next
    ``window`` neighbors in sorted order — O(S * window) with static shapes.
    """

    def __init__(self, model, axis: int = 0, window: int = 16,
                 margin: float = 0.01):
        self.model = model
        self.axis = int(axis)
        self.window = int(window)
        self.margin = float(margin)
        S = model.structure.shape_count
        self.filter_ok = jnp.asarray(_PairFilter(model).ok)
        self.max_pairs = S * self.window

    def launch(self, state) -> Tuple[jnp.ndarray, jnp.ndarray]:
        model = self.model
        S = model.structure.shape_count
        lo, hi, _ = compute_shape_aabbs(model, state, self.margin)
        order = jnp.argsort(lo[:, self.axis])
        lo_s = lo[order]
        hi_s = hi[order]
        k = jnp.arange(1, self.window + 1)
        j = jnp.minimum(jnp.arange(S)[:, None] + k[None, :], S - 1)  # (S, w)
        a = jnp.broadcast_to(order[:, None], (S, self.window))
        b = order[j]
        # sweep condition: neighbor's min along axis <= my max
        sweep = lo_s[j][:, :, self.axis] <= hi_s[:, None, self.axis]
        box = jnp.all((lo[a] <= hi[b]) & (lo[b] <= hi[a]), axis=-1)
        ok = self.filter_ok[jnp.minimum(a, b), jnp.maximum(a, b)]
        valid = sweep & box & ok & (a != b)
        pairs = jnp.stack([jnp.minimum(a, b), jnp.maximum(a, b)],
                          axis=-1).reshape(-1, 2)
        return pairs.astype(jnp.int32), valid.reshape(-1)


class BroadPhaseExplicit:
    """Precomputed-pair mode (reference: broad_phase_nxn.py:426): the
    model's finalize-time candidate list, masked by AABB overlap."""

    def __init__(self, model, margin: float = 0.01):
        self.model = model
        self.pairs = model.structure.candidate_pairs
        self.margin = float(margin)

    def launch(self, state) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lo, hi, _ = compute_shape_aabbs(self.model, state, self.margin)
        a = self.pairs[:, 0]
        b = self.pairs[:, 1]
        overlap = jnp.all((lo[a] <= hi[b]) & (lo[b] <= hi[a]), axis=-1)
        return jnp.asarray(self.pairs, dtype=jnp.int32), overlap
