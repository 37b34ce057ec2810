# Contact reduction: pick spatially/directionally diverse representative
# contacts from an oversampled candidate set.
#
# TPU-native replacement for the reference's hashtable GlobalContactReducer
# (contact_reduction_global.py:755), which bins mesh-mesh contact floods by
# (shape pair, normal bin) and keeps per-bin spatial extremes + max depth.
# Our collision pipeline is static-slotted per pair, so the reduction
# becomes a per-pair greedy selection with a diversity radius: each pick
# maximizes depth + spacing * min-distance-to-already-picked, where the
# distance metric mixes position and normal disagreement. This has the
# same effect as bin+extremes (deepest contact always survives; clustered
# duplicates are suppressed; manifold corners/extremes get picked next)
# but is branch-free, shape-static, and O(slots * K) — ideal under jit.

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1.0e30
# inactive-candidate penalty: must DOMINATE depth+bonus scores yet stay
# small enough that adding an O(1) diversity bonus is not absorbed by
# float32 rounding (-1e30 + 1 == -1e30 exactly, which made every
# past-the-active-set argmax tie resolve to candidate 0 and emit
# duplicate slots at one point — an 8x over-weighted corner constraint)
_INACTIVE = -1.0e6


def reduce_contact_set(pos, nrm, depth, k, *, spacing: float = 1.0,
                       normal_weight: float = 0.5, active=None):
    """Greedy diverse top-k selection of contact candidates.

    Args:
        pos: (..., K, 3) candidate contact positions.
        nrm: (..., K, 3) candidate unit normals.
        depth: (..., K) penetration depth (positive = penetrating). The
            selection score is depth-first, so the deepest candidate is
            always slot 0 (matching the reference's unconditional
            max-depth slot per bin).
        k: number of representatives to keep (static).
        spacing: weight of the diversity bonus, in depth units per meter.
            The characteristic candidate-cloud extent is measured in-trace
            and normalizes the distance, so `spacing` is dimensionless
            relative to the deepest-depth scale.
        normal_weight: how much a normal disagreement (1 - n.n') counts
            relative to one cloud-extent of positional distance.
        active: optional (..., K) bool; inactive candidates are never
            picked unless a row has fewer than k active candidates (the
            extra picks surface with their original `depth`, which the
            caller's margin test then rejects).

    Returns:
        (pos_k, nrm_k, depth_k): representative set, (..., k, ...) arrays.
    """
    K = depth.shape[-1]
    k = int(min(k, K))
    # characteristic extent of the candidate cloud, for scale invariance
    extent = jnp.maximum(
        (pos.max(axis=-2) - pos.min(axis=-2)).max(axis=-1), 1e-6)   # (...,)
    inv_ext = (spacing / extent)[..., None]                          # (...,1)
    # diversity metric feeds only argmax/argmin picks; computing it on
    # stop-gradient views keeps norm's NaN-at-zero VJP out of the backward
    pos_sg = jax.lax.stop_gradient(pos)
    nrm_sg = jax.lax.stop_gradient(nrm)

    base = depth if active is None else jnp.where(active, depth, _INACTIVE)
    taken = jnp.zeros(depth.shape, bool)
    min_div = jnp.full(depth.shape, jnp.inf)
    picks = []
    for s in range(k):
        bonus = jnp.where(jnp.isinf(min_div), 0.0, min_div)
        score = base + bonus
        if s > 0:
            # an exact duplicate of an already-picked candidate (padded
            # repeat samples) adds no manifold information but WOULD add a
            # duplicate constraint row — demote it below every fresh pick
            score = jnp.where(min_div < 1e-9, _INACTIVE + score, score)
        score = jnp.where(taken, _NEG, score)
        idx = jnp.argmax(score, axis=-1)                             # (...)
        picks.append(idx)
        onehot = jax.nn.one_hot(idx, K, dtype=bool)
        taken = taken | onehot
        if s == k - 1:
            break
        p_sel = jnp.take_along_axis(pos_sg, idx[..., None, None],
                                    axis=-2)                         # (...,1,3)
        n_sel = jnp.take_along_axis(nrm_sg, idx[..., None, None], axis=-2)
        d_pos = jnp.linalg.norm(pos_sg - p_sel, axis=-1) * inv_ext
        d_nrm = (1.0 - (nrm_sg * n_sel).sum(-1)) * normal_weight * spacing
        min_div = jnp.minimum(min_div, d_pos + d_nrm)
    idx = jnp.stack(picks, axis=-1)                                  # (..., k)
    take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-2)
    return take(pos), take(nrm), jnp.take_along_axis(depth, idx, axis=-1)


def reduce_contact_set_hydro(pos, nrm, depth, fmag, k, *,
                             spacing: float = 1.0,
                             normal_weight: float = 0.5, active=None):
    """Hydroelastic (wrench-conserving) contact reduction.

    TPU-native equivalent of the reference's HydroelasticContactReduction
    (contact_reduction_hydroelastic.py:1459): the reference keeps top-K
    faces per normal bin but lets EVERY penetrating face contribute to the
    aggregate force/center-of-pressure terms, so reducing the patch never
    loses total wrench. Here: pick ``k`` diverse representatives with the
    same greedy rule as :func:`reduce_contact_set`, then cluster every
    active candidate to its nearest representative (position + normal
    metric) and aggregate per cluster:

      f_k   = sum of cluster members' ``fmag`` (area * pressure),
      pos_k = fmag-weighted centroid (the cluster's center of pressure),
      nrm_k = fmag-weighted mean normal, renormalized.

    Total patch force is conserved exactly (sum f_k == sum fmag over
    active candidates) and the per-cluster centers of pressure preserve
    the torque to first order.

    Returns (pos_k, nrm_k, depth_k, f_k); depth_k is the representative's
    own geometric depth (for the solver's constraint), f_k the cluster's
    integrated normal force.
    """
    K = depth.shape[-1]
    k = int(min(k, K))
    extent = jnp.maximum(
        (pos.max(axis=-2) - pos.min(axis=-2)).max(axis=-1), 1e-6)
    inv_ext = (spacing / extent)[..., None]
    pos_sg = jax.lax.stop_gradient(pos)
    nrm_sg = jax.lax.stop_gradient(nrm)

    base = depth if active is None else jnp.where(active, depth, _INACTIVE)
    taken = jnp.zeros(depth.shape, bool)
    min_div = jnp.full(depth.shape, jnp.inf)
    picks = []
    divs = []                                    # (..., K) per pick
    for s in range(k):
        bonus = jnp.where(jnp.isinf(min_div), 0.0, min_div)
        score = base + bonus
        if s > 0:
            # duplicate-candidate demotion: see reduce_contact_set
            score = jnp.where(min_div < 1e-9, _INACTIVE + score, score)
        score = jnp.where(taken, _NEG, score)
        idx = jnp.argmax(score, axis=-1)
        picks.append(idx)
        onehot = jax.nn.one_hot(idx, K, dtype=bool)
        taken = taken | onehot
        p_sel = jnp.take_along_axis(pos_sg, idx[..., None, None], axis=-2)
        n_sel = jnp.take_along_axis(nrm_sg, idx[..., None, None], axis=-2)
        d_pos = jnp.linalg.norm(pos_sg - p_sel, axis=-1) * inv_ext
        d_nrm = (1.0 - (nrm_sg * n_sel).sum(-1)) * normal_weight * spacing
        div = d_pos + d_nrm
        divs.append(div)
        min_div = jnp.minimum(min_div, div)
    idx = jnp.stack(picks, axis=-1)                                  # (..., k)
    dist = jnp.stack(divs, axis=-1)                                  # (..., K, k)
    # nearest-representative clustering, fmag-weighted aggregation
    assign = jax.nn.one_hot(jnp.argmin(dist, axis=-1), k,
                            dtype=pos.dtype)                         # (..., K, k)
    w = fmag if active is None else jnp.where(active, fmag, 0.0)
    wk = assign * w[..., None]                                       # (..., K, k)
    f_k = wk.sum(axis=-2)                                            # (..., k)
    # where-based safe denominator: a maximum(f_k, 1e-20) floor NaNs the
    # BACKWARD pass — the division VJP computes num/safe^2 and (1e-20)^2
    # flushes to zero in float32, giving 0/0 for empty clusters
    has_f = (f_k > 1e-12)[..., None]
    safe = jnp.where(has_f[..., 0], f_k, 1.0)[..., None]
    pos_k = jnp.einsum("...Kk,...Kc->...kc", wk, pos) / safe
    nrm_k = jnp.einsum("...Kk,...Kc->...kc", wk, nrm)
    nrm_k = nrm_k * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(nrm_k * nrm_k, axis=-1, keepdims=True), 1e-12))
    # clusters with zero force keep the representative's own geometry so
    # margin-range (not yet penetrating) slots stay meaningful
    rep_pos = jnp.take_along_axis(pos, idx[..., None], axis=-2)
    rep_nrm = jnp.take_along_axis(nrm, idx[..., None], axis=-2)
    pos_k = jnp.where(has_f, pos_k, rep_pos)
    nrm_k = jnp.where(has_f, nrm_k, rep_nrm)
    depth_k = jnp.take_along_axis(depth, idx, axis=-1)
    return pos_k, nrm_k, depth_k, f_k
