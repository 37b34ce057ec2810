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

    base = depth if active is None else jnp.where(active, depth, _NEG)
    taken = jnp.zeros(depth.shape, bool)
    min_div = jnp.full(depth.shape, jnp.inf)
    picks = []
    for s in range(k):
        bonus = jnp.where(jnp.isinf(min_div), 0.0, min_div)
        score = jnp.where(taken, _NEG, base + bonus)
        idx = jnp.argmax(score, axis=-1)                             # (...)
        picks.append(idx)
        onehot = jax.nn.one_hot(idx, K, dtype=bool)
        taken = taken | onehot
        if s == k - 1:
            break
        p_sel = jnp.take_along_axis(pos, idx[..., None, None],
                                    axis=-2)                         # (...,1,3)
        n_sel = jnp.take_along_axis(nrm, idx[..., None, None], axis=-2)
        d_pos = jnp.linalg.norm(pos - p_sel, axis=-1) * inv_ext
        d_nrm = (1.0 - (nrm * n_sel).sum(-1)) * normal_weight * spacing
        min_div = jnp.minimum(min_div, d_pos + d_nrm)
    idx = jnp.stack(picks, axis=-1)                                  # (..., k)
    take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-2)
    return take(pos), take(nrm), jnp.take_along_axis(depth, idx, axis=-1)
