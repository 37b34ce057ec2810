"""Triangle-mesh BVH: host-side build, device-side refit, jitted traversal.

TPU-native equivalent of reference newton/_src/geometry/bvh.py:252-400
(shape/particle bounds + wp.Bvh acceleration) and the mesh traversal inside
sensors/warp_raytrace. Design:

- **Build** (host, once per mesh): binned median split over triangle
  centroids into a complete binary layout (left child = 2i+1); every
  interior node stores an AABB, leaves own a fixed-size triangle range.
  Static topology: the node-triangle assignment never changes.
- **Refit** (device, optional): recompute node AABBs bottom-up from
  deformed vertices — a level-by-level max/min reduction, fully
  vectorized (reference: Model.bvh_refit_shapes, model.py:1665).
- **Traversal** (device): iterative stack walk in a ``lax.while_loop``
  with a fixed-depth register stack, vmapped over rays. Leaf hits run the
  branch-free Moller-Trumbore kernel over the leaf's triangle budget.

The builder keeps the tree COMPLETE (padded with empty leaves), so every
array is static-shape and the same compiled traversal serves every mesh of
the same depth.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MeshBVH", "ray_triangles"]

_INF = 1e10


def ray_triangles(o, d, v0, v1, v2):
    """Moller-Trumbore: rays (..., 3) vs triangles (..., 3). Returns
    (t, n) with t = inf on miss; broadcasting over leading axes."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    s = o - v0
    u = jnp.sum(s * p, axis=-1) * inv
    q = jnp.cross(s, e1)
    v = jnp.sum(d * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    hit = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
           & (t > 1e-6))
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    # orient the normal against the ray
    n = jnp.where(jnp.sum(n * d, axis=-1, keepdims=True) > 0, -n, n)
    return jnp.where(hit, t, _INF), n


class MeshBVH:
    """Complete-binary-layout BVH over one triangle mesh.

    Attributes (after build):
        depth: tree depth (leaves at level depth-1).
        lo/hi: (n_nodes, 3) node AABBs (jnp).
        leaf_tris: (n_leaves, K, 3) triangle vertex indices (padded with
            the first triangle, masked by leaf_mask).
        leaf_mask: (n_leaves, K) validity.
    """

    def __init__(self, vertices: np.ndarray, indices: np.ndarray,
                 leaf_size: int = 4, max_depth: int = 12):
        verts = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
        tris = np.asarray(indices, dtype=np.int64).reshape(-1, 3)
        T = len(tris)
        cent = verts[tris].mean(axis=1)

        depth = 1
        while (1 << (depth - 1)) * leaf_size < T and depth < max_depth:
            depth += 1
        n_leaves = 1 << (depth - 1)
        n_nodes = (1 << depth) - 1
        self.depth = depth

        # median split: recursively partition triangle index lists
        buckets = [None] * n_leaves

        def split(ids, node, level):
            if level == depth - 1:
                buckets[node - (n_leaves - 1)] = ids
                return
            if len(ids) == 0:
                split(ids, 2 * node + 1, level + 1)
                split(ids, 2 * node + 2, level + 1)
                return
            c = cent[ids]
            axis = int(np.argmax(c.max(0) - c.min(0)))
            order = np.argsort(c[:, axis], kind="stable")
            half = (len(ids) + 1) // 2
            split(ids[order[:half]], 2 * node + 1, level + 1)
            split(ids[order[half:]], 2 * node + 2, level + 1)

        split(np.arange(T), 0, 0)
        K = max(1, max(len(b) for b in buckets))
        self.leaf_budget = K
        leaf_tris = np.zeros((n_leaves, K, 3), dtype=np.int32)
        leaf_mask = np.zeros((n_leaves, K), dtype=bool)
        for li, ids in enumerate(buckets):
            for k, t in enumerate(ids):
                leaf_tris[li, k] = tris[t]
                leaf_mask[li, k] = True
            if len(ids) == 0:
                leaf_tris[li] = tris[0] if T else 0
        self.leaf_tris = leaf_tris
        self.leaf_mask = jnp.asarray(leaf_mask)
        self.n_leaves = n_leaves
        self.n_nodes = n_nodes

        lo, hi = self._bounds_np(verts, leaf_tris, leaf_mask)
        self.lo = jnp.asarray(lo, dtype=jnp.float32)
        self.hi = jnp.asarray(hi, dtype=jnp.float32)

    # ------------------------------------------------------------------
    def _bounds_np(self, verts, leaf_tris, leaf_mask):
        n_nodes, n_leaves = self.n_nodes, self.n_leaves
        lo = np.full((n_nodes, 3), np.inf)
        hi = np.full((n_nodes, 3), -np.inf)
        pts = verts[leaf_tris]                       # (L, K, 3, 3)
        m = leaf_mask[..., None, None]
        plo = np.where(m, pts, np.inf).reshape(n_leaves, -1, 3).min(1)
        phi = np.where(m, pts, -np.inf).reshape(n_leaves, -1, 3).max(1)
        lo[n_leaves - 1:] = plo
        hi[n_leaves - 1:] = phi
        for i in range(n_leaves - 2, -1, -1):
            lo[i] = np.minimum(lo[2 * i + 1], lo[2 * i + 2])
            hi[i] = np.maximum(hi[2 * i + 1], hi[2 * i + 2])
        return lo, hi

    def refit(self, vertices: jnp.ndarray) -> "MeshBVH":
        """Device-side AABB refit for deformed vertices (topology fixed).
        Returns a shallow copy with updated bounds
        (reference: Model.bvh_refit_shapes, model.py:1665)."""
        n_leaves = self.n_leaves
        pts = vertices[self.leaf_tris]               # (L, K, 3, 3)
        m = self.leaf_mask[..., None, None]
        plo = jnp.where(m, pts, jnp.inf).reshape(n_leaves, -1, 3).min(1)
        phi = jnp.where(m, pts, -jnp.inf).reshape(n_leaves, -1, 3).max(1)
        los = [plo]
        his = [phi]
        cur_lo, cur_hi = plo, phi
        n = n_leaves
        while n > 1:
            n //= 2
            cur_lo = jnp.minimum(cur_lo[0::2], cur_lo[1::2])
            cur_hi = jnp.maximum(cur_hi[0::2], cur_hi[1::2])
            los.append(cur_lo)
            his.append(cur_hi)
        lo = jnp.concatenate(list(reversed(los)), axis=0)
        hi = jnp.concatenate(list(reversed(his)), axis=0)
        out = object.__new__(MeshBVH)
        out.__dict__.update(self.__dict__)
        out.lo, out.hi = lo, hi
        return out

    # ------------------------------------------------------------------
    def raycast(self, vertices: jnp.ndarray, o: jnp.ndarray,
                d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Closest-hit traversal. o, d: (R, 3) local-frame rays.
        Returns (t (R,), n (R, 3)); t = inf on miss."""
        lo, hi = self.lo, self.hi
        leaf_base = self.n_leaves - 1
        tris = jnp.asarray(self.leaf_tris)           # (L, K, 3)
        lmask = self.leaf_mask
        Kb = self.leaf_budget
        max_stack = 2 * self.depth + 2

        def one_ray(o1, d1):
            inv = 1.0 / jnp.where(jnp.abs(d1) > 1e-9, d1, 1e-9)

            def aabb_hit(node, t_best):
                t1 = (lo[node] - o1) * inv
                t2 = (hi[node] - o1) * inv
                tmin = jnp.max(jnp.minimum(t1, t2))
                tmax = jnp.min(jnp.maximum(t1, t2))
                return (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_best)

            stack0 = jnp.zeros((max_stack,), jnp.int32)
            carry0 = (stack0, jnp.int32(1), jnp.asarray(_INF, jnp.float32),
                      jnp.zeros(3, jnp.float32))

            def cond(c):
                return c[1] > 0

            def body(c):
                stack, sp, t_best, n_best = c
                node = stack[sp - 1]
                sp = sp - 1
                hit_box = aabb_hit(node, t_best)
                is_leaf = node >= leaf_base

                # leaf: test the triangle budget
                li = jnp.maximum(node - leaf_base, 0)
                tv = vertices[tris[li]]              # (K, 3, 3)
                t_tri, n_tri = ray_triangles(
                    jnp.broadcast_to(o1, (Kb, 3)),
                    jnp.broadcast_to(d1, (Kb, 3)),
                    tv[:, 0], tv[:, 1], tv[:, 2])
                t_tri = jnp.where(lmask[li], t_tri, _INF)
                k = jnp.argmin(t_tri)
                better = hit_box & is_leaf & (t_tri[k] < t_best)
                t_best = jnp.where(better, t_tri[k], t_best)
                n_best = jnp.where(better, n_tri[k], n_best)

                # interior: push children
                push = hit_box & ~is_leaf
                c1 = 2 * node + 1
                c2 = 2 * node + 2
                stack = stack.at[sp].set(jnp.where(push, c1, stack[sp]))
                stack = stack.at[sp + 1].set(jnp.where(push, c2,
                                                       stack[sp + 1]))
                sp = jnp.where(push, sp + 2, sp)
                return (stack, sp, t_best, n_best)

            _, _, t, n = jax.lax.while_loop(cond, body, carry0)
            return t, n

        return jax.vmap(one_ray)(o, d)
