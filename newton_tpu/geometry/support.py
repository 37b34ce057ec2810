"""Analytic support functions for convex primitives.

TPU-native equivalent of reference newton/_src/geometry/support_function.py:49
(`SupportMapDataProvider` / `GenericShapeData`): every convex shape exposes a
world-space support map ``sup(d) -> point`` so any convex-convex pair can be
routed through one generic MPR contact path instead of needing a bespoke
analytic kernel per (type, type) pair. The reference evaluates supports
per-thread inside Warp kernels; here each support map is a closure over the
batched transforms/scales and is evaluated branch-free for the whole pair
batch at once, so XLA fuses the support probes of all MPR iterations into a
handful of vectorized ops.

Shape-frame conventions match geometry/narrow_phase.py:
- SPHERE: radius = scale[0]
- BOX: half-extents = scale
- CAPSULE / CYLINDER / CONE: radius = scale[0], half-height = scale[1], axis +Z
  (cone apex at +Z·h, base disc at -Z·h)
- ELLIPSOID: radii = scale
- CONVEX / MESH: hull vertex cloud (padded by repetition)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math import quat_rotate_inv, transform_point
from .types import GeoType

__all__ = ["SUPPORT_TYPES", "make_support", "support_center",
           "support_contact_fn"]

_S, _B = int(GeoType.SPHERE), int(GeoType.BOX)
_C, _CY, _CO = int(GeoType.CAPSULE), int(GeoType.CYLINDER), int(GeoType.CONE)
_E, _CX, _M = int(GeoType.ELLIPSOID), int(GeoType.CONVEX), int(GeoType.MESH)

# geo types with an analytic support map (hull types need vertex clouds)
SUPPORT_TYPES = frozenset({_S, _B, _C, _CY, _CO, _E})


def _hull_support(verts, X, d):
    """World support point of a local vertex cloud. verts (n, H, 3),
    X (n, 7), d (n, 3) world direction."""
    dl = quat_rotate_inv(X[:, 3:7], d)
    dots = jnp.einsum("nhc,nc->nh", verts, dl)
    idx = jnp.argmax(dots, axis=-1)
    p = jnp.take_along_axis(
        verts, jnp.broadcast_to(idx[:, None, None], (verts.shape[0], 1, 3)),
        axis=1)[:, 0]
    return transform_point(X, p)


def make_support(geo_type: int, X, s, verts=None):
    """Return a world support map ``sup(d) -> (n, 3)`` for one shape batch.

    ``d`` is a normalized world direction, ``X (n, 7)`` the shape transforms,
    ``s (n, 3)`` the scales. CONVEX/MESH additionally need ``verts
    (n, H, 3)`` local hull vertices.
    """
    t = int(geo_type)
    if t in (_CX, _M):
        if verts is None:
            raise ValueError("hull support needs vertex cloud")
        return lambda d: _hull_support(verts, X, d)
    if t not in SUPPORT_TYPES:
        raise ValueError(f"no support map for geo type {t}")

    q = X[:, 3:7]
    c = X[:, 0:3]

    if t == _S:
        r = s[:, 0:1]
        return lambda d: c + r * d

    def local_support(dl):
        """Support point in the shape frame for normalized local dirs."""
        if t == _B:
            return jnp.where(dl >= 0.0, s, -s)
        if t == _E:
            v = s * dl
            return s * v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
        r, h = s[:, 0:1], s[:, 1:2]
        dz = dl[:, 2:3]
        if t == _C:
            # segment endpoint + radius sweep
            tip = jnp.concatenate(
                [jnp.zeros_like(dz), jnp.zeros_like(dz),
                 jnp.where(dz >= 0.0, h, -h)], axis=-1)
            return tip + r * dl
        # radial direction in the XY plane (safe fallback +X on the axis)
        dxy = dl[:, 0:2]
        lxy = jnp.linalg.norm(dxy, axis=-1, keepdims=True)
        u = jnp.where(lxy > 1e-9, dxy / jnp.maximum(lxy, 1e-9),
                      jnp.concatenate([jnp.ones_like(dz),
                                       jnp.zeros_like(dz)], axis=-1))
        if t == _CY:
            cap = jnp.where(dz >= 0.0, h, -h)
            return jnp.concatenate([r * u, cap], axis=-1)
        # cone: apex (0,0,h) vs base-rim point (r·u, -h), whichever is
        # extreme along dl
        dot_apex = h * dz
        dot_base = r * lxy - h * dz
        rim = jnp.concatenate([r * u, -h * jnp.ones_like(dz)], axis=-1)
        apex = jnp.concatenate([jnp.zeros_like(dz), jnp.zeros_like(dz), h],
                               axis=-1)
        return jnp.where(dot_base > dot_apex, rim, apex)

    def sup(d):
        dl = quat_rotate_inv(q, d)
        return transform_point(X, local_support(dl))

    return sup


def support_center(geo_type: int, X, s, verts=None):
    """A strictly interior point of the shape (MPR ray origin).

    The frame origin works for every primitive except none — even the cone
    contains its origin (radius r/2 disc at z=0) — but the cone's centroid
    (0, 0, -h/2) is used for a better-conditioned portal.
    """
    t = int(geo_type)
    if t in (_CX, _M):
        if verts is None:
            raise ValueError("hull center needs vertex cloud")
        return transform_point(X, jnp.mean(verts, axis=1))
    if t == _CO:
        h = s[:, 1:2]
        z = jnp.concatenate([jnp.zeros_like(h), jnp.zeros_like(h),
                             -0.5 * h], axis=-1)
        return transform_point(X, z)
    return X[:, 0:3]


def support_contact_fn(t0: int, t1: int, slots: int):
    """Generic convex-convex contact function via support-map MPR.

    Returns a narrow-phase pair function ``fn(X0, X1, s0, s1) -> (pos
    (n, slots, 3), nrm, depth)`` usable anywhere a PRIMITIVE_FNS entry is
    (reference routes the same pairs through `support_function.py` +
    `mpr.py`). The 5-probe manifold is reduced to the requested slot count
    by keeping the deepest contacts.
    """
    from .mpr import support_manifold

    def fn(X0, X1, s0, s1):
        import jax
        supA = make_support(t0, X0, s0)
        supB = make_support(t1, X1, s1)
        ca = support_center(t0, X0, s0)
        cb = support_center(t1, X1, s1)
        pos, nrm, dep = support_manifold(supA, supB, ca, cb)
        k = min(slots, dep.shape[1])
        if k < dep.shape[1]:
            top, sel = jax.lax.top_k(dep, k)
            pos = jnp.take_along_axis(pos, sel[..., None], axis=1)
            nrm = jnp.take_along_axis(nrm, sel[..., None], axis=1)
            dep = top
        return pos, nrm, dep

    return fn
