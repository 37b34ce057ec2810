"""Vectorized primitive narrow-phase contact generation.

TPU-native re-design of reference newton/_src/geometry/narrow_phase.py:1450
and collision_primitive.py. The reference routes candidate pairs through
per-pair-type Warp kernels appending to an atomic-counter buffer; here every
(GeoType, GeoType) class is one **batched, branch-free function** over all
pairs of that class, emitting a *fixed* number of manifold slots per pair
(masked when inactive). Slot addressing is static — contacts land at
build-time-known offsets, so the whole pipeline is deterministic and
jit/vmap/grad-safe with zero atomics.

All functions take world transforms ``X0/X1 (n, 7)`` of the two shape frames
plus scales, and return ``(position (n, K, 3), normal (n, K, 3),
depth (n, K))`` with normal pointing from shape0 toward shape1 and depth > 0
when penetrating (thickness handled by the caller).

Shape-frame conventions (match reference geometry/types.py):
- PLANE: normal +Z, infinite (scale ignored for collision).
- SPHERE: radius = scale[0].
- BOX: half-extents = scale.
- CAPSULE / CYLINDER / CONE: radius = scale[0], half-height = scale[1], axis +Z.
- ELLIPSOID: radii = scale.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..math import (
    orthonormal_basis,
    quat_rotate,
    quat_rotate_inv,
    transform_point,
    transform_point_inv,
    transform_vector,
)
from .types import GeoType

__all__ = ["pair_slot_count", "PRIMITIVE_FNS", "contact_fn_for"]

_P, _S, _B = int(GeoType.PLANE), int(GeoType.SPHERE), int(GeoType.BOX)
_C, _CY, _CO = int(GeoType.CAPSULE), int(GeoType.CYLINDER), int(GeoType.CONE)
_M, _E, _CX = int(GeoType.MESH), int(GeoType.ELLIPSOID), int(GeoType.CONVEX)
_HF = int(GeoType.HFIELD)

# slots per pair class — single source of truth used by ModelBuilder.finalize
_SLOTS: Dict[Tuple[int, int], int] = {
    (_P, _S): 1, (_P, _B): 8, (_P, _C): 2, (_P, _CY): 4, (_P, _CO): 4,
    (_P, _E): 1, (_P, _M): 8, (_P, _CX): 8,
    (_S, _S): 1, (_S, _B): 1, (_S, _C): 1, (_S, _CY): 1, (_S, _CO): 1,
    (_S, _E): 1, (_S, _M): 4, (_S, _CX): 1,
    (_B, _B): 16, (_B, _C): 4, (_C, _C): 2, (_B, _M): 16, (_C, _M): 8,
    (_M, _M): 16, (_CY, _CY): 2, (_B, _CY): 4, (_C, _CY): 2, (_E, _E): 1,
    (_B, _CX): 5, (_CX, _CX): 5, (_C, _CX): 8,
    (_HF, _S): 1, (_HF, _C): 2, (_HF, _B): 8, (_HF, _M): 16,
    # generic support-MPR pairs (see contact_fn_for fallback)
    (_C, _CO): 2, (_CY, _CO): 4, (_CO, _CO): 4, (_B, _CO): 4,
    (_CO, _E): 1, (_B, _E): 4, (_C, _E): 1, (_CY, _E): 2,
}


def pair_slot_count(t0: int, t1: int) -> int:
    key = (min(int(t0), int(t1)), max(int(t0), int(t1)))
    return _SLOTS.get(key, 4)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _plane_sdf(X_plane, p_world):
    """Signed distance of world points to a +Z plane shape; also returns the
    world plane normal. p_world: (..., 3)."""
    n = quat_rotate(X_plane[..., 3:7], jnp.array([0.0, 0.0, 1.0], dtype=X_plane.dtype))
    d = jnp.sum((p_world - X_plane[..., 0:3]) * n, axis=-1)
    return d, n


def _box_corners(X, half):
    """(n, 8, 3) world-space box corners."""
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
         for sz in (-1.0, 1.0)], dtype=X.dtype)                 # (8, 3)
    local = signs[None, :, :] * half[:, None, :]                # (n, 8, 3)
    return transform_point(X[:, None, :], local)


def _segment_endpoints(X, half_h):
    """Capsule/cylinder axis endpoints in world space, (n, 3) each."""
    a = transform_point(X, jnp.stack(
        [jnp.zeros_like(half_h), jnp.zeros_like(half_h), half_h], axis=-1))
    b = transform_point(X, jnp.stack(
        [jnp.zeros_like(half_h), jnp.zeros_like(half_h), -half_h], axis=-1))
    return a, b


def _closest_point_segment_segment(p1, q1, p2, q2, eps=1e-9):
    """Closest points between segments [p1,q1], [p2,q2]. Batched, branch-free
    (Ericson, Real-Time Collision Detection 5.1.9)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.where(denom > eps, jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0), 0.0)
    t = jnp.where(e > eps, (b * s + f) / jnp.maximum(e, eps), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    # recompute s for clamped t
    s = jnp.where(a > eps, jnp.clip((b * t_cl - c) / jnp.maximum(a, eps), 0.0, 1.0), 0.0)
    c1 = p1 + d1 * s[..., None]
    c2 = p2 + d2 * t_cl[..., None]
    return c1, c2


def _box_sdf_local(p, half, eps=1e-9):
    """SDF + gradient of an axis-aligned box at local points p (..., 3)."""
    q = jnp.abs(p) - half
    outside = jnp.maximum(q, 0.0)
    # safe norm: sqrt has an infinite derivative at 0 and norm's VJP is
    # 0/0 = NaN there; clamp the squared distance BEFORE the sqrt so
    # interior points (outside == 0) keep a finite, zero backward pass
    o2 = jnp.sum(outside * outside, axis=-1)
    d_out = jnp.where(o2 > 0.0,
                      jnp.sqrt(jnp.maximum(o2, eps * eps)), 0.0)
    d_in = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    d = d_out + d_in
    # gradient: outside — direction from surface; inside — axis of max q
    g_out = outside * jnp.sign(p) / jnp.maximum(d_out, eps)[..., None]
    ax = jnp.argmax(q, axis=-1)
    g_in = jnp.sign(p) * jax_one_hot(ax, 3, p.dtype)
    inside = (d_in < 0.0) & (d_out <= eps)
    g = jnp.where(inside[..., None], g_in, g_out)
    return d, g


def jax_one_hot(idx, n, dtype):
    return (idx[..., None] == jnp.arange(n)[(None,) * idx.ndim]).astype(dtype)


# ---------------------------------------------------------------------------
# pair-class contact functions: (X0, X1, s0, s1) -> (pos, nrm, depth)
# depth > 0 means surfaces overlapping (before thickness)
# ---------------------------------------------------------------------------

def plane_sphere(X0, X1, s0, s1):
    c = X1[:, 0:3]
    d, n = _plane_sdf(X0, c)
    r = s1[:, 0]
    depth = r - d
    pos = c - n * (d[:, None] - 0.5 * depth[:, None])
    return pos[:, None, :], n[:, None, :], depth[:, None]


def plane_capsule(X0, X1, s0, s1):
    a, b = _segment_endpoints(X1, s1[:, 1])
    pts = jnp.stack([a, b], axis=1)                           # (n, 2, 3)
    d, n = _plane_sdf(X0[:, None, :], pts)
    depth = s1[:, 0:1] - d
    pos = pts - n * (d[..., None] - 0.5 * depth[..., None])
    return pos, jnp.broadcast_to(n, pos.shape), depth


def plane_box(X0, X1, s0, s1):
    corners = _box_corners(X1, s1)                             # (n, 8, 3)
    d, n = _plane_sdf(X0[:, None, :], corners)
    depth = -d
    pos = corners - n * (d[..., None] * 0.5)
    return pos, jnp.broadcast_to(n, pos.shape), depth


def plane_cylinder(X0, X1, s0, s1):
    """4 rim points: on each cap circle, the point closest to the plane."""
    dtype = X0.dtype
    axis = quat_rotate(X1[:, 3:7], jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    _, n = _plane_sdf(X0, X1[:, 0:3])
    # radial direction toward the plane, orthogonal to axis
    radial = -(n - axis * jnp.sum(n * axis, axis=-1, keepdims=True))
    rn = jnp.linalg.norm(radial, axis=-1, keepdims=True)
    t1, _ = orthonormal_basis(axis)
    radial = jnp.where(rn > 1e-6, radial / jnp.maximum(rn, 1e-9), t1)
    r, h = s1[:, 0:1], s1[:, 1:2]
    top = X1[:, 0:3] + axis * h
    bot = X1[:, 0:3] - axis * h
    pts = jnp.stack([top + radial * r, bot + radial * r,
                     top - radial * r, bot - radial * r], axis=1)
    d, n2 = _plane_sdf(X0[:, None, :], pts)
    depth = -d
    pos = pts - n2 * (d[..., None] * 0.5)
    return pos, jnp.broadcast_to(n2, pos.shape), depth


def plane_cone(X0, X1, s0, s1):
    """Apex + 3 base-rim points."""
    dtype = X0.dtype
    axis = quat_rotate(X1[:, 3:7], jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    _, n = _plane_sdf(X0, X1[:, 0:3])
    radial = -(n - axis * jnp.sum(n * axis, axis=-1, keepdims=True))
    rn = jnp.linalg.norm(radial, axis=-1, keepdims=True)
    t1, t2 = orthonormal_basis(axis)
    radial = jnp.where(rn > 1e-6, radial / jnp.maximum(rn, 1e-9), t1)
    r, h = s1[:, 0:1], s1[:, 1:2]
    apex = X1[:, 0:3] + axis * h
    base = X1[:, 0:3] - axis * h
    side = jnp.cross(axis, radial)
    pts = jnp.stack([apex, base + radial * r,
                     base - 0.5 * radial * r + 0.866 * side * r,
                     base - 0.5 * radial * r - 0.866 * side * r], axis=1)
    d, n2 = _plane_sdf(X0[:, None, :], pts)
    depth = -d
    pos = pts - n2 * (d[..., None] * 0.5)
    return pos, jnp.broadcast_to(n2, pos.shape), depth


def plane_ellipsoid(X0, X1, s0, s1):
    # support point of the ellipsoid in the -n direction
    _, n = _plane_sdf(X0, X1[:, 0:3])
    n_local = quat_rotate_inv(X1[:, 3:7], -n)
    v = n_local * s1
    sup_local = s1 * v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    p = transform_point(X1, sup_local)
    d, n2 = _plane_sdf(X0, p)
    depth = -d
    pos = p - n2 * (d[:, None] * 0.5)
    return pos[:, None, :], n2[:, None, :], depth[:, None]


def sphere_sphere(X0, X1, s0, s1):
    d = X1[:, 0:3] - X0[:, 0:3]
    dist = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dist, 1e-9)[:, None]
    n = jnp.where(dist[:, None] > 1e-9, n,
                  jnp.zeros_like(n).at[:, 2].set(1.0))
    depth = s0[:, 0] + s1[:, 0] - dist
    pos = X0[:, 0:3] + n * (s0[:, 0] - 0.5 * depth)[:, None]
    return pos[:, None, :], n[:, None, :], depth[:, None]


def sphere_capsule(X0, X1, s0, s1):
    a, b = _segment_endpoints(X1, s1[:, 1])
    c = X0[:, 0:3]
    ab = b - a
    t = jnp.clip(jnp.sum((c - a) * ab, axis=-1)
                 / jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-9), 0.0, 1.0)
    p = a + ab * t[:, None]
    d = p - c
    dist = jnp.linalg.norm(d, axis=-1)
    n = jnp.where(dist[:, None] > 1e-9, d / jnp.maximum(dist, 1e-9)[:, None],
                  jnp.zeros_like(d).at[:, 2].set(1.0))
    depth = s0[:, 0] + s1[:, 0] - dist
    pos = c + n * (s0[:, 0] - 0.5 * depth)[:, None]
    return pos[:, None, :], n[:, None, :], depth[:, None]


def sphere_box(X0, X1, s0, s1):
    c_local = transform_point_inv(X1, X0[:, 0:3])
    d, g = _box_sdf_local(c_local, s1)
    n_world = -quat_rotate(X1[:, 3:7], g)  # from sphere toward box surface... sign below
    depth = s0[:, 0] - d
    # normal from shape0 (sphere) toward shape1 (box): -gradient direction
    pos = X0[:, 0:3] + n_world * (s0[:, 0] - 0.5 * depth)[:, None]
    return pos[:, None, :], n_world[:, None, :], depth[:, None]


def sphere_ellipsoid(X0, X1, s0, s1):
    # approximate: direction to ellipsoid center, support point
    d = X1[:, 0:3] - X0[:, 0:3]
    n = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    n_local = quat_rotate_inv(X1[:, 3:7], -n)
    v = n_local * s1
    sup = transform_point(X1, s1 * v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9))
    dist = jnp.sum((sup - X0[:, 0:3]) * n, axis=-1)
    depth = s0[:, 0] - dist
    pos = X0[:, 0:3] + n * (s0[:, 0] - 0.5 * depth)[:, None]
    return pos[:, None, :], n[:, None, :], depth[:, None]


def capsule_capsule(X0, X1, s0, s1):
    a0, b0 = _segment_endpoints(X0, s0[:, 1])
    a1, b1 = _segment_endpoints(X1, s1[:, 1])
    # two contact slots: closest points, and the pair with segments swapped
    # endpoints (captures near-parallel capsule stacking)
    c0, c1 = _closest_point_segment_segment(a0, b0, a1, b1)
    c0b, c1b = _closest_point_segment_segment(b0, a0, b1, a1)
    p0 = jnp.stack([c0, c0b], axis=1)
    p1 = jnp.stack([c1, c1b], axis=1)
    d = p1 - p0
    dist = jnp.linalg.norm(d, axis=-1)
    n = jnp.where(dist[..., None] > 1e-9, d / jnp.maximum(dist, 1e-9)[..., None],
                  jnp.zeros_like(d).at[..., 2].set(1.0))
    depth = s0[:, 0:1] + s1[:, 0:1] - dist
    pos = p0 + n * (s0[:, 0:1] - 0.5 * depth)[..., None]
    return pos, n, depth


def capsule_box(X0, X1, s0, s1):
    """4 slots: both capsule endpoints + 2 interior samples vs box SDF."""
    a, b = _segment_endpoints(X0, s0[:, 1])
    ts = jnp.array([0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0], dtype=X0.dtype)
    pts = a[:, None, :] + (b - a)[:, None, :] * ts[None, :, None]  # (n,4,3)
    p_local = transform_point_inv(X1[:, None, :], pts)
    d, g = _box_sdf_local(p_local, s1[:, None, :])
    n_world = -quat_rotate(X1[:, None, 3:7], g)
    depth = s0[:, 0:1] - d
    pos = pts + n_world * (s0[:, 0:1] - 0.5 * depth)[..., None]
    return pos, n_world, depth


def box_box(X0, X1, s0, s1):
    """16 slots via face-axis SAT: the minimum-overlap axis among the 6 face
    normals defines the contact normal; each box's corners past the other's
    slab along that axis become manifold points (branch-free; edge-edge axes
    are approximated by the nearest face axis, adequate with the solver's
    multi-point Jacobi treatment)."""
    from ..math import quat_to_matrix
    R0 = quat_to_matrix(X0[:, 3:7])                             # (n, 3, 3)
    R1 = quat_to_matrix(X1[:, 3:7])
    axes = jnp.concatenate([jnp.swapaxes(R0, 1, 2),
                            jnp.swapaxes(R1, 1, 2)], axis=1)    # (n, 6, 3)
    dp = X1[:, 0:3] - X0[:, 0:3]
    # slab radii of each box along every axis
    proj0 = jnp.abs(jnp.einsum("nax,nxk->nak", axes, R0)) @ s0[..., None]
    proj1 = jnp.abs(jnp.einsum("nax,nxk->nak", axes, R1)) @ s1[..., None]
    r0 = proj0[..., 0]                                          # (n, 6)
    r1 = proj1[..., 0]
    dist = jnp.einsum("nax,nx->na", axes, dp)
    overlap = r0 + r1 - jnp.abs(dist)                           # (n, 6)
    a_best = jnp.argmin(overlap, axis=-1)
    n_axis = jnp.take_along_axis(axes, a_best[:, None, None], axis=1)[:, 0]
    sign = jnp.sign(jnp.take_along_axis(dist, a_best[:, None], axis=1)[:, 0])
    sign = jnp.where(sign == 0, 1.0, sign)
    n = n_axis * sign[:, None]                                  # 0 -> 1
    min_overlap = jnp.take_along_axis(overlap, a_best[:, None], axis=1)[:, 0]
    separated = (min_overlap < 0.0)

    c0 = _box_corners(X0, s0)                                   # (n, 8, 3)
    c1 = _box_corners(X1, s1)
    # box1 corners penetrating past box0's slab face along n
    face0 = jnp.einsum("nx,nx->n", X0[:, 0:3], n) + \
        jnp.take_along_axis(r0, a_best[:, None], axis=1)[:, 0]
    depth1 = face0[:, None] - jnp.einsum("nkx,nx->nk", c1, n)   # (n, 8)
    # box0 corners penetrating past box1's slab face along -n
    face1 = jnp.einsum("nx,nx->n", X1[:, 0:3], n) - \
        jnp.take_along_axis(r1, a_best[:, None], axis=1)[:, 0]
    depth0 = jnp.einsum("nkx,nx->nk", c0, n) - face1[:, None]
    # penetrating corners are CLAMPED into the other box's face rectangle
    # (branch-free stand-in for reference-face polygon clipping): a corner
    # past the slab face but laterally outside the footprint moves to the
    # footprint boundary — the union of both boxes' clamped corner sets
    # approximates the face-intersection polygon. The earlier hard lateral
    # rejection dropped most manifold points for stacks with small relative
    # yaw (corners of a twisted box lie just outside the supporting face),
    # collapsing the support polygon and the stack with it. Axes aligned
    # with the contact normal must not clamp: their effective extent is
    # inflated by |n| along that local axis so only lateral axes bind.
    big = 10.0 * (jnp.max(s0, -1) + jnp.max(s1, -1))[:, None]   # (n, 1)
    n_in0 = jnp.abs(jnp.einsum("nx,nxj->nj", n, R0))            # (n, 3)
    n_in1 = jnp.abs(jnp.einsum("nx,nxj->nj", n, R1))
    l1_in0 = jnp.einsum("nkx,nxj->nkj", c1 - X0[:, None, 0:3], R0)
    l0_in1 = jnp.einsum("nkx,nxj->nkj", c0 - X1[:, None, 0:3], R1)
    ext0 = (s0 + big * n_in0)[:, None, :]                       # (n, 1, 3)
    ext1 = (s1 + big * n_in1)[:, None, :]
    c1 = X0[:, None, 0:3] + jnp.einsum(
        "nkj,nxj->nkx", jnp.clip(l1_in0, -ext0, ext0), R0)
    c0 = X1[:, None, 0:3] + jnp.einsum(
        "nkj,nxj->nkx", jnp.clip(l0_in1, -ext1, ext1), R1)
    # cap by the SAT overlap and mask separated pairs
    cap = jnp.maximum(min_overlap, 0.0)[:, None]
    depth1 = jnp.where(separated[:, None], -1.0, jnp.minimum(depth1, cap))
    depth0 = jnp.where(separated[:, None], -1.0, jnp.minimum(depth0, cap))
    pos1 = c1 + n[:, None, :] * (0.5 * depth1)[..., None]
    pos0 = c0 - n[:, None, :] * (0.5 * depth0)[..., None]
    # NOTE: coincident set-0/set-1 twin points are intentionally KEPT.
    # A depth-gated dedup was tried and reverted: the gate flickers as
    # depths cross zero, and augmented-Lagrangian contact solvers (AVBD)
    # ratchet energy on rows that oscillate between deduped and live —
    # a resting two-box stack climbed steadily. Redundant rows only cost
    # the Jacobi sweep a slightly smaller step (spectral cap handles it).
    pos = jnp.concatenate([pos1, pos0], axis=1)
    nrm = jnp.broadcast_to(n[:, None, :], pos.shape)
    depth = jnp.concatenate([depth1, depth0], axis=1)
    return pos, nrm, depth


def capsule_cylinder(X0, X1, s0, s1):
    """Cylinder approximated as a capsule (same (radius, half-height)
    layout). Known deviation from the reference's exact cylinder kernels:
    contacts at the flat end caps engage one radius early (the cap is
    treated as domed), so a cylinder resting on its end sits ~r high. For
    exact end-cap behavior route the pair through the generic support-map
    MPR path (`contact_fn_for` fallback) by removing this entry from
    PRIMITIVE_FNS; the capsule model is kept because it is cheaper and the
    lateral (rolling) contact — the common case — is exact."""
    return capsule_capsule(X0, X1, s0, s1)


def sphere_cylinder(X0, X1, s0, s1):
    # cylinder ~ capsule; see capsule_cylinder for the end-cap deviation
    return sphere_capsule(X0, X1, s0, s1)


def box_cylinder(X0, X1, s0, s1):
    # cylinder ~ capsule (see capsule_cylinder for the end-cap deviation);
    # capsule_box is defined (capsule, box) with the
    # normal 0->1, so swap args and flip the normal back to box->cylinder
    pos, nrm, depth = capsule_box(X1, X0, s1, s0)
    return pos, -nrm, depth


def ellipsoid_ellipsoid(X0, X1, s0, s1):
    d = X1[:, 0:3] - X0[:, 0:3]
    n = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    # support points along +-n
    nl0 = quat_rotate_inv(X0[:, 3:7], n)
    v0 = nl0 * s0
    sup0 = transform_point(X0, s0 * v0 / jnp.maximum(
        jnp.linalg.norm(v0, axis=-1, keepdims=True), 1e-9))
    nl1 = quat_rotate_inv(X1[:, 3:7], -n)
    v1 = nl1 * s1
    sup1 = transform_point(X1, s1 * v1 / jnp.maximum(
        jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-9))
    depth = jnp.sum((sup0 - sup1) * n, axis=-1)
    pos = 0.5 * (sup0 + sup1)
    return pos[:, None, :], n[:, None, :], depth[:, None]


# dispatch table keyed by (type0, type1) in canonical (sorted) order.
# ``swap`` marks functions defined for the reversed order.
PRIMITIVE_FNS = {
    (_P, _S): plane_sphere,
    (_P, _C): plane_capsule,
    (_P, _B): plane_box,
    (_P, _CY): plane_cylinder,
    (_P, _CO): plane_cone,
    (_P, _E): plane_ellipsoid,
    (_S, _S): sphere_sphere,
    (_S, _C): sphere_capsule,
    (_S, _B): sphere_box,
    (_S, _E): sphere_ellipsoid,
    (_C, _C): capsule_capsule,
    (_C, _B): capsule_box,
    (_B, _B): box_box,
    (_C, _CY): capsule_cylinder,
    (_CY, _CY): capsule_capsule,
    (_S, _CY): sphere_cylinder,
    (_B, _CY): box_cylinder,
    (_E, _E): ellipsoid_ellipsoid,
}


def contact_fn_for(t0: int, t1: int):
    """Return (fn, swapped, slots) for a type pair, or (None, False, slots).

    Pairs without a bespoke analytic kernel fall back to the generic
    support-map MPR path when both types have analytic support functions
    (cone/ellipsoid vs box/capsule/cylinder/... — the reference routes these
    through support_function.py:49 + mpr.py instead of skipping them).
    """
    key = (int(t0), int(t1))
    if key in PRIMITIVE_FNS:
        return PRIMITIVE_FNS[key], False, pair_slot_count(t0, t1)
    rkey = (int(t1), int(t0))
    if rkey in PRIMITIVE_FNS:
        return PRIMITIVE_FNS[rkey], True, pair_slot_count(t0, t1)
    from .support import SUPPORT_TYPES, support_contact_fn
    if int(t0) in SUPPORT_TYPES and int(t1) in SUPPORT_TYPES:
        # canonical (sorted) argument order, like PRIMITIVE_FNS entries, so
        # pair classes keyed by (min, max, swapped) stay consistent
        k = pair_slot_count(t0, t1)
        lo, hi = min(int(t0), int(t1)), max(int(t0), int(t1))
        return support_contact_fn(lo, hi, k), int(t0) > int(t1), k
    return None, False, pair_slot_count(t0, t1)
