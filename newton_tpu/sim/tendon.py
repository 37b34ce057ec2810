"""Spatial tendons with sphere/cylinder wrap geometry.

TPU-native equivalent of MuJoCo spatial tendons (reference imports the wrap
arrays tendon_wrap_adr/num/type at newton/_src/utils/import_mjcf.py:2865-2868
and delegates the path solve to MuJoCo-Warp). Here the whole path solve is
branchless jnp running inside the jitted step:

- a tendon path is a static sequence of elements: attachment sites
  (body-frame points) optionally separated by wrap geoms (sphere or cylinder
  surfaces the path slides around);
- the path length between two sites around a wrap geom is the exact shortest
  path: straight tangent, geodesic arc (a helix on cylinders — the unrolled
  path is a straight line, so the axial coordinate varies linearly with 2D
  path length), straight tangent. When the straight segment misses the
  surface the wrap is inactive and the contribution is the plain segment;
- moment arms dL/dq follow from the envelope theorem: tangent points are
  material points of the wrap body, so only the straight segments contribute
  (the geodesic arc is rigid on the wrap body), each as
  u_hat . (dp1/dq - dp0/dq);
- a sidesite forces the wrap to pass on its side (MuJoCo semantics); without
  one the shorter of the two candidate paths wins.

Everything is layout-agnostic over trailing batch axes: body transforms
arrive as component tuples of ``(B, ...)`` arrays (the transposed-SoA batched
layout uses ``(B, W)``; the per-env vmapped path uses ``(B,)``), and all math
broadcasts elementwise. Host callers (rest-length at finalize) pass numpy and
read back scalars.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["SpatialTendonPath", "eval_spatial_tendons",
           "spatial_tendon_rest_length"]

_EPS = 1e-12


class SpatialTendonPath:
    """Static description of one spatial tendon's routing (host-side).

    ``elems`` is a list of tuples in path order:
      ("site", body, pos)                      attachment/via point
      ("sphere", body, pos, radius, side)      wrap sphere (side: local pos
                                               of the sidesite on the same
                                               body, or None)
      ("cylinder", body, pos, axis, radius, side)  wrap cylinder
    Sites are body-frame points; ``body == -1`` means world-fixed. Wrap
    elements must sit between two sites (MuJoCo: two consecutive objects
    cannot both be wrap geoms).
    """

    __slots__ = ("elems",)

    def __init__(self, elems: Sequence[tuple]):
        elems = list(elems)
        if len(elems) < 2 or elems[0][0] != "site" or elems[-1][0] != "site":
            raise ValueError("spatial tendon path must start and end with "
                             "a site")
        for a, b in zip(elems, elems[1:]):
            if a[0] != "site" and b[0] != "site":
                raise ValueError("two consecutive wrap geoms are not "
                                 "supported (MuJoCo has the same rule)")
        self.elems = elems


# ---------------------------------------------------------------------------
# component-tuple helpers (shapes broadcast over trailing batch axes)
# ---------------------------------------------------------------------------

def _add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _sub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _scale(a, s):
    return tuple(x * s for x in a)


def _dot(a, b):
    return sum(x * y for x, y in zip(a, b))


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _qrot(q, v):
    u = q[:3]
    w = q[3]
    t = _scale(_cross(u, v), 2.0)
    return _add(_add(v, _scale(t, w)), _cross(u, t))


def _norm(a):
    return jnp.sqrt(jnp.maximum(_dot(a, a), _EPS))


def _normalize(a):
    inv = 1.0 / _norm(a)
    return _scale(a, inv), 1.0 / inv


def _point_world(bp, bq, body: int, pos, dtype):
    """World position of a body-frame point (static body index)."""
    loc = tuple(jnp.asarray(float(c), dtype=dtype) for c in pos)
    if body < 0:
        zero = jnp.zeros_like(bp[0][0])
        return tuple(c + zero for c in loc)
    q = tuple(c[body] for c in bq)
    p = tuple(c[body] for c in bp)
    return _add(p, _qrot(q, loc))


def _axis_world(bq, body: int, axis, dtype):
    loc = tuple(jnp.asarray(float(c), dtype=dtype) for c in axis)
    if body < 0:
        zero = jnp.zeros_like(bq[0][0])
        return tuple(c + zero for c in loc)
    return _qrot(tuple(c[body] for c in bq), loc)


# ---------------------------------------------------------------------------
# 2D circle wrap (the core of both sphere and cylinder wrapping)
# ---------------------------------------------------------------------------

def _wrap_2d(ax, ay, bx, by, r, side_sign=None):
    """Shortest path from a to b around the circle of radius ``r`` at the
    origin (2D). Returns (active, t1, t2, l_tan_a, arc, l_tan_b) where t1/t2
    are the tangent points as (x, y) pairs. ``side_sign`` (+-1 per element,
    broadcastable) forces the wrap side; None picks the shorter path.

    All outputs are well-defined (guarded) even when inactive — callers
    select with ``active``.
    """
    da2 = ax * ax + ay * ay
    db2 = bx * bx + by * by
    da2s = jnp.maximum(da2, _EPS)
    db2s = jnp.maximum(db2, _EPS)
    ta = jnp.sqrt(jnp.maximum(da2 - r * r, 0.0))        # tangent lengths
    tb = jnp.sqrt(jnp.maximum(db2 - r * r, 0.0))

    # does the straight segment a-b come within r of the origin?
    ex, ey = bx - ax, by - ay
    e2 = jnp.maximum(ex * ex + ey * ey, _EPS)
    t_seg = jnp.clip(-(ax * ex + ay * ey) / e2, 0.0, 1.0)
    cx, cy = ax + t_seg * ex, ay + t_seg * ey
    d_seg2 = cx * cx + cy * cy
    active = (d_seg2 < r * r) & (da2 > r * r) & (db2 > r * r)

    def candidate(omega):
        # winding omega: +1 = counterclockwise travel a -> b around the arc
        t1x = (r * r * ax - omega * r * ta * ay) / da2s
        t1y = (r * r * ay + omega * r * ta * ax) / da2s
        t2x = (r * r * bx + omega * r * tb * by) / db2s
        t2y = (r * r * by - omega * r * tb * bx) / db2s
        # arc angle from t1 to t2 traveling in direction omega, in [0, 2pi)
        cosd = (t1x * t2x + t1y * t2y) / jnp.maximum(r * r, _EPS)
        sind = omega * (t1x * t2y - t1y * t2x) / jnp.maximum(r * r, _EPS)
        dth = jnp.arctan2(sind, cosd)
        dth = jnp.where(dth < 0.0, dth + 2.0 * np.pi, dth)
        return (t1x, t1y), (t2x, t2y), dth

    t1p, t2p, dth_p = candidate(1.0)
    t1m, t2m, dth_m = candidate(-1.0)
    if side_sign is None:
        pick_p = dth_p <= dth_m
    else:
        # side of the candidate's tangent point vs the chord a -> b must
        # match the sidesite's side; fall back to shorter when ambiguous
        def side_of(t):
            return (bx - ax) * (t[1] - ay) - (by - ay) * (t[0] - ax)
        sp = side_of(t1p) + side_of(t2p)
        pick_p = jnp.where(side_sign * sp > 0, True,
                           jnp.where(side_sign * (side_of(t1m)
                                                  + side_of(t2m)) > 0,
                                     False, dth_p <= dth_m))
    t1 = tuple(jnp.where(pick_p, p, m) for p, m in zip(t1p, t1m))
    t2 = tuple(jnp.where(pick_p, p, m) for p, m in zip(t2p, t2m))
    arc = r * jnp.where(pick_p, dth_p, dth_m)
    return active, t1, t2, ta, arc, tb


# ---------------------------------------------------------------------------
# wrap elements in 3D
# ---------------------------------------------------------------------------

def _wrap_sphere(P, Q, O, r, S):
    """Wrap the P->Q segment around a sphere (center O, radius r), sidesite
    world position S or None. Returns (active, T1, T2, L_wrapped) with T1/T2
    world tangent points (material points of the wrap body)."""
    a = _sub(P, O)
    b = _sub(Q, O)
    # plane basis: x along a, y completing in the (a, b) plane
    xh, la = _normalize(a)
    b_x = _dot(b, xh)
    y0 = _sub(b, _scale(xh, b_x))
    # degenerate (a, b collinear): pick any perpendicular to x
    ny0 = jnp.sqrt(jnp.maximum(_dot(y0, y0), 0.0))
    fallback = _cross(xh, (jnp.ones_like(xh[0]), jnp.zeros_like(xh[0]),
                           jnp.zeros_like(xh[0])))
    fb2 = _cross(xh, (jnp.zeros_like(xh[0]), jnp.ones_like(xh[0]),
                      jnp.zeros_like(xh[0])))
    use_fb2 = _dot(fallback, fallback) < 1e-6
    fallback = tuple(jnp.where(use_fb2, f2, f1)
                     for f1, f2 in zip(fallback, fb2))
    ok = ny0 * ny0 > _EPS
    y0 = tuple(jnp.where(ok, c, f) for c, f in zip(y0, fallback))
    yh, _ = _normalize(y0)
    ax_, ay_ = la, jnp.zeros_like(la)
    bx_, by_ = b_x, _dot(b, yh)
    side = None
    if S is not None:
        s = _sub(S, O)
        sx, sy = _dot(s, xh), _dot(s, yh)
        side = jnp.sign((bx_ - ax_) * (sy - ay_) - (by_ - ay_) * (sx - ax_))
    active, t1, t2, ta, arc, tb = _wrap_2d(ax_, ay_, bx_, by_, r, side)
    T1 = _add(O, _add(_scale(xh, t1[0]), _scale(yh, t1[1])))
    T2 = _add(O, _add(_scale(xh, t2[0]), _scale(yh, t2[1])))
    return active, T1, T2, ta + arc + tb


def _wrap_cylinder(P, Q, O, zh, r, S):
    """Wrap the P->Q segment around an infinite cylinder (point O on the
    axis, unit world axis zh, radius r). The geodesic is tangent - helix -
    tangent; unrolled it is a straight line, so the axial coordinate varies
    linearly with 2D path length (exactly MuJoCo's construction)."""
    a3 = _sub(P, O)
    b3 = _sub(Q, O)
    az = _dot(a3, zh)
    bz = _dot(b3, zh)
    aperp = _sub(a3, _scale(zh, az))
    bperp = _sub(b3, _scale(zh, bz))
    xh, la = _normalize(aperp)
    yh = _cross(zh, xh)
    ax_, ay_ = la, jnp.zeros_like(la)
    bx_, by_ = _dot(bperp, xh), _dot(bperp, yh)
    side = None
    if S is not None:
        s3 = _sub(S, O)
        sp = _sub(s3, _scale(zh, _dot(s3, zh)))
        sx, sy = _dot(sp, xh), _dot(sp, yh)
        side = jnp.sign((bx_ - ax_) * (sy - ay_) - (by_ - ay_) * (sx - ax_))
    active, t1, t2, ta, arc, tb = _wrap_2d(ax_, ay_, bx_, by_, r, side)
    # axial interpolation by 2D path-length fraction (unrolled straight line)
    total2d = jnp.maximum(ta + arc + tb, _EPS)
    z1 = az + (bz - az) * ta / total2d
    z2 = az + (bz - az) * (ta + arc) / total2d
    T1 = _add(O, _add(_add(_scale(xh, t1[0]), _scale(yh, t1[1])),
                      _scale(zh, z1)))
    T2 = _add(O, _add(_add(_scale(xh, t2[0]), _scale(yh, t2[1])),
                      _scale(zh, z2)))
    dz = bz - az
    L = jnp.sqrt(total2d * total2d + dz * dz)
    return active, T1, T2, L


# ---------------------------------------------------------------------------
# public evaluation
# ---------------------------------------------------------------------------

def _seg_jac(v_o, w_o, anc, b0, p0, b1, p1, u, dtype):
    """Moment-arm contribution of a straight segment: for each dof d,
    u . (dp1/dq_d - dp0/dq_d), where dp/dq_d of a material point p on body
    b is anc[b, d] * (v_o[d] + w_o[d] x p). Returns (D, ...)."""
    def side(b, p):
        if b < 0:
            return 0.0
        col = jnp.asarray(anc[b].astype(np.float32), dtype=dtype)
        col = col.reshape(col.shape + (1,) * (u[0].ndim))     # (D, 1...)
        u_v = sum(uc[None] * vc for uc, vc in zip(u, v_o))    # (D, ...)
        pxu = _cross(p, u)
        pxu_w = sum(pc[None] * wc for pc, wc in zip(pxu, w_o))
        return col * (u_v + pxu_w)
    return side(b1, p1) - side(b0, p0)


def eval_spatial_tendons(paths: Sequence[SpatialTendonPath], bp, bq,
                         v_o=None, w_o=None, anc=None):
    """Evaluate spatial tendon lengths (and optionally moment arms).

    Args:
        paths: static path descriptions.
        bp/bq: body position/quaternion component tuples of ``(B, ...)``.
        v_o/w_o: world dof subspace component tuples of ``(D, ...)`` (from
            ``dof_subspace``/``_dof_subspace_t``); None for lengths only.
        anc: (B, D) bool ancestor mask (GeneralizedCache.anc).
    Returns:
        (lengths, jacs): lists per tendon of ``(...)`` lengths and
        ``(D, ...)`` moment rows (jacs is None when v_o is None).
    """
    dtype = bp[0].dtype
    want_jac = v_o is not None
    lengths: List = []
    jacs: Optional[List] = [] if want_jac else None
    for path in paths:
        elems = path.elems
        L = jnp.zeros_like(bp[0][0])
        J = 0.0
        i = 0
        prev_body, prev_pt = elems[0][1], _point_world(
            bp, bq, elems[0][1], elems[0][2], dtype)
        i = 1
        while i < len(elems):
            e = elems[i]
            if e[0] == "site":
                body, pt = e[1], _point_world(bp, bq, e[1], e[2], dtype)
                seg = _sub(pt, prev_pt)
                slen = _norm(seg)
                L = L + slen
                if want_jac:
                    u = _scale(seg, 1.0 / slen)
                    J = J + _seg_jac(v_o, w_o, anc, prev_body, prev_pt,
                                     body, pt, u, dtype)
                prev_body, prev_pt = body, pt
                i += 1
                continue
            # wrap element between prev site and the next site
            nxt = elems[i + 1]
            nbody, npt = nxt[1], _point_world(bp, bq, nxt[1], nxt[2], dtype)
            wbody = e[1]
            O = _point_world(bp, bq, wbody, e[2], dtype)
            if e[0] == "sphere":
                r, sloc = e[3], e[4]
                S = (None if sloc is None
                     else _point_world(bp, bq, wbody, sloc, dtype))
                active, T1, T2, Lw = _wrap_sphere(prev_pt, npt, O,
                                                  float(r), S)
            else:
                axis, r, sloc = e[3], e[4], e[5]
                zh = _axis_world(bq, wbody, axis, dtype)
                S = (None if sloc is None
                     else _point_world(bp, bq, wbody, sloc, dtype))
                active, T1, T2, Lw = _wrap_cylinder(prev_pt, npt, O, zh,
                                                    float(r), S)
            seg = _sub(npt, prev_pt)
            Ls = _norm(seg)
            L = L + jnp.where(active, Lw, Ls)
            if want_jac:
                us = _scale(seg, 1.0 / Ls)
                J_straight = _seg_jac(v_o, w_o, anc, prev_body, prev_pt,
                                      nbody, npt, us, dtype)
                s1 = _sub(T1, prev_pt)
                l1 = _norm(s1)
                u1 = _scale(s1, 1.0 / l1)
                s2 = _sub(npt, T2)
                l2 = _norm(s2)
                u2 = _scale(s2, 1.0 / l2)
                J_wrap = (_seg_jac(v_o, w_o, anc, prev_body, prev_pt,
                                   wbody, T1, u1, dtype)
                          + _seg_jac(v_o, w_o, anc, wbody, T2,
                                     nbody, npt, u2, dtype))
                J = J + jnp.where(active[None], J_wrap, J_straight)
            prev_body, prev_pt = nbody, npt
            i += 2
        lengths.append(L)
        if want_jac:
            jacs.append(J)
    return lengths, jacs


def spatial_tendon_rest_length(path: SpatialTendonPath,
                               body_q: Sequence[np.ndarray]) -> float:
    """Host-side path length at the build pose (used for default rest
    lengths at finalize; same math as the runtime, numpy in/out)."""
    bqm = np.asarray([np.asarray(x, dtype=np.float64) for x in body_q])
    if bqm.size == 0:
        bqm = np.zeros((1, 7))
        bqm[:, 6] = 1.0
    bp = tuple(jnp.asarray(bqm[:, k]) for k in range(3))
    bq = tuple(jnp.asarray(bqm[:, 3 + k]) for k in range(4))
    L, _ = eval_spatial_tendons([path], bp, bq)
    return float(L[0])
