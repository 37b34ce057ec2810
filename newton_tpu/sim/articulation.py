"""Batched articulation kinematics: eval_fk / eval_ik.

TPU-native re-design of reference newton/_src/sim/articulation.py:500-1172.
The reference walks each articulation's joints sequentially inside one Warp
thread; here FK is **level-parallel**: joints are grouped by depth in the
kinematic tree (host-precomputed), every level is processed for ALL joints of
ALL worlds at once with vectorized gathers/scatters, and the level loop is a
static Python unroll (tree depth is small and static). Per-joint motion is
computed branch-free for every joint simultaneously — the axis-composition
formula reproduces REVOLUTE / PRISMATIC / D6 / FIXED in one code path, with
BALL and FREE/DISTANCE selected by static masks.

Conventions (match reference docs/concepts/conventions.rst):
- body_qd = [v_com, omega] world frame; FREE joint qd = [v, w].
- BALL coords = quaternion xyzw; FREE coords = [p, q_xyzw].
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..math import (
    quat_from_axis_angle,
    quat_identity,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_rotate_inv,
    quat_to_axis_angle,
    transform_inverse,
    transform_multiply,
    transform_point,
    transform_vector,
)
from .enums import JointType
from .model import Model, ModelStructure
from .state import State

__all__ = ["eval_fk", "eval_ik", "KinematicCache", "get_kinematic_cache",
           "joint_motion"]


class KinematicCache:
    """Host-precomputed static gather/scatter plans for vectorized kinematics.

    Built once per ModelStructure; all members are numpy (become compile-time
    constants under jit).
    """

    def __init__(self, st: ModelStructure):
        J = st.joint_count
        self.joint_count = J
        jq = st.joint_q_start
        jqd = st.joint_qd_start
        Q = int(jq[-1]) if J else 0
        D = int(jqd[-1]) if J else 0

        # coord/dof widths
        q_width = (jq[1:] - jq[:-1]) if J else np.zeros(0, dtype=np.int32)
        qd_width = (jqd[1:] - jqd[:-1]) if J else np.zeros(0, dtype=np.int32)

        def gather_plan(starts, widths, maxw, total):
            idx = np.zeros((J, maxw), dtype=np.int32)
            mask = np.zeros((J, maxw), dtype=np.float32)
            for j in range(J):
                for k in range(maxw):
                    if k < widths[j]:
                        idx[j, k] = starts[j] + k
                        mask[j, k] = 1.0
                    else:
                        idx[j, k] = min(starts[j], max(total - 1, 0))
            return idx, mask

        self.q_idx, self.q_mask = gather_plan(jq[:-1], q_width, 7, Q)
        self.qd_idx, self.qd_mask = gather_plan(jqd[:-1], qd_width, 6, D)

        # linear/angular axis plans (D6-style joints store linear dofs first)
        lin_n = st.joint_dof_dim[:, 0] if J else np.zeros(0, dtype=np.int32)
        ang_n = st.joint_dof_dim[:, 1] if J else np.zeros(0, dtype=np.int32)
        # BALL/FREE use canonical axes appended by the builder; their
        # axis-composition path is unused (masked), so counts of 0 are fine.
        self.lin_axis_idx = np.zeros((J, 3), dtype=np.int32)
        self.lin_mask = np.zeros((J, 3), dtype=np.float32)
        self.ang_axis_idx = np.zeros((J, 3), dtype=np.int32)
        self.ang_mask = np.zeros((J, 3), dtype=np.float32)
        # coord index of each linear/angular dof (angular coords follow linear)
        self.lin_q_idx = np.zeros((J, 3), dtype=np.int32)
        self.ang_q_idx = np.zeros((J, 3), dtype=np.int32)
        self.lin_qd_idx = np.zeros((J, 3), dtype=np.int32)
        self.ang_qd_idx = np.zeros((J, 3), dtype=np.int32)
        for j in range(J):
            t = JointType(int(st.joint_type[j]))
            # CABLE joints carry no joint_q coords (enums.dof_count): their
            # axis-composition masks must stay zero or they would gather the
            # next joint's coordinates
            excl = (JointType.BALL, JointType.FREE, JointType.DISTANCE,
                    JointType.CABLE)
            ln = int(lin_n[j]) if t not in excl else 0
            an = int(ang_n[j]) if t not in excl else 0
            for k in range(3):
                self.lin_axis_idx[j, k] = jqd[j] + min(k, max(ln - 1, 0))
                self.ang_axis_idx[j, k] = jqd[j] + ln + min(k, max(an - 1, 0))
                self.lin_q_idx[j, k] = jq[j] + min(k, max(ln - 1, 0))
                self.ang_q_idx[j, k] = jq[j] + ln + min(k, max(an - 1, 0))
                self.lin_qd_idx[j, k] = self.lin_axis_idx[j, k]
                self.ang_qd_idx[j, k] = self.ang_axis_idx[j, k]
                if k < ln:
                    self.lin_mask[j, k] = 1.0
                if k < an:
                    self.ang_mask[j, k] = 1.0
        # clamp all indices to valid range for empty models
        if Q:
            self.lin_q_idx = np.clip(self.lin_q_idx, 0, Q - 1)
            self.ang_q_idx = np.clip(self.ang_q_idx, 0, Q - 1)
        if D:
            for a in (self.lin_axis_idx, self.ang_axis_idx,
                      self.lin_qd_idx, self.ang_qd_idx):
                np.clip(a, 0, D - 1, out=a)

        # joint-type static masks
        jt = st.joint_type
        self.is_ball = (jt == int(JointType.BALL)) if J else np.zeros(0, bool)
        self.is_free = (np.isin(jt, [int(JointType.FREE), int(JointType.DISTANCE)])
                        if J else np.zeros(0, bool))
        self.is_cable = (jt == int(JointType.CABLE)) if J else np.zeros(0, bool)

        # levels: depth of each joint in the chain via joint_parent_joint
        depth = np.zeros(J, dtype=np.int32)
        for j in range(J):
            pj = int(st.joint_parent_joint[j])
            depth[j] = 0 if pj < 0 else depth[pj] + 1
        self.max_depth = int(depth.max()) + 1 if J else 0
        self.levels: List[np.ndarray] = [
            np.nonzero(depth == d)[0].astype(np.int32)
            for d in range(self.max_depth)
        ]
        self.depth = depth

        # per-joint articulation id (for masked FK)
        self.joint_articulation = np.zeros(J, dtype=np.int32)
        art_start = st.articulation_start
        for a in range(len(art_start) - 1):
            self.joint_articulation[art_start[a]:art_start[a + 1]] = a


def get_kinematic_cache(st: ModelStructure) -> KinematicCache:
    cache = getattr(st, "_kin_cache", None)
    if cache is None:
        cache = KinematicCache(st)
        st._kin_cache = cache
    return cache


def joint_motion(model: Model, joint_q: jnp.ndarray, joint_qd: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local joint transforms X_j (J, 7) and twists v_j (J, 6 [v, w]) in the
    parent-anchor frame, for all joints at once (branch-free).

    Mirrors reference eval_single_articulation_fk's per-type motion
    (articulation.py:284-380) as one vectorized computation.
    """
    st = model.structure
    kc = get_kinematic_cache(st)
    J = kc.joint_count
    dtype = joint_q.dtype

    if J == 0:
        return (jnp.zeros((0, 7), dtype=dtype), jnp.zeros((0, 6), dtype=dtype))

    q_mask = jnp.asarray(kc.q_mask, dtype=dtype)
    if joint_q.shape[0]:                                # (J, 7)
        qj = joint_q[kc.q_idx] * q_mask
    else:  # all joints coord-free (FIXED/CABLE chains)
        qj = jnp.zeros((J, 7), dtype=dtype)
    if joint_qd.shape[0]:
        qdj = joint_qd[kc.qd_idx] * jnp.asarray(kc.qd_mask, dtype=dtype)
    else:
        qdj = jnp.zeros((J, 6), dtype=dtype)

    lin_mask = jnp.asarray(kc.lin_mask, dtype=dtype)    # (J, 3)
    ang_mask = jnp.asarray(kc.ang_mask, dtype=dtype)
    A_lin = model.joint_axis[kc.lin_axis_idx] * lin_mask[..., None]   # (J,3,3)
    A_ang_raw = model.joint_axis[kc.ang_axis_idx]                     # (J,3,3)
    # pad unused angular axes with unit X so axis-angle stays finite
    pad = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=dtype), A_ang_raw.shape)
    A_ang = jnp.where(ang_mask[..., None] > 0, A_ang_raw, pad)

    if joint_q.shape[0]:
        q_lin = joint_q[kc.lin_q_idx] * lin_mask        # (J, 3)
        q_ang = joint_q[kc.ang_q_idx] * ang_mask
    else:
        q_lin = jnp.zeros((J, 3), dtype=dtype)
        q_ang = jnp.zeros((J, 3), dtype=dtype)
    if joint_qd.shape[0]:
        qd_lin = joint_qd[kc.lin_qd_idx] * lin_mask
        qd_ang = joint_qd[kc.ang_qd_idx] * ang_mask
    else:
        qd_lin = jnp.zeros((J, 3), dtype=dtype)
        qd_ang = jnp.zeros((J, 3), dtype=dtype)

    # --- unified axis-composition path (PRISMATIC/REVOLUTE/D6/FIXED) ---
    pos = jnp.einsum("jk,jkc->jc", q_lin, A_lin)
    vel_v = jnp.einsum("jk,jkc->jc", qd_lin, A_lin)
    # intrinsic axis transport (reference transform_3d_rotational_axes :128)
    a0 = A_ang[:, 0]
    r0 = quat_from_axis_angle(a0, q_ang[:, 0])
    a1 = quat_rotate(r0, A_ang[:, 1])
    r1 = quat_from_axis_angle(a1, q_ang[:, 1])
    r10 = quat_mul(r1, r0)
    a2 = quat_rotate(r10, A_ang[:, 2])
    r2 = quat_from_axis_angle(a2, q_ang[:, 2])
    rot = quat_mul(r2, r10)
    vel_w = (a0 * qd_ang[:, 0:1] + a1 * qd_ang[:, 1:2] + a2 * qd_ang[:, 2:3])

    # --- BALL: quaternion coords, angular-velocity dofs in joint frame ---
    ball = jnp.asarray(kc.is_ball)[:, None]
    rot = jnp.where(ball, quat_normalize(qj[:, 0:4]), rot)
    vel_w = jnp.where(ball, qdj[:, 0:3], vel_w)

    # --- FREE/DISTANCE: full 7-dof transform, qd = [v, w] ---
    free = jnp.asarray(kc.is_free)[:, None]
    pos = jnp.where(free, qj[:, 0:3], pos)
    rot = jnp.where(free, quat_normalize(qj[:, 3:7]), rot)
    vel_v = jnp.where(free, qdj[:, 0:3], vel_v)
    vel_w = jnp.where(free, qdj[:, 3:6], vel_w)

    X_j = jnp.concatenate([pos, rot], axis=-1)
    v_j = jnp.concatenate([vel_v, vel_w], axis=-1)
    return X_j, v_j


def eval_fk(model: Model, joint_q: jnp.ndarray, joint_qd: jnp.ndarray,
            state: State, mask: Optional[jnp.ndarray] = None) -> State:
    """Forward kinematics: generalized coords -> body transforms/velocities.

    Returns a new State with ``body_q``/``body_qd`` computed from
    ``joint_q``/``joint_qd`` (reference: articulation.py:500 eval_fk).

    Args:
        mask: optional (articulation_count,) bool; articulations with
            ``mask=False`` keep their existing state (partial RL resets,
            reference articulation.py:505-531).
    """
    st = model.structure
    kc = get_kinematic_cache(st)
    body_q, body_qd = _fk_bodies(model, joint_q, joint_qd,
                                 state.body_q, state.body_qd, mask)
    return state.replace(body_q=body_q, body_qd=body_qd,
                         joint_q=joint_q, joint_qd=joint_qd)


def _fk_bodies(model: Model, joint_q, joint_qd, body_q0, body_qd0, mask=None):
    st = model.structure
    kc = get_kinematic_cache(st)
    dtype = joint_q.dtype
    if kc.joint_count == 0:
        return body_q0, body_qd0

    X_j, v_j = joint_motion(model, joint_q, joint_qd)

    if mask is not None:
        joint_on = mask[kc.joint_articulation]          # (J,) bool
    else:
        joint_on = None

    identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
    body_q = body_q0
    body_qd = body_qd0
    is_free = jnp.asarray(kc.is_free)

    for level in kc.levels:
        j = level                                        # static numpy indices
        parent = st.joint_parent[j]                      # static numpy
        child = st.joint_child[j]
        has_parent = jnp.asarray(parent >= 0)[:, None]
        parent_c = np.maximum(parent, 0)

        X_wp = jnp.where(has_parent, body_q[parent_c], identity)
        X_wpj = transform_multiply(X_wp, model.joint_X_p[j])
        X_wcj = transform_multiply(X_wpj, X_j[j])
        X_wc = transform_multiply(X_wcj, transform_inverse(model.joint_X_c[j]))

        # velocities (reference articulation.py:388-424)
        x_child = X_wc[:, 0:3]
        qd_p = jnp.where(has_parent, body_qd[parent_c], 0.0)
        w_parent = qd_p[:, 3:6]
        com_p_world = transform_point(X_wp, model.body_com[parent_c])
        v_parent_origin = qd_p[:, 0:3] + jnp.cross(w_parent, x_child - com_p_world)

        lin_w = quat_rotate(X_wpj[:, 3:7], v_j[j][:, 0:3])
        ang_w = quat_rotate(X_wpj[:, 3:7], v_j[j][:, 3:6])
        com_c_world_vec = quat_rotate(X_wc[:, 3:7], model.body_com[child])
        # FREE joints define their linear dof at the child COM; others at the
        # child joint anchor (reference :402-418)
        lin_origin_free = lin_w - jnp.cross(ang_w, com_c_world_vec)
        lin_origin_anchor = lin_w + jnp.cross(ang_w, x_child - X_wcj[:, 0:3])
        freemask = is_free[j][:, None]
        lin_origin = jnp.where(freemask, lin_origin_free, lin_origin_anchor)

        w_total = w_parent + ang_w
        v_origin = v_parent_origin + lin_origin
        v_com = v_origin + jnp.cross(w_total, com_c_world_vec)
        qd_c = jnp.concatenate([v_com, w_total], axis=-1)

        if joint_on is not None:
            on = joint_on[j][:, None]
            X_wc = jnp.where(on, X_wc, body_q[child])
            qd_c = jnp.where(on, qd_c, body_qd[child])
        body_q = body_q.at[child].set(X_wc)
        body_qd = body_qd.at[child].set(qd_c)

    return body_q, body_qd


def eval_ik(model: Model, state: State,
            mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse kinematics: body transforms/velocities -> generalized coords.

    Maps maximal coordinates back to (joint_q, joint_qd)
    (reference: articulation.py:863 eval_ik, per-type inversion :739-830).
    """
    st = model.structure
    kc = get_kinematic_cache(st)
    J = kc.joint_count
    dtype = state.body_q.dtype
    joint_q = jnp.zeros((st.joint_coord_count,), dtype=dtype)
    joint_qd = jnp.zeros((st.joint_dof_count,), dtype=dtype)
    if J == 0:
        return joint_q, joint_qd

    identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
    parent = st.joint_parent
    child = st.joint_child
    parent_c = np.maximum(parent, 0)
    has_parent = jnp.asarray(parent >= 0)[:, None]

    X_wp = jnp.where(has_parent, state.body_q[parent_c], identity)
    X_wpj = transform_multiply(X_wp, model.joint_X_p)   # (J, 7)
    X_wc = state.body_q[child]
    X_wcj = transform_multiply(X_wc, model.joint_X_c)
    # relative joint transform
    rel = transform_multiply(transform_inverse(X_wpj), X_wcj)  # (J, 7)

    qd_p = jnp.where(has_parent, state.body_qd[parent_c], 0.0)
    qd_c = state.body_qd[child]
    # velocities relative to parent, expressed at child anchor, world frame
    w_rel = qd_c[:, 3:6] - qd_p[:, 3:6]
    x_anchor = X_wcj[:, 0:3]
    com_p = transform_point(X_wp, model.body_com[parent_c])
    com_c = transform_point(X_wc, model.body_com[child])
    v_p_at = qd_p[:, 0:3] + jnp.cross(qd_p[:, 3:6], x_anchor - com_p)
    v_c_at = qd_c[:, 0:3] + jnp.cross(qd_c[:, 3:6], x_anchor - com_c)
    v_rel = v_c_at - v_p_at

    # express in parent joint frame
    q_pj = X_wpj[:, 3:7]
    rel_p = rel[:, 0:3]
    w_rel_j = quat_rotate_inv(q_pj, w_rel)
    v_rel_j = quat_rotate_inv(q_pj, v_rel)

    lin_mask = jnp.asarray(kc.lin_mask, dtype=dtype)
    ang_mask = jnp.asarray(kc.ang_mask, dtype=dtype)
    A_lin = model.joint_axis[kc.lin_axis_idx] * lin_mask[..., None]
    A_ang_raw = model.joint_axis[kc.ang_axis_idx]
    pad = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=dtype), A_ang_raw.shape)
    A_ang = jnp.where(ang_mask[..., None] > 0, A_ang_raw, pad)

    # linear coords: project anchor displacement on linear axes
    q_lin = jnp.einsum("jc,jkc->jk", rel_p, A_lin)        # (J, 3)
    qd_lin = jnp.einsum("jc,jkc->jk", v_rel_j, A_lin)

    # angular: single-axis exact; multi-axis via swing-twist style decompose
    axis0 = A_ang[:, 0]
    axis_out, ang = quat_to_axis_angle(rel[:, 3:7])
    q_ang0 = ang * jnp.sum(axis_out * axis0, axis=-1)
    qd_ang0 = jnp.sum(w_rel_j * axis0, axis=-1)

    # scatter into flat coord arrays
    for j in range(J):
        t = JointType(int(st.joint_type[j]))
        qs = int(st.joint_q_start[j])
        ds = int(st.joint_qd_start[j])
        if t == JointType.FIXED or t == JointType.CABLE:
            continue
        if t == JointType.PRISMATIC:
            joint_q = joint_q.at[qs].set(q_lin[j, 0])
            joint_qd = joint_qd.at[ds].set(qd_lin[j, 0])
        elif t == JointType.REVOLUTE:
            joint_q = joint_q.at[qs].set(q_ang0[j])
            joint_qd = joint_qd.at[ds].set(qd_ang0[j])
        elif t == JointType.BALL:
            joint_q = joint_q.at[qs:qs + 4].set(rel[j, 3:7])
            joint_qd = joint_qd.at[ds:ds + 3].set(w_rel_j[j])
        elif t in (JointType.FREE, JointType.DISTANCE):
            joint_q = joint_q.at[qs:qs + 7].set(rel[j])
            # FREE qd = [v_com_rel, w_rel] world frame
            v_com_rel = qd_c[j, 0:3] - qd_p[j, 0:3]
            joint_qd = joint_qd.at[ds:ds + 3].set(v_com_rel)
            joint_qd = joint_qd.at[ds + 3:ds + 6].set(w_rel[j])
        else:  # D6
            ln = int(st.joint_dof_dim[j, 0])
            an = int(st.joint_dof_dim[j, 1])
            for k in range(ln):
                joint_q = joint_q.at[qs + k].set(q_lin[j, k])
                joint_qd = joint_qd.at[ds + k].set(qd_lin[j, k])
            if an >= 1:
                joint_q = joint_q.at[qs + ln].set(q_ang0[j])
                joint_qd = joint_qd.at[ds + ln].set(qd_ang0[j])
            # higher angular dofs: projected approximations
            for k in range(1, an):
                axk = A_ang[j, k]
                joint_q = joint_q.at[qs + ln + k].set(
                    ang[j] * jnp.sum(axis_out[j] * axk))
                joint_qd = joint_qd.at[ds + ln + k].set(
                    jnp.sum(w_rel_j[j] * axk))
    return joint_q, joint_qd
