"""Generalized-coordinate dynamics: dense batched CRBA + RNEA on TPU.

TPU-native replacement for the reference's two generalized-coordinate
backends — SolverFeatherstone's CRBA/Cholesky pipeline
(reference newton/_src/solvers/featherstone/solver_featherstone.py:57, tiled
GEMM option :140-160) and the MuJoCo-Warp bridge's smooth dynamics
(solver_mujoco.py:3830). Instead of per-articulation sequential Featherstone
recursions in one thread, everything is **dense, masked and batched**:

- Each dof's motion subspace is a world-frame twist referenced at the world
  origin (v_o, w). An ancestor mask ``Anc[b, d]`` (static, from topology)
  says whether dof d moves body b.
- CRBA:  M[d,e] = sum_b Anc[b,d] Anc[b,e] * S_d(b) . I_b S_e(b) — three
  einsums over (bodies, dofs) that XLA maps straight onto the MXU, batched
  over articulation groups (n_envs, dofs, dofs).
- Bias forces: origin-referenced RNEA with the gravity-as-base-acceleration
  trick, forward/backward sweeps over static depth levels.

Articulations are grouped by topology signature; each group is one batched
computation (n articulations of d dofs -> (n, d, d) operands). A replicated
RL scene is exactly one group of n_worlds entries — the (4096, nv, nv)
batched Cholesky the north-star workload needs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...math import quat_rotate, quat_to_matrix, transform_multiply
from ...sim.articulation import get_kinematic_cache
from ...sim.enums import JointType
from ...sim.model import Model, ModelStructure

__all__ = ["GeneralizedCache", "get_generalized_cache", "dof_subspace",
           "group_mass_matrix", "group_bias_forces", "integrate_coords"]


class ArticulationGroup:
    """A set of articulations with identical topology, batched together."""

    __slots__ = ("arts", "dof_idx", "body_idx", "anc", "n", "d", "b",
                 "coord_idx", "nq")

    def __init__(self, arts, dof_idx, body_idx, anc, coord_idx):
        self.arts = np.asarray(arts, dtype=np.int32)
        self.dof_idx = dof_idx      # (n, d) global dof indices
        self.body_idx = body_idx    # (n, b) global body indices
        self.anc = anc              # (b, d) ancestor mask (shared, static)
        self.coord_idx = coord_idx  # (n, nq) global coord indices
        self.n = dof_idx.shape[0]
        self.d = dof_idx.shape[1]
        self.b = body_idx.shape[1]
        self.nq = coord_idx.shape[1]


class GeneralizedCache:
    """Host-precomputed structures for generalized-coordinate dynamics."""

    def __init__(self, st: ModelStructure):
        kc = get_kinematic_cache(st)
        self.kc = kc
        J = st.joint_count
        D = st.joint_dof_count
        B = st.body_count
        self.D, self.B = D, B

        # dof -> joint map and per-dof kind
        dof_joint = np.zeros(D, dtype=np.int32)
        dof_is_linear = np.zeros(D, dtype=bool)
        dof_anchor_is_com = np.zeros(D, dtype=bool)  # free-joint angular dofs
        for j in range(J):
            t = JointType(int(st.joint_type[j]))
            s, e = int(st.joint_qd_start[j]), int(st.joint_qd_start[j + 1])
            dof_joint[s:e] = j
            if t in (JointType.FREE, JointType.DISTANCE):
                dof_is_linear[s:s + 3] = True
                dof_anchor_is_com[s + 3:e] = True
            elif t == JointType.PRISMATIC:
                dof_is_linear[s:e] = True
            elif t == JointType.D6:
                ln = int(st.joint_dof_dim[j, 0])
                dof_is_linear[s:s + ln] = True
            # BALL/REVOLUTE: all angular, anchored at the joint
        self.dof_joint = dof_joint
        self.dof_is_linear = dof_is_linear
        self.dof_anchor_is_com = dof_anchor_is_com
        # angular slot of each dof within its joint's angular block (-1 for
        # linear/ball/free dofs); used to pick the TRANSPORTED axis
        dof_ang_slot = -np.ones(D, dtype=np.int32)
        for j in range(J):
            t = JointType(int(st.joint_type[j]))
            if t in (JointType.BALL, JointType.FREE, JointType.DISTANCE):
                continue
            s0 = int(st.joint_qd_start[j])
            ln = int(st.joint_dof_dim[j, 0])
            an = int(st.joint_dof_dim[j, 1])
            for k in range(an):
                dof_ang_slot[s0 + ln + k] = k
        self.dof_ang_slot = dof_ang_slot
        self.dof_body = st.joint_child[dof_joint] if D else np.zeros(0, np.int32)

        # ancestor mask: dof d moves body b iff d's joint is on the path
        # from b to its articulation root
        anc = np.zeros((B, D), dtype=bool)
        # body -> its incoming joint (child_of)
        child_of = {int(st.joint_child[j]): j for j in range(J)}
        for b in range(B):
            j = child_of.get(b, -1)
            while j >= 0:
                s, e = int(st.joint_qd_start[j]), int(st.joint_qd_start[j + 1])
                anc[b, s:e] = True
                j = int(st.joint_parent_joint[j])
        self.anc = anc

        # articulation grouping by topology signature
        art_start = st.articulation_start
        A = len(art_start) - 1
        sigs: Dict[tuple, List[int]] = {}
        for a in range(A):
            j0, j1 = int(art_start[a]), int(art_start[a + 1])
            sig = []
            for j in range(j0, j1):
                pj = int(st.joint_parent_joint[j])
                sig.append((int(st.joint_type[j]), pj - j0 if pj >= 0 else -1,
                            int(st.joint_qd_start[j + 1] - st.joint_qd_start[j]),
                            int(st.joint_q_start[j + 1] - st.joint_q_start[j])))
            sigs.setdefault(tuple(sig), []).append(a)

        self.groups: List[ArticulationGroup] = []
        for sig, arts in sigs.items():
            if not sig:
                continue
            dof_rows, body_rows, coord_rows = [], [], []
            for a in arts:
                j0, j1 = int(art_start[a]), int(art_start[a + 1])
                d0 = int(st.joint_qd_start[j0])
                d1 = int(st.joint_qd_start[j1])
                q0 = int(st.joint_q_start[j0])
                q1 = int(st.joint_q_start[j1])
                dof_rows.append(np.arange(d0, d1, dtype=np.int32))
                coord_rows.append(np.arange(q0, q1, dtype=np.int32))
                bodies = sorted({int(st.joint_child[j]) for j in range(j0, j1)})
                body_rows.append(np.asarray(bodies, dtype=np.int32))
            dof_idx = np.stack(dof_rows)
            body_idx = np.stack(body_rows)
            coord_idx = np.stack(coord_rows)
            anc_g = anc[body_rows[0]][:, dof_rows[0]]
            self.groups.append(ArticulationGroup(arts, dof_idx, body_idx,
                                                 anc_g, coord_idx))

        # coordinate integration plan (vectorized in integrate_coords)
        self.lin_coord_idx = []      # coords integrated linearly
        self.lin_coord_dof = []
        self.quat_coord_starts = []  # (q_start, dof_start, parent-frame?) ball
        self.free_joints = []        # (q_start, dof_start)
        for j in range(J):
            t = JointType(int(st.joint_type[j]))
            qs, ds = int(st.joint_q_start[j]), int(st.joint_qd_start[j])
            nq = int(st.joint_q_start[j + 1]) - qs
            if t == JointType.BALL:
                self.quat_coord_starts.append((qs, ds))
            elif t in (JointType.FREE, JointType.DISTANCE):
                self.free_joints.append((qs, ds, int(st.joint_child[j])))
            else:
                for k in range(nq):
                    self.lin_coord_idx.append(qs + k)
                    self.lin_coord_dof.append(ds + k)
        self.lin_coord_idx = np.asarray(self.lin_coord_idx, dtype=np.int32)
        self.lin_coord_dof = np.asarray(self.lin_coord_dof, dtype=np.int32)
        self.quat_coord_starts = np.asarray(self.quat_coord_starts,
                                            dtype=np.int32).reshape(-1, 2)
        self.free_joints = np.asarray(self.free_joints,
                                      dtype=np.int32).reshape(-1, 3)


def get_generalized_cache(st: ModelStructure) -> GeneralizedCache:
    cache = getattr(st, "_gen_cache", None)
    if cache is None:
        cache = GeneralizedCache(st)
        st._gen_cache = cache
    return cache


def dof_subspace(model: Model, body_q: jnp.ndarray,
                 joint_q: Optional[jnp.ndarray] = None):
    """World-frame motion subspace of every dof, referenced at the origin.

    Returns (v_o (D, 3), w (D, 3)): twist of a unit velocity of dof d.
    Linear dofs: v = world axis, w = 0. Angular dofs: w = world axis,
    v_o = x_anchor x w (rotation about the axis through the anchor; free
    joints rotate about the child COM per the reference's COM-twist
    convention, articulation.py:402).

    ``joint_q`` enables the intrinsic axis transport for multi-angular D6
    joints (matching FK, articulation.py transform_3d_rotational_axes);
    without it the joint's reference axes are used — WRONG away from q=0
    (columns of M can align and the factorization explodes).
    """
    st = model.structure
    gc = get_generalized_cache(st)
    dtype = body_q.dtype
    D = gc.D
    if D == 0:
        return jnp.zeros((0, 3), dtype=dtype), jnp.zeros((0, 3), dtype=dtype)

    dj = gc.dof_joint
    parent = np.maximum(st.joint_parent[dj], 0)
    hasp = jnp.asarray(st.joint_parent[dj] >= 0)[:, None]
    identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
    X_wp = jnp.where(hasp, body_q[parent], identity)
    X_pj = transform_multiply(X_wp, model.joint_X_p[dj])   # (D, 7)

    local_axis = model.joint_axis
    if joint_q is not None and (gc.dof_ang_slot >= 0).any():
        from ...sim.articulation import get_kinematic_cache
        from ...math import quat_from_axis_angle, quat_mul
        kc = get_kinematic_cache(st)
        ang_mask = jnp.asarray(kc.ang_mask, dtype=dtype)
        A_raw = model.joint_axis[kc.ang_axis_idx]           # (J, 3, 3)
        pad = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=dtype),
                               A_raw.shape)
        A = jnp.where(ang_mask[..., None] > 0, A_raw, pad)
        q_ang = joint_q[kc.ang_q_idx] * ang_mask            # (J, 3)
        a0 = A[:, 0]
        r0 = quat_from_axis_angle(a0, q_ang[:, 0])
        a1 = quat_rotate(r0, A[:, 1])
        r10 = quat_mul(quat_from_axis_angle(a1, q_ang[:, 1]), r0)
        a2 = quat_rotate(r10, A[:, 2])
        transported = jnp.stack([a0, a1, a2], axis=1)       # (J, 3, 3)
        slot = np.maximum(gc.dof_ang_slot, 0)
        use = jnp.asarray(gc.dof_ang_slot >= 0)[:, None]
        local_axis = jnp.where(use, transported[dj, slot], local_axis)

    axis_w = quat_rotate(X_pj[:, 3:7], local_axis)          # (D, 3)

    child = gc.dof_body
    com_w = body_q[child][:, 0:3] + quat_rotate(
        body_q[child][:, 3:7], model.body_com[child])
    anchor = jnp.where(jnp.asarray(gc.dof_anchor_is_com)[:, None],
                       com_w, X_pj[:, 0:3])

    is_lin = jnp.asarray(gc.dof_is_linear)[:, None]
    w = jnp.where(is_lin, 0.0, axis_w)
    v = jnp.where(is_lin, axis_w, jnp.cross(anchor, axis_w))
    return v, w


def _body_spatial_inertia(model: Model, body_q: jnp.ndarray):
    """Per-body mass, world COM position, world-frame rotational inertia."""
    q = body_q[:, 3:7]
    x = body_q[:, 0:3] + quat_rotate(q, model.body_com)
    R = quat_to_matrix(q)
    I_w = jnp.einsum("bij,bjk,blk->bil", R, model.body_inertia, R)
    return model.body_mass, x, I_w


def group_mass_matrix(model: Model, body_q: jnp.ndarray,
                      g: ArticulationGroup,
                      v_o: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Batched CRBA: (n, d, d) joint-space mass matrices for one group."""
    m_b, x_b, I_w = _body_spatial_inertia(model, body_q)
    anc = jnp.asarray(g.anc, dtype=body_q.dtype)           # (b, d)

    vg = v_o[g.dof_idx]                                    # (n, d, 3)
    wg = w[g.dof_idx]
    xg = x_b[g.body_idx]                                   # (n, b, 3)
    mg = m_b[g.body_idx]                                   # (n, b)
    Ig = I_w[g.body_idx]                                   # (n, b, 3, 3)

    # linear velocity of dof d at body b's COM
    V = vg[:, None, :, :] + jnp.cross(wg[:, None, :, :], xg[:, :, None, :])
    V = V * anc[None, :, :, None]                          # (n, b, d, 3)
    Wm = wg[:, None, :, :] * anc[None, :, :, None]         # (n, b, d, 3)

    hp = jax.lax.Precision.HIGHEST
    M = (jnp.einsum("nb,nbdc,nbec->nde", mg, V, V, precision=hp)
         + jnp.einsum("nbdc,nbck,nbek->nde", Wm, Ig, Wm, precision=hp))
    arm = model.joint_armature[g.dof_idx]                  # (n, d)
    M = M + jnp.einsum("nd,de->nde", arm, jnp.eye(g.d, dtype=body_q.dtype))
    return M


def group_bias_forces(model: Model, body_q: jnp.ndarray, body_qd: jnp.ndarray,
                      v_o: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """RNEA bias torques (gravity + Coriolis/centrifugal) for ALL dofs.

    Origin-referenced spatial RNEA with qdd = 0 and base acceleration = -g
    (gravity trick), computed level-parallel across all articulations.
    Returns tau_bias (D,) such that M qdd + tau_bias = tau_applied.
    """
    st = model.structure
    gc = get_generalized_cache(st)
    kc = gc.kc
    dtype = body_q.dtype
    B = st.body_count
    D = gc.D
    if D == 0:
        return jnp.zeros((0,), dtype=dtype)

    m_b, x_b, I_w = _body_spatial_inertia(model, body_q)

    # body twists at the world origin [v_o, w]
    v_com = body_qd[:, 0:3]
    w_b = body_qd[:, 3:6]
    v_ob = v_com - jnp.cross(w_b, x_b)
    V_o = jnp.concatenate([v_ob, w_b], axis=-1)            # (B, 6)

    # gravity as base acceleration: A = [-g, 0] propagated to every body,
    # with per-world gravity
    w_idx = np.maximum(st.body_world, 0)
    g_vec = model.gravity[w_idx]                           # (B, 3)
    A = jnp.concatenate([-g_vec, jnp.zeros_like(g_vec)], axis=-1)  # (B, 6)

    # forward sweep by level: A_b = A_p + V_b x_m (V_b - V_p)  [qdd = 0];
    # A is pre-filled with the [-g, 0] base acceleration, which is exactly
    # the parent value a root joint sees
    from ...math.spatial import spatial_cross, spatial_cross_dual
    for level in kc.levels:
        j = level
        pb = st.joint_parent[j]
        cb = st.joint_child[j]
        pbc = np.maximum(pb, 0)
        hasp = jnp.asarray(pb >= 0)[:, None]
        V_p = jnp.where(hasp, V_o[pbc], 0.0)
        dV = V_o[cb] - V_p
        A_p = jnp.where(hasp, A[pbc], jnp.concatenate(
            [-g_vec[cb], jnp.zeros_like(g_vec[cb])], axis=-1))
        A_c = A_p + spatial_cross(V_o[cb], dV)
        A = A.at[cb].set(A_c)

    # per-body wrench at origin: F = I A + V x_f (I V)
    def apply_I(Vlike):
        a_v, a_w = Vlike[:, 0:3], Vlike[:, 3:6]
        f = m_b[:, None] * (a_v + jnp.cross(a_w, x_b))
        tau = (jnp.einsum("bij,bj->bi", I_w, a_w) + jnp.cross(x_b, f))
        return jnp.concatenate([f, tau], axis=-1)

    F = apply_I(A) + spatial_cross_dual(V_o, apply_I(V_o))  # (B, 6)

    # backward: accumulate child wrenches into parents, deepest level first
    F_hat = F
    for level in reversed(kc.levels):
        j = level
        pb = st.joint_parent[j]
        cb = st.joint_child[j]
        has = pb >= 0
        if has.any():
            src = cb[has]
            dst = pb[has]
            F_hat = F_hat.at[dst].add(F_hat[src])

    # project: tau_d = S_d . F_hat[child_body(d)]
    S = jnp.concatenate([v_o, w], axis=-1)                 # (D, 6)
    tau = jnp.einsum("dc,dc->d", S, F_hat[gc.dof_body])
    return tau


def group_external_forces(model: Model, body_q: jnp.ndarray,
                          body_f: jnp.ndarray, v_o: jnp.ndarray,
                          w: jnp.ndarray) -> jnp.ndarray:
    """Generalized forces from external world-frame body wrenches.

    ``body_f`` is ``State.body_f``: ``(B, 6)`` world ``[f, tau]`` at the
    COM — MuJoCo's ``xfrc_applied`` (the reference's SolverMuJoCo maps it
    through the same J^T projection, solver_mujoco.py apply-body-force
    path; SolverCoupled's consensus wrench exchange rides this too).
    Returns ``tau_ext (D,)`` to ADD to the applied generalized force.
    """
    st = model.structure
    gc = get_generalized_cache(st)
    dtype = body_q.dtype
    if gc.D == 0 or st.body_count == 0:
        return jnp.zeros((gc.D,), dtype=dtype)
    # origin-referenced wrench: tau_o = tau_com + x_com x f
    x_b = body_q[:, 0:3] + quat_rotate(body_q[:, 3:7], model.body_com)
    f = body_f[:, 0:3]
    tau_o = body_f[:, 3:6] + jnp.cross(x_b, f)
    F = jnp.concatenate([f, tau_o], axis=-1)               # (B, 6)
    # subtree accumulation, deepest level first (a dof feels every wrench
    # applied at or below its child body)
    for level in reversed(gc.kc.levels):
        pb = st.joint_parent[level]
        cb = st.joint_child[level]
        has = pb >= 0
        if has.any():
            F = F.at[pb[has]].add(F[cb[has]])
    S = jnp.concatenate([v_o, w], axis=-1)                 # (D, 6)
    return jnp.einsum("dc,dc->d", S, F[gc.dof_body])


def integrate_coords(model: Model, joint_q: jnp.ndarray, joint_qd: jnp.ndarray,
                     body_q: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Advance generalized coordinates by qd over dt.

    Linear coords advance linearly; BALL quaternions integrate in the joint
    frame; FREE joints advance COM position (their linear dofs are COM
    velocities, reference conventions.rst) and integrate orientation.
    """
    st = model.structure
    gc = get_generalized_cache(st)
    dtype = joint_q.dtype
    q = joint_q
    if len(gc.lin_coord_idx):
        q = q.at[gc.lin_coord_idx].add(dt * joint_qd[gc.lin_coord_dof])
    if len(gc.quat_coord_starts):
        qs = gc.quat_coord_starts[:, 0]
        ds = gc.quat_coord_starts[:, 1]
        idx4 = qs[:, None] + np.arange(4)[None, :]
        idx3 = ds[:, None] + np.arange(3)[None, :]
        quat = q[idx4]
        omega = joint_qd[idx3]                             # joint/parent frame
        from ...math import quat_integrate
        q = q.at[idx4].set(quat_integrate(quat, omega, dt))
    if len(gc.free_joints):
        qs = gc.free_joints[:, 0]
        ds = gc.free_joints[:, 1]
        child = gc.free_joints[:, 2]
        idx_p = qs[:, None] + np.arange(3)[None, :]
        idx_q = qs[:, None] + np.arange(3, 7)[None, :]
        idx_v = ds[:, None] + np.arange(3)[None, :]
        idx_w = ds[:, None] + np.arange(3, 6)[None, :]
        quat = q[idx_q]
        omega = joint_qd[idx_w]                            # world frame
        from ...math import quat_integrate, quat_rotate as qrot
        new_quat = quat_integrate(quat, omega, dt)
        com = model.body_com[child]
        p_com = q[idx_p] + qrot(quat, com)
        p_com = p_com + dt * joint_qd[idx_v]
        p_new = p_com - qrot(new_quat, com)
        q = q.at[idx_p].set(p_new)
        q = q.at[idx_q].set(new_quat)
    return q
