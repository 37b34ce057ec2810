"""VBD solver: implicit vertex block descent for cloth/particles.

TPU-native re-design of reference newton/_src/solvers/vbd/solver_vbd.py:94
(step :1779, particle_vbd_kernels.py). The reference runs graph-colored
Gauss-Seidel with one Warp thread per vertex; here each color group is one
fully-vectorized batch update (gather incident constraints through
host-precomputed fixed-width adjacency, assemble per-vertex 3x3 Newton
systems, closed-form solve) and colors iterate sequentially inside jit —
the exact parallel structure VBD needs, with zero atomics.

Rigid bodies run the AVBD extension (reference rigid_vbd_kernels.py:83):
implicit Euler as per-body block optimization — every body solves its own
6x6 Newton system over inertia + contact/joint penalty energies with
augmented-Lagrangian multipliers, all bodies in parallel per sweep (the
reference's colored Gauss-Seidel maps to batched Jacobi here).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sim.contacts import Contacts
from ..sim.control import Control
from ..sim.graph_coloring import ColoringAlgorithm, color_graph
from ..sim.model import Model
from ..sim.state import State
from .solver import SolverBase, integrate_bodies

__all__ = ["SolverVBD"]


def _qconj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def _dihedral(p):
    """Dihedral angle and per-vertex gradients for bending quads.

    ``p``: (..., 4, 3) positions in edge_indices order (o0, o1, v0, v1) —
    wing vertices p3/p4, shared edge p1-p2. Returns (theta (...,),
    grads (..., 4, 3) in the same vertex order). Standard formulas
    (Bridson, "Simulation of clothing with folds and wrinkles").
    """
    p3, p4, p1, p2 = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    e = p2 - p1
    elen = jnp.linalg.norm(e, axis=-1)
    ehat = e / jnp.maximum(elen, 1e-9)[..., None]
    n1 = jnp.cross(p1 - p3, p2 - p3)
    n2 = jnp.cross(p2 - p4, p1 - p4)
    n1l2 = jnp.maximum(jnp.sum(n1 * n1, axis=-1), 1e-18)
    n2l2 = jnp.maximum(jnp.sum(n2 * n2, axis=-1), 1e-18)
    n1h = n1 * jax.lax.rsqrt(n1l2)[..., None]
    n2h = n2 * jax.lax.rsqrt(n2l2)[..., None]
    sin_t = jnp.sum(jnp.cross(n1h, n2h) * ehat, axis=-1)
    cos_t = jnp.sum(n1h * n2h, axis=-1)
    theta = jnp.arctan2(sin_t, cos_t)
    w1 = n1 / n1l2[..., None]
    w2 = n2 / n2l2[..., None]
    G3 = elen[..., None] * w1
    G4 = elen[..., None] * w2
    a1 = jnp.sum((p3 - p2) * ehat, axis=-1)[..., None]
    a2 = jnp.sum((p4 - p2) * ehat, axis=-1)[..., None]
    b1 = jnp.sum((p3 - p1) * ehat, axis=-1)[..., None]
    b2 = jnp.sum((p4 - p1) * ehat, axis=-1)[..., None]
    G1 = a1 * w1 + a2 * w2
    G2 = -b1 * w1 - b2 * w2
    return theta, jnp.stack([G3, G4, G1, G2], axis=-2)


def _chain_bend(p):
    """Three-point bend angle for degenerate bending rows (v0 == v1):
    the angle at the shared middle vertex between (o0 - m) and (o1 - m)
    (add_cloth_grid encodes grid bending as these collinear triples;
    rest angle pi). Returns (theta, grads (..., 4, 3)) with the middle
    vertex's gradient split over roles 2 and 3."""
    p3, p4, pm = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    u = p3 - pm
    v = p4 - pm
    ul = jnp.maximum(jnp.linalg.norm(u, axis=-1), 1e-9)
    vl = jnp.maximum(jnp.linalg.norm(v, axis=-1), 1e-9)
    uh = u / ul[..., None]
    vh = v / vl[..., None]
    n = jnp.cross(u, v)
    nl = jnp.linalg.norm(n, axis=-1)
    theta = jnp.arctan2(nl, jnp.sum(u * v, axis=-1))
    # exactly-collinear triples have no defined bend plane: borrow a
    # perpendicular of u so the gradient direction stays valid
    fx = jnp.cross(uh, jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], dtype=p.dtype), uh.shape))
    fy = jnp.cross(uh, jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], dtype=p.dtype), uh.shape))
    fallback = jnp.where(
        (jnp.linalg.norm(fx, axis=-1) > 0.1)[..., None], fx, fy)
    nh = jnp.where((nl > 1e-9)[..., None],
                   n / jnp.maximum(nl, 1e-9)[..., None],
                   fallback / jnp.maximum(jnp.linalg.norm(
                       fallback, axis=-1), 1e-9)[..., None])
    G3 = jnp.cross(uh, nh) / ul[..., None]
    G4 = jnp.cross(nh, vh) / vl[..., None]
    Gm = -0.5 * (G3 + G4)
    return theta, jnp.stack([G3, G4, Gm, Gm], axis=-2)


def _bend_eval(p, is3pt):
    """Bending angle + gradients, selecting dihedral vs 3-point form per
    edge (``is3pt`` broadcastable bool)."""
    thA, GA = _dihedral(p)
    thB, GB = _chain_bend(p)
    return (jnp.where(is3pt, thB, thA),
            jnp.where(is3pt[..., None, None], GB, GA))


class SolverVBD(SolverBase):
    """Vertex block descent (reference: solver_vbd.py:94).

    Args:
        iterations: Newton/Gauss-Seidel sweeps per substep.
        contact_ke: penalty stiffness for particle-shape contacts.
    """

    def __init__(self, model: Model, iterations: int = 4,
                 contact_ke: float = 1.0e4,
                 rigid_contact_ke: float = 1.0e5,
                 rigid_joint_ke: float = 1.0e6,
                 handle_self_contact: bool = False,
                 self_contact_ke: float = 2.0e3,
                 self_contact_radius: Optional[float] = None,
                 self_contact_max_per_cell: int = 4,
                 coloring: ColoringAlgorithm = ColoringAlgorithm.MCS):
        super().__init__(model)
        self.iterations = int(iterations)
        self.contact_ke = float(contact_ke)
        self.rigid_contact_ke = float(rigid_contact_ke)
        self.rigid_joint_ke = float(rigid_joint_ke)
        # cloth self-collision (reference: vbd/tri_mesh_collision.py:235):
        # vertex-vertex penalty pairs from the sorted hashgrid, 1-ring
        # excluded; pairs anchor at step start, penalties track current x
        self.handle_self_contact = bool(handle_self_contact)
        self.self_contact_ke = float(self_contact_ke)
        self.self_contact_radius = self_contact_radius
        self.self_contact_max_per_cell = int(self_contact_max_per_cell)
        st = model.structure

        # rigid AVBD static plans (reference rigid_vbd_kernels.py:83)
        self.slot_body0 = getattr(st, "slot_body0", np.zeros(0, np.int32))
        self.slot_body1 = getattr(st, "slot_body1", np.zeros(0, np.int32))
        self.slot_shape0 = getattr(st, "slot_shape0", np.zeros(0, np.int32))
        self.slot_shape1 = getattr(st, "slot_shape1", np.zeros(0, np.int32))
        J = st.joint_count
        if J:
            from ..sim.enums import JointType
            jt = np.asarray(st.joint_type)
            self.j_parent = np.maximum(np.asarray(st.joint_parent), 0)
            self.j_has_parent = np.asarray(st.joint_parent) >= 0
            self.j_child = np.asarray(st.joint_child)
            self.j_is_free = np.isin(jt, (int(JointType.FREE),
                                          int(JointType.DISTANCE)))
            self.j_lock_rot = (jt == int(JointType.FIXED))
            # cable joints carry split stretch/shear/bend/twist stiffness in
            # their 6 dof ke slots (reference: rigid_vbd_kernels.py:421
            # cable bend/twist energies — VBD is the reference's cable home)
            self.j_is_cable = jt == int(JointType.CABLE)
            self.has_cables = bool(self.j_is_cable.any())
            if self.has_cables:
                D = max(int(st.joint_dof_count), 1)
                d0 = np.asarray(st.joint_qd_start[:-1])
                self.cable_dof = np.minimum(
                    d0[:, None] + np.arange(6)[None, :], D - 1)
        N = st.particle_count

        # build the stretch-constraint set: springs + unique tri edges
        cons: List[Tuple[int, int, float, float]] = []  # (i, j, rest, ke)
        if st.spring_count:
            si = np.asarray(model.spring_indices)
            rest = np.asarray(model.spring_rest_length)
            ke = np.asarray(model.spring_stiffness)
            for k in range(len(si)):
                cons.append((int(si[k, 0]), int(si[k, 1]),
                             float(rest[k]), float(ke[k])))
        if st.tri_count:
            ti = np.asarray(model.tri_indices)
            q0 = np.asarray(model.particle_q)
            ke_t = np.asarray(model.tri_materials)[:, 0]
            seen = set()
            for t in range(len(ti)):
                for (a, b) in ((ti[t, 0], ti[t, 1]), (ti[t, 1], ti[t, 2]),
                               (ti[t, 2], ti[t, 0])):
                    key = (min(int(a), int(b)), max(int(a), int(b)))
                    if key in seen:
                        continue
                    seen.add(key)
                    rest = float(np.linalg.norm(q0[key[0]] - q0[key[1]]))
                    cons.append((key[0], key[1], rest, float(ke_t[t])))
        self.n_cons = len(cons)

        # color the particle graph by constraint edges
        edges = np.asarray([(c[0], c[1]) for c in cons], dtype=np.int64) \
            if cons else np.zeros((0, 2), dtype=np.int64)
        self.colors = color_graph(N, edges, coloring) if N else []

        # fixed-width per-vertex incidence: (N, Dmax) constraint index + the
        # other endpoint; padding points at a zero-stiffness dummy
        deg = np.zeros(N, dtype=np.int64)
        for (i, j, _, _) in cons:
            deg[i] += 1
            deg[j] += 1
        Dmax = int(deg.max()) if N and len(cons) else 1
        inc_other = np.zeros((N, Dmax), dtype=np.int32)
        inc_rest = np.zeros((N, Dmax), dtype=np.float32)
        inc_ke = np.zeros((N, Dmax), dtype=np.float32)
        fill = np.zeros(N, dtype=np.int64)
        for (i, j, rest, ke) in cons:
            inc_other[i, fill[i]] = j
            inc_rest[i, fill[i]] = rest
            inc_ke[i, fill[i]] = ke
            fill[i] += 1
            inc_other[j, fill[j]] = i
            inc_rest[j, fill[j]] = rest
            inc_ke[j, fill[j]] = ke
            fill[j] += 1
        self.inc_other = inc_other
        self.inc_rest = jnp.asarray(inc_rest)
        self.inc_ke = jnp.asarray(inc_ke)

        # bending: per-vertex incident dihedral edges (reference
        # particle_vbd_kernels bending energy). edge_indices rows are
        # (o0, o1, v0, v1): wing vertices then the shared edge. Each vertex
        # stores (edge id, role 0-3) pairs, padded with -1.
        E4 = st.edge_count
        self.has_bending = bool(E4)
        if E4:
            ei = np.asarray(model.edge_indices)
            # some edges have no second wing (o1 == -1): skip those
            wing_ok = (ei[:, 0] >= 0) & (ei[:, 1] >= 0)
            bdeg = np.zeros(N, dtype=np.int64)
            for e in range(E4):
                if wing_ok[e]:
                    for r in range(4):
                        bdeg[ei[e, r]] += 1
            Bmax = max(int(bdeg.max()), 1)
            inc_bedge = -np.ones((N, Bmax), dtype=np.int32)
            inc_brole = np.zeros((N, Bmax), dtype=np.int32)
            bfill = np.zeros(N, dtype=np.int64)
            for e in range(E4):
                if not wing_ok[e]:
                    continue
                for r in range(4):
                    v = int(ei[e, r])
                    inc_bedge[v, bfill[v]] = e
                    inc_brole[v, bfill[v]] = r
                    bfill[v] += 1
            self.inc_bedge = np.maximum(inc_bedge, 0)
            self.inc_bvalid = jnp.asarray(inc_bedge >= 0)
            self.inc_brole = inc_brole
            self.edge_idx_safe = np.maximum(ei, 0)
            # grid cloth encodes bending as collinear triples (v0 == v1);
            # those use the 3-point chain-bend angle instead of a dihedral
            self.bend_3pt = ei[:, 2] == ei[:, 3]
            self.has_bending = bool(wing_ok.any())

        # self-collision 1-ring exclusion uses inc_other (stretch topology)

    # ------------------------------------------------------------------
    def step(self, state_in: State, state_out: Optional[State] = None,
             control: Optional[Control] = None,
             contacts: Optional[Contacts] = None, dt: float = 1e-3) -> State:
        model = self.model
        st = model.structure
        N = model.particle_count
        if N == 0:
            body_q, body_qd = self._rigid_avbd(state_in, control, contacts, dt)
            return state_in.replace(body_q=body_q, body_qd=body_qd)
        dtype = state_in.particle_q.dtype

        inv_m = model.particle_inv_mass
        m = model.particle_mass
        active = (inv_m > 0)[:, None]
        w_idx = np.maximum(st.particle_world, 0)
        g_vec = model.gravity[w_idx]

        x0 = state_in.particle_q
        v0 = state_in.particle_qd
        # inertia target (implicit Euler): y = x0 + dt v0 + dt^2 a_ext
        a_ext = g_vec * active + state_in.particle_f * inv_m[:, None]
        y = x0 + dt * v0 * active + dt * dt * a_ext
        x = jnp.where(active, y, x0)

        h2 = 1.0 / (dt * dt)
        eye = jnp.eye(3, dtype=dtype)

        # contact penalty plan (static): per-particle one shape contact max
        has_contacts = contacts is not None and contacts.soft_contact_max > 0

        # bending setup: rest dihedral from the build pose (consistent with
        # the runtime angle formula by construction)
        if self.has_bending and not hasattr(self, "_bend_theta0"):
            th0, _ = _bend_eval(model.particle_q[self.edge_idx_safe],
                                jnp.asarray(self.bend_3pt))
            self._bend_theta0 = th0
            self._bend_ke = model.edge_bending_properties[:, 0]

        # self-collision: vertex-vertex penalty pairs from the hashgrid,
        # anchored at step start (reference: vbd/tri_mesh_collision.py:235)
        self_nbr = None
        if self.handle_self_contact and N > 1:
            from ..geometry.hashgrid import HashGrid
            r_self = self.self_contact_radius
            if r_self is None:
                r_self = 2.0 * float(np.max(
                    np.asarray(model.particle_radius), initial=0.0))
            if r_self > 0:
                grid = HashGrid(cell_size=r_self,
                                max_per_cell=self.self_contact_max_per_cell)
                cand, cmask = grid.query(x0, r_self)
                # exclude the stretch-topology 1-ring
                ring = jnp.asarray(self.inc_other)          # (N, D)
                adj = jnp.any(cand[:, :, None] == ring[:, None, :], axis=-1)
                self_nbr = (cand, cmask & ~adj, r_self)

        def vertex_update(x, verts):
            """Newton step for all vertices of one color group (static idx)."""
            xi = x[verts]                                    # (V, 3)
            other = self.inc_other[verts]                    # (V, D)
            xo = x[other]                                    # (V, D, 3)
            rest = self.inc_rest[verts]
            ke = self.inc_ke[verts]
            d = xi[:, None, :] - xo
            dist = jnp.linalg.norm(d, axis=-1)
            dhat = d / jnp.maximum(dist, 1e-9)[..., None]
            # gradient of 1/2 ke (|d| - L)^2
            gmag = ke * (dist - rest)
            grad = jnp.sum(gmag[..., None] * dhat, axis=1)   # (V, 3)
            # Gauss-Newton PSD Hessian: ke d d^T + ke max(1-L/|d|,0)(I-dd^T)
            op = dhat[..., :, None] * dhat[..., None, :]
            t_coeff = ke * jnp.maximum(1.0 - rest / jnp.maximum(dist, 1e-9), 0.0)
            H = (jnp.sum(ke[..., None, None] * op, axis=1)
                 + jnp.sum(t_coeff[..., None, None] * (eye - op), axis=1))

            mi = m[verts][:, None]
            grad = grad + h2 * mi * (xi - y[verts])
            H = H + h2 * mi[..., None] * eye

            if self.has_bending:
                eids = self.inc_bedge[verts]                 # (V, Bm)
                roles = self.inc_brole[verts]
                bvalid = self.inc_bvalid[verts]
                p = x[self.edge_idx_safe[eids]]              # (V, Bm, 4, 3)
                theta, G = _bend_eval(
                    p, jnp.asarray(self.bend_3pt)[eids])     # (V,Bm), (V,Bm,4,3)
                ke_b = self._bend_ke[eids] * bvalid
                dth = theta - self._bend_theta0[eids]
                Gi = jnp.take_along_axis(
                    G, roles[..., None, None].astype(jnp.int32),
                    axis=2)[:, :, 0, :]                      # (V, Bm, 3)
                grad = grad + jnp.sum((ke_b * dth)[..., None] * Gi, axis=1)
                H = H + jnp.sum(ke_b[..., None, None]
                                * Gi[..., :, None] * Gi[..., None, :], axis=1)

            if self_nbr is not None:
                cand, cmask, r_self = self_nbr
                ci = cand[verts]                             # (V, Q)
                cm = cmask[verts]
                dvec = xi[:, None, :] - x[ci]
                dlen = jnp.linalg.norm(dvec, axis=-1)
                pen = jnp.maximum(r_self - dlen, 0.0) * cm
                ddir = dvec / jnp.maximum(dlen, 1e-9)[..., None]
                ks = self.self_contact_ke
                grad = grad - jnp.sum((ks * pen)[..., None] * ddir, axis=1)
                w_on = (pen > 0).astype(dtype)
                H = H + jnp.sum((ks * w_on)[..., None, None]
                                * ddir[..., :, None] * ddir[..., None, :],
                                axis=1)

            if has_contacts:
                # penalty from active particle-shape contacts of these verts
                pi = contacts.soft_contact_particle
                depth = contacts.soft_contact_depth
                nrm = contacts.soft_contact_normal
                act = contacts.soft_contact_mask & (depth > 0)
                # scatter to dense per-particle (cheap: one contact/particle)
                gP = jax.ops.segment_sum(
                    jnp.where(act[:, None], -self.contact_ke
                              * depth[:, None] * nrm, 0.0), pi, N)
                HP = jax.ops.segment_sum(
                    jnp.where(act[:, None, None], self.contact_ke
                              * nrm[:, :, None] * nrm[:, None, :], 0.0), pi, N)
                grad = grad + gP[verts]
                H = H + HP[verts]

            dx = -jnp.linalg.solve(H, grad[..., None])[..., 0]
            dx = dx * (inv_m[verts] > 0)[:, None]
            return x.at[verts].add(dx)

        def sweep(x, _):
            for verts in self.colors:
                if len(verts):
                    x = vertex_update(x, verts)
            return x, None

        x, _ = jax.lax.scan(sweep, x, None, length=self.iterations)

        v = (x - x0) / dt
        x = jnp.where(active, x, x0)
        v = jnp.where(active, v, v0)

        body_q, body_qd = self._rigid_avbd(state_in, control, contacts, dt)
        return state_in.replace(particle_q=x, particle_qd=v,
                                body_q=body_q, body_qd=body_qd)

    # ------------------------------------------------------------------
    def _rigid_avbd(self, state_in: State, control, contacts, dt: float):
        """AVBD rigid phase (reference rigid_vbd_kernels.py:83): per-body
        6x6 block Newton over inertia + contact/joint penalty energies with
        augmented-Lagrangian contact multipliers, all bodies per sweep."""
        from ..math import (quat_mul, quat_normalize, quat_rotate,
                            quat_rotate_inv, quat_to_matrix,
                            transform_multiply)
        model = self.model
        st = model.structure
        B = model.body_count
        if B == 0 or (contacts is None and st.joint_count == 0):
            return integrate_bodies(model, state_in, dt)

        dtype = state_in.body_q.dtype
        eye3 = jnp.eye(3, dtype=dtype)
        h2 = 1.0 / (dt * dt)

        # inertia targets from unconstrained integration
        bq_pred, bqd_pred = integrate_bodies(model, state_in, dt)
        x_t = bq_pred[:, 0:3] + quat_rotate(bq_pred[:, 3:7], model.body_com)
        q_t = bq_pred[:, 3:7]
        x = x_t
        q = q_t
        x_prev = state_in.body_q[:, 0:3] + quat_rotate(
            state_in.body_q[:, 3:7], model.body_com)
        q_prev = state_in.body_q[:, 3:7]

        m = model.body_mass
        dyn = (model.body_inv_mass > 0)

        C = contacts.rigid_contact_max if contacts is not None else 0
        if C:
            # bodies from contact shape indices (works for static-slot and
            # dynamic-pair pipelines alike)
            sbody = jnp.asarray(np.asarray(st.shape_body))
            cs0 = contacts.rigid_contact_shape0
            cs1 = contacts.rigid_contact_shape1
            b0r = sbody[jnp.maximum(cs0, 0)]
            b1r = sbody[jnp.maximum(cs1, 0)]
            dyn0 = (cs0 >= 0) & (b0r >= 0)
            dyn1 = (cs1 >= 0) & (b1r >= 0)
            b0 = jnp.where(dyn0, b0r, 0)
            b1 = jnp.where(dyn1, b1r, 0)
        else:
            b0 = b1 = np.zeros(0, np.int32)
            dyn0 = dyn1 = jnp.zeros((0,), bool)
        if C:
            # collide-time body-local anchors (world-fixed for statics)
            n = contacts.rigid_contact_normal
            p = contacts.rigid_contact_position
            d = contacts.rigid_contact_depth[:, None]
            p0 = p + n * (0.5 * d)
            p1 = p - n * (0.5 * d)
            l0 = jnp.where(dyn0[:, None],
                           quat_rotate_inv(q_prev[b0], p0 - x_prev[b0]), p0)
            l1 = jnp.where(dyn1[:, None],
                           quat_rotate_inv(q_prev[b1], p1 - x_prev[b1]), p1)
            s0m = jnp.maximum(contacts.rigid_contact_shape0, 0)
            s1m = jnp.maximum(contacts.rigid_contact_shape1, 0)
            mu_c = 0.5 * (model.shape_material_mu[s0m]
                          + model.shape_material_mu[s1m])
            kc = self.rigid_contact_ke

        J = st.joint_count
        if J:
            jp, jc = self.j_parent, self.j_child
            hasp = jnp.asarray(self.j_has_parent)
            nonfree = jnp.asarray(~self.j_is_free)
            lockr = jnp.asarray(self.j_lock_rot)
            kj = self.rigid_joint_ke
            cable_any = getattr(self, "has_cables", False)
            cab = jnp.asarray(getattr(self, "j_is_cable",
                                      np.zeros(J, bool)))

        def assemble(x, q, lam):
            g = jnp.zeros((B, 6), dtype=dtype)
            H = jnp.zeros((B, 6, 6), dtype=dtype)

            if C:
                a0 = jnp.where(dyn0[:, None],
                               x[b0] + quat_rotate(q[b0], l0), l0)
                a1 = jnp.where(dyn1[:, None],
                               x[b1] + quat_rotate(q[b1], l1), l1)
                pen = -jnp.sum((a1 - a0) * n, axis=-1)
                act = contacts.rigid_contact_mask & ((pen > 0) | (lam > 0))
                f_mag = jnp.where(act, kc * jnp.maximum(pen, 0.0) + lam, 0.0)
                r0 = a0 - x[b0]
                r1 = a1 - x[b1]
                # J rows wrt body1: +[n | r1 x n]; body0: -[n | r0 x n]
                J1 = jnp.concatenate([n, jnp.cross(r1, n)], axis=-1)  # (C,6)
                J0 = jnp.concatenate([n, jnp.cross(r0, n)], axis=-1)
                # friction: tangential anchor drift penalty, cone-clamped
                t_err = (a1 - a0) - n * jnp.sum((a1 - a0) * n, axis=-1,
                                                keepdims=True)
                t_len = jnp.linalg.norm(t_err, axis=-1)
                t_dir = t_err / jnp.maximum(t_len, 1e-9)[:, None]
                ft = jnp.minimum(kc * t_len, mu_c * f_mag)
                ft = jnp.where(act, ft, 0.0)
                T1 = jnp.concatenate([t_dir, jnp.cross(r1, t_dir)], axis=-1)
                T0 = jnp.concatenate([t_dir, jnp.cross(r0, t_dir)], axis=-1)
                # grad(E) per body; Newton pushes along -grad
                g = g.at[b1].add(jnp.where(dyn1[:, None],
                                           -f_mag[:, None] * J1
                                           + ft[:, None] * T1, 0.0))
                g = g.at[b0].add(jnp.where(dyn0[:, None],
                                           f_mag[:, None] * J0
                                           - ft[:, None] * T0, 0.0))
                w_act = act.astype(dtype)
                H = H.at[b1].add(w_act[:, None, None] * dyn1[:, None, None]
                                 * kc * (J1[:, :, None] * J1[:, None, :]
                                         + T1[:, :, None] * T1[:, None, :]))
                H = H.at[b0].add(w_act[:, None, None] * dyn0[:, None, None]
                                 * kc * (J0[:, :, None] * J0[:, None, :]
                                         + T0[:, :, None] * T0[:, None, :]))

            if J:
                # body origin poses from (x_com, q)
                p_org = x - quat_rotate(q, model.body_com)
                pose = jnp.concatenate([p_org, q], axis=-1)
                identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
                X_wp = jnp.where(hasp[:, None], pose[jp], identity)
                X_pj = transform_multiply(X_wp, model.joint_X_p)
                X_cj = transform_multiply(pose[jc], model.joint_X_c)
                Cv = (X_cj[:, 0:3] - X_pj[:, 0:3]) * nonfree[:, None]
                rc = X_cj[:, 0:3] - x[jc]
                rp = X_pj[:, 0:3] - x[jp]
                top = jnp.broadcast_to(eye3, (J, 3, 3))

                # per-joint linear stiffness matrix: isotropic weld kj for
                # ordinary joints; cables split stretch (along the parent
                # tangent) from shear (transverse), reference cable energies
                if cable_any:
                    z_l = jnp.zeros((3,), dtype=dtype).at[2].set(1.0)
                    t_p = quat_rotate(X_pj[:, 3:7],
                                      jnp.broadcast_to(z_l, (J, 3)))
                    t_c = quat_rotate(X_cj[:, 3:7],
                                      jnp.broadcast_to(z_l, (J, 3)))
                    ttT = t_p[:, :, None] * t_p[:, None, :]
                    ke6 = model.joint_target_ke[jnp.asarray(self.cable_dof)]
                    K_cab = (ke6[:, 2, None, None] * ttT
                             + ke6[:, 0, None, None] * (top - ttT))
                    weld = (nonfree & ~cab).astype(dtype)
                    K_lin = jnp.where(cab[:, None, None], K_cab,
                                      kj * top * weld[:, None, None])
                else:
                    K_lin = kj * top * nonfree.astype(dtype)[:, None, None]

                gl = jnp.einsum("jab,jb->ja", K_lin, Cv)
                g = g.at[jc].add(jnp.concatenate(
                    [gl, jnp.cross(rc, gl)], -1))
                g = g.at[jp].add(jnp.where(hasp[:, None], jnp.concatenate(
                    [-gl, -jnp.cross(rp, gl)], -1), 0.0))

                def rx(r):
                    zero = jnp.zeros_like(r[:, 0])
                    return jnp.stack([
                        jnp.stack([zero, -r[:, 2], r[:, 1]], -1),
                        jnp.stack([r[:, 2], zero, -r[:, 0]], -1),
                        jnp.stack([-r[:, 1], r[:, 0], zero], -1)], -2)
                Rc = rx(rc)
                Rp = rx(rp)
                KRc = K_lin @ Rc
                KRp = K_lin @ Rp
                Hc = jnp.concatenate([
                    jnp.concatenate([K_lin, -KRc], -1),
                    jnp.concatenate([Rc @ K_lin, -Rc @ KRc], -1)], -2)
                Hp = jnp.concatenate([
                    jnp.concatenate([K_lin, -KRp], -1),
                    jnp.concatenate([Rp @ K_lin, -Rp @ KRp], -1)], -2)
                H = H.at[jc].add(Hc)
                H = H.at[jp].add(jnp.where(hasp[:, None, None], Hp, 0.0))

                # angular penalties: FIXED rotvec lock; cable bend (align
                # tangents, transverse stiffness) + twist (about tangent)
                q_rel = quat_mul(_qconj(X_pj[:, 3:7]), X_cj[:, 3:7])
                q_rel = jnp.where(q_rel[:, 3:4] < 0, -q_rel, q_rel)
                dO = quat_rotate(X_pj[:, 3:7], 2.0 * q_rel[:, 0:3]) \
                    * lockr[:, None]
                K_ang = kj * lockr.astype(dtype)[:, None, None] * top
                if cable_any:
                    tau = 2.0 * jnp.arctan2(q_rel[:, 2], q_rel[:, 3])
                    t_mid = t_p + t_c
                    t_mid = t_mid / jnp.maximum(
                        jnp.linalg.norm(t_mid, axis=-1, keepdims=True), 1e-9)
                    e_cab = jnp.cross(t_p, t_c) + t_mid * tau[:, None]
                    dO = jnp.where(cab[:, None], e_cab, dO)
                    K_ang_cab = (ke6[:, 5, None, None] * ttT
                                 + ke6[:, 3, None, None] * (top - ttT))
                    K_ang = jnp.where(cab[:, None, None], K_ang_cab, K_ang)
                ga = jnp.einsum("jab,jb->ja", K_ang, dO)
                g = g.at[jc].add(jnp.concatenate(
                    [jnp.zeros_like(ga), ga], -1))
                g = g.at[jp].add(jnp.where(hasp[:, None], jnp.concatenate(
                    [jnp.zeros_like(ga), -ga], -1), 0.0))
                Hang = jnp.zeros((J, 6, 6), dtype=dtype
                                 ).at[:, 3:, 3:].set(K_ang)
                H = H.at[jc].add(Hang)
                H = H.at[jp].add(jnp.where(hasp[:, None, None], Hang, 0.0))
            return g, H

        Iw_init = self._world_inertia(q_t)

        def sweep(carry, _):
            x, q, lam = carry
            g, H = assemble(x, q, lam)
            # inertia term
            Iw = self._world_inertia(q)
            qe = quat_mul(q, _qconj(q_t))
            qe = jnp.where(qe[:, 3:4] < 0, -qe, qe)
            th_err = 2.0 * qe[:, 0:3]
            g = g + h2 * jnp.concatenate(
                [m[:, None] * (x - x_t),
                 jnp.einsum("bij,bj->bi", Iw, th_err)], -1)
            Hin = jnp.zeros((B, 6, 6), dtype=dtype)
            Hin = Hin.at[:, :3, :3].set(h2 * m[:, None, None] * eye3)
            Hin = Hin.at[:, 3:, 3:].set(h2 * Iw)
            H = H + Hin + 1e-8 * jnp.eye(6, dtype=dtype)
            delta = -jnp.linalg.solve(H, g[..., None])[..., 0]
            delta = delta * dyn[:, None]
            x = x + delta[:, 0:3]
            dq = quat_mul(jnp.concatenate(
                [delta[:, 3:6], jnp.zeros_like(delta[:, :1])], -1), q)
            q = quat_normalize(q + 0.5 * dq)
            # augmented-Lagrangian multiplier update
            if C:
                a0 = jnp.where(dyn0[:, None],
                               x[b0] + quat_rotate(q[b0], l0), l0)
                a1 = jnp.where(dyn1[:, None],
                               x[b1] + quat_rotate(q[b1], l1), l1)
                pen = -jnp.sum((a1 - a0) * n, axis=-1)
                lam = jnp.maximum(lam + kc * pen, 0.0) \
                    * contacts.rigid_contact_mask
            return (x, q, lam), None

        lam0 = jnp.zeros((C,), dtype=dtype) if C else jnp.zeros((0,), dtype)
        (x, q, _), _ = jax.lax.scan(sweep, (x, q, lam0), None,
                                    length=self.iterations)

        v = (x - x_prev) / dt
        dq_rel = quat_mul(q, _qconj(q_prev))
        w = 2.0 / dt * dq_rel[:, 0:3]
        w = jnp.where(dq_rel[:, 3:4] < 0.0, -w, w)
        v = jnp.where(dyn[:, None], v, bqd_pred[:, 0:3])
        w = jnp.where(dyn[:, None], w, bqd_pred[:, 3:6])

        # velocity pass: penalty push-out is elastic — remove the residual
        # normal velocity at persisting contacts (inelastic, e=0) and damp
        # tangential slip inside the friction cone, as the reference's AVBD
        # finalize phase does (rigid_vbd_kernels velocity finalization)
        if C:
            a0 = jnp.where(dyn0[:, None], x[b0] + quat_rotate(q[b0], l0), l0)
            a1 = jnp.where(dyn1[:, None], x[b1] + quat_rotate(q[b1], l1), l1)
            pen = -jnp.sum((a1 - a0) * n, axis=-1)
            act = contacts.rigid_contact_mask & (pen > -1e-4)
            inv_m_b = model.body_inv_mass
            Iw = self._world_inertia(q)
            Iinv = jnp.linalg.inv(Iw + 1e-9 * eye3[None])
            im0 = jnp.where(dyn0, inv_m_b[b0], 0.0)
            im1 = jnp.where(dyn1, inv_m_b[b1], 0.0)
            I0 = jnp.where(dyn0[:, None, None], Iinv[b0], 0.0)
            I1 = jnp.where(dyn1[:, None, None], Iinv[b1], 0.0)
            r0 = a0 - x[b0]
            r1 = a1 - x[b1]
            vrel = (jnp.where(dyn1[:, None], v[b1] + jnp.cross(w[b1], r1), 0.)
                    - jnp.where(dyn0[:, None], v[b0] + jnp.cross(w[b0], r0),
                                0.))
            vn = jnp.sum(vrel * n, axis=-1)
            r0n = jnp.cross(r0, n)
            r1n = jnp.cross(r1, n)
            w_eff = (im0 + im1
                     + jnp.einsum("cd,cde,ce->c", r0n, I0, r0n)
                     + jnp.einsum("cd,cde,ce->c", r1n, I1, r1n))
            dlam_v = jnp.where(act, -vn / jnp.maximum(w_eff, 1e-9), 0.0)
            impv = n * dlam_v[:, None]
            v = v.at[b1].add(jnp.where(dyn1[:, None], impv * im1[:, None],
                                       0.0))
            v = v.at[b0].add(jnp.where(dyn0[:, None], -impv * im0[:, None],
                                       0.0))
            w = w.at[b1].add(jnp.where(dyn1[:, None], jnp.einsum(
                "cde,ce->cd", I1, jnp.cross(r1, impv)), 0.0))
            w = w.at[b0].add(jnp.where(dyn0[:, None], -jnp.einsum(
                "cde,ce->cd", I0, jnp.cross(r0, impv)), 0.0))

        p_org = x - quat_rotate(q, model.body_com)
        body_q = jnp.concatenate([p_org, q], axis=-1)
        body_qd = jnp.concatenate([v, w], axis=-1)
        return body_q, body_qd

    def _world_inertia(self, q):
        from ..math import quat_to_matrix
        R = quat_to_matrix(q)
        I_local = self.model.body_inertia
        return jnp.einsum("bij,bjk,blk->bil", R, I_local, R)
