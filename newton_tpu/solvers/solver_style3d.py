"""Style3D solver: projective-dynamics cloth (implicit Euler, prefactored).

TPU-native re-design of reference
newton/_src/solvers/style3d/solver_style3d.py:37 (step :169) +
linear_solver.py. The reference solves the PD global system with a custom
ELL-sparse CG each step; here the PD system matrix A = M/h^2 + L is
**constant** (it only depends on topology and stiffness), so we Cholesky-
factor the (N, N) scalar system once at init and each step does two
triangular solves — one dense MXU-friendly factorization replacing the
per-step CG entirely. Local constraint projections (edge stretch + bending)
are trivially parallel.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sim.contacts import Contacts
from ..sim.control import Control
from ..sim.model import Model
from ..sim.state import State
from .solver import SolverBase, integrate_bodies

__all__ = ["SolverStyle3D"]


class SolverStyle3D(SolverBase):
    """Projective dynamics cloth (reference: solver_style3d.py:37).

    Args:
        iterations: local/global alternations per substep.
        contact_ke: penalty stiffness for particle contacts (added to the
            momentum target, keeping A constant).
    """

    def __init__(self, model: Model, iterations: int = 8,
                 contact_ke: float = 1.0e4, bend_scale: float = 1.0,
                 handle_self_contact: bool = False,
                 self_contact_ke: float = 2.0e3,
                 self_contact_radius: Optional[float] = None,
                 self_contact_max_per_cell: int = 4):
        super().__init__(model)
        self.iterations = int(iterations)
        self.contact_ke = float(contact_ke)
        # cloth self-collision (reference: style3d/collision/): hashgrid
        # vertex-vertex pairs anchored at step start, applied as penalty
        # forces inside the PD local/global loop (A stays constant)
        self.handle_self_contact = bool(handle_self_contact)
        self.self_contact_ke = float(self_contact_ke)
        self.self_contact_radius = self_contact_radius
        self.self_contact_max_per_cell = int(self_contact_max_per_cell)
        st = model.structure
        N = st.particle_count
        if N == 0:
            return

        q0 = np.asarray(model.particle_q)
        cons: List[Tuple[int, int, float, float]] = []
        if st.spring_count:
            si = np.asarray(model.spring_indices)
            rest = np.asarray(model.spring_rest_length)
            ke = np.asarray(model.spring_stiffness)
            cons += [(int(a), int(b), float(r), float(k))
                     for (a, b), r, k in zip(si, rest, ke)]
        if st.tri_count:
            ti = np.asarray(model.tri_indices)
            ke_t = np.asarray(model.tri_materials)[:, 0]
            seen = {}
            for t in range(len(ti)):
                for (a, b) in ((ti[t, 0], ti[t, 1]), (ti[t, 1], ti[t, 2]),
                               (ti[t, 2], ti[t, 0])):
                    key = (min(int(a), int(b)), max(int(a), int(b)))
                    if key not in seen:
                        seen[key] = float(ke_t[t])
            cons += [(a, b, float(np.linalg.norm(q0[a] - q0[b])), k)
                     for (a, b), k in seen.items()]
        if st.edge_count:
            # bending as distance constraints between opposite vertices
            ei = np.asarray(model.edge_indices)
            keb = np.asarray(model.edge_bending_properties)[:, 0] * bend_scale
            for e in range(len(ei)):
                o0, o1 = int(ei[e, 0]), int(ei[e, 1])
                if o0 >= 0 and o1 >= 0 and keb[e] > 0:
                    cons.append((o0, o1,
                                 float(np.linalg.norm(q0[o0] - q0[o1])),
                                 float(keb[e])))
        self.ci = np.asarray([(c[0], c[1]) for c in cons], dtype=np.int32)
        self.c_rest = jnp.asarray([c[2] for c in cons], dtype=jnp.float32)
        self.c_w = np.asarray([c[3] for c in cons], dtype=np.float64)

        # PD global matrix (constant): A = M/h^2 + sum_c w_c S_c^T S_c —
        # kept MATRIX-FREE: A x = diag * x - scatter(w * x[other]) over the
        # constraint edge list, solved by Jacobi-preconditioned CG
        # (reference: style3d/linear_solver.py:22 ELL-sparse CG). O(N)
        # memory and O(C) per matvec; the earlier dense (N, N) Cholesky
        # needed O(N^2) memory (~800 MB at 10K vertices) and O(N^3) setup.
        deg_w = np.zeros(N)
        for (a, b), w in zip(self.ci, self.c_w):
            deg_w[a] += w
            deg_w[b] += w
        self._deg_w = deg_w

        # static 1-ring exclusion table for self-collision (constraint
        # neighbors never count as contacts)
        if self.handle_self_contact:
            ring = [[] for _ in range(N)]
            for (a, b) in self.ci:
                ring[int(a)].append(int(b))
                ring[int(b)].append(int(a))
            dmax = max((len(r) for r in ring), default=1) or 1
            excl = np.full((N, dmax), -1, dtype=np.int32)
            for i, r in enumerate(ring):
                excl[i, :len(r)] = r
            self._self_excl = excl

    def _diag(self, dt: float):
        m = np.asarray(self.model.particle_mass)
        inv_m = np.asarray(self.model.particle_inv_mass)
        diag_m = np.where(inv_m > 0, m, 1e12)  # pin fixed particles
        return jnp.asarray(diag_m / (dt * dt) + self._deg_w,
                           dtype=jnp.float32)

    def _apply_A(self, x, diag, w):
        """Matrix-free A x for the PD system ((N, 3) x)."""
        a, b = self.ci[:, 0], self.ci[:, 1]
        y = diag[:, None] * x
        y = y.at[a].add(-w[:, None] * x[b])
        y = y.at[b].add(-w[:, None] * x[a])
        return y

    def _pcg(self, x0, rhs, diag, w, iters):
        """Jacobi-preconditioned CG on 3 simultaneous right-hand sides
        (one per axis; A is scalar-identical across axes). Warm-started
        from the previous PD iterate — converges in <10 iterations/substep
        on 100x100 cloth (matching the reference CG's budget)."""
        inv_d = 1.0 / diag

        def dot(u, v):
            return jnp.sum(u * v, axis=0)                   # (3,)

        r = rhs - self._apply_A(x0, diag, w)
        z = inv_d[:, None] * r
        p = z
        rz = dot(r, z)

        def body(carry, _):
            x, r, p, rz = carry
            Ap = self._apply_A(p, diag, w)
            denom = jnp.maximum(dot(p, Ap), 1e-30)
            alpha = rz / denom
            x = x + alpha[None, :] * p
            r = r - alpha[None, :] * Ap
            z = inv_d[:, None] * r
            rz_new = dot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta[None, :] * p
            return (x, r, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(body, (x0, r, p, rz), None,
                                       length=iters)
        return x

    # ------------------------------------------------------------------
    def step(self, state_in: State, state_out: Optional[State] = None,
             control: Optional[Control] = None,
             contacts: Optional[Contacts] = None, dt: float = 1e-3) -> State:
        model = self.model
        st = model.structure
        N = model.particle_count
        body_q, body_qd = integrate_bodies(model, state_in, dt)
        if N == 0 or len(self.ci) == 0:
            return state_in.replace(body_q=body_q, body_qd=body_qd)
        dtype = state_in.particle_q.dtype

        inv_m = model.particle_inv_mass
        m_eff = jnp.where(inv_m > 0, model.particle_mass, 1e12)
        active = (inv_m > 0)[:, None]
        w_idx = np.maximum(st.particle_world, 0)
        g_vec = model.gravity[w_idx]

        x0 = state_in.particle_q
        v0 = state_in.particle_qd
        a_ext = g_vec * active + state_in.particle_f * inv_m[:, None]
        if contacts is not None and contacts.soft_contact_max:
            pi = contacts.soft_contact_particle
            depth = contacts.soft_contact_depth
            nrm = contacts.soft_contact_normal
            act = contacts.soft_contact_mask & (depth > 0)
            f_con = jax.ops.segment_sum(
                jnp.where(act[:, None], self.contact_ke * depth[:, None] * nrm,
                          0.0), pi, N)
            a_ext = a_ext + f_con * inv_m[:, None]
        y = x0 + dt * v0 * active + dt * dt * a_ext

        # self-collision candidate pairs, anchored at step start
        # (reference: style3d/collision/). Rest-close pairs (mesh
        # neighbors) are excluded by their rest distance.
        nbr = None
        if self.handle_self_contact and N > 1:
            from ..geometry.hashgrid import HashGrid
            r_self = self.self_contact_radius
            if r_self is None:
                r_self = 2.0 * float(np.max(
                    np.asarray(model.particle_radius), initial=0.0))
            if r_self > 0:
                grid = HashGrid(cell_size=r_self,
                                max_per_cell=self.self_contact_max_per_cell)
                idx, msk = grid.query(x0, r_self)
                # exclude 1-ring constraint neighbors (static table)
                excl = jnp.asarray(self._self_excl)         # (N, Dmax)
                is_nb = jnp.any(excl[:, :, None] == idx[:, None, :], axis=1)
                msk = msk & ~is_nb
                nbr = (idx, msk, r_self)

        diag = self._diag(dt)
        h2 = 1.0 / (dt * dt)
        rhs_inertia = (m_eff * h2)[:, None] * y
        ci = self.ci
        w = jnp.asarray(self.c_w, dtype=dtype)

        def pd_iter(x, _):
            # local: project every edge to its rest length
            d = x[ci[:, 0]] - x[ci[:, 1]]
            dist = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
            p = d * (self.c_rest / dist)[:, None]            # (C, 3)
            # global rhs: S^T w p
            rhs = rhs_inertia
            contrib = w[:, None] * p
            rhs = rhs.at[ci[:, 0]].add(contrib)
            rhs = rhs.at[ci[:, 1]].add(-contrib)
            if nbr is not None:
                # penalty force pushing overlapping vertex pairs apart
                idx, msk, r_self = nbr
                dd = x[idx] - x[:, None, :]
                dist = jnp.maximum(jnp.linalg.norm(dd, axis=-1), 1e-9)
                pen = jnp.where(msk, jnp.maximum(r_self - dist, 0.0), 0.0)
                push = -dd / dist[..., None] * (
                    self.self_contact_ke * pen)[..., None]
                rhs = rhs + jnp.sum(push, axis=1)
            # global: warm-started Jacobi-PCG on the constant sparse system
            x_new = self._pcg(x, rhs, diag, w, iters=8)
            return x_new, None

        x, _ = jax.lax.scan(pd_iter, y, None, length=self.iterations)
        x = jnp.where(active, x, x0)
        v = jnp.where(active, (x - x0) / dt, v0)
        return state_in.replace(particle_q=x, particle_qd=v,
                                body_q=body_q, body_qd=body_qd)
