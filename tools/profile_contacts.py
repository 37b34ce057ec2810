"""Sub-stage split of _solve_contacts_t (humanoid, 4096 envs): compaction,
J build, MinvJt, PGS. Drives the roofline in docs/perf.md."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo
from newton_tpu.solvers.generalized import batched as bt
from newton_tpu.parallel import batch_state

ROBOT = sys.argv[1] if len(sys.argv) > 1 else "humanoid"
W = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
N = 20
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
           f"assets/{ROBOT}.xml")
m = b.finalize()
pipe = CollisionPipeline(m)
solver = SolverMuJoCo(m, iterations=8, integrator="euler")
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
sW = batch_state(s1, W)
dt = 1.0 / 240.0
gc = solver.gc
g = gc.groups[0]
plan = solver.contact_plans[0]
contacts = jax.jit(jax.vmap(pipe.collide))(sW)
c = plan.c
K = solver._plan_cap(c)
d = g.d
lp = solver.limit_plans[0] if solver.limit_mode == "constraint" else None
nl = len(lp[0]) if lp is not None else 0
r = 3 * K + 2 * nl
print(f"{ROBOT}: W={W} c={c} K={K} d={d} nl={nl} r={r}", flush=True)


def timeit(name, fn, *args):
    def body(carry, _):
        cur_args, acc = carry
        out = fn(*cur_args)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
        acc = acc + sum(jnp.sum(x).astype(jnp.float32) for x in leaves)

        def mix(a):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
                return a + (1e-30 * acc).astype(a.dtype)
            return a
        return (jax.tree.map(mix, cur_args), acc), None

    @jax.jit
    def loop(carry):
        return jax.lax.scan(body, carry, None, length=N)[0]

    out = loop((args, jnp.float32(0)))
    jax.block_until_ready(out[1])
    t0 = time.time()
    for _ in range(5):
        out = loop(out)
    jax.block_until_ready(out[1])
    print(f"{name:34s} run {(time.time()-t0)/(5*N)*1e3:7.3f} ms", flush=True)


def mktup(s):
    q_t = s.joint_q.T
    qd_t = s.joint_qd.T
    bp = tuple(s.body_q[:, :, k].T for k in range(3))
    bq = tuple(s.body_q[:, :, 3 + k].T for k in range(4))
    bv = tuple(s.body_qd[:, :, k].T for k in range(3))
    bw = tuple(s.body_qd[:, :, 3 + k].T for k in range(3))
    return q_t, qd_t, bp, bq, bv, bw


q_t, qd_t, bp, bq, bv, bw = mktup(sW)
B = m.structure.body_count
v_o, w_o = jax.jit(lambda *a: bt._dof_subspace_t(m, *a))(bp, bq, q_t)
x_b, Iw, m_b = jax.jit(
    lambda *a: bt._spatial_inertia_t(m, np.arange(B), *a))(bp, bq)


def crba_chol_minv(vo, wo, xb, iw, mb):
    bi = g.body_idx[0]
    Iw_g = [[iw[i][j][bi] for j in range(3)] for i in range(3)]
    M = bt._crba_t(m, g, vo, wo, bt._rows(xb, bi), Iw_g, mb[bi])
    L = bt._chol_t(M)
    eye = jnp.eye(g.d, dtype=M.dtype)[:, :, None]
    Minv = bt._cho_solve_t(L, jnp.broadcast_to(eye, (g.d, g.d, W)))
    return Minv


Minv0 = jax.jit(crba_chol_minv)(v_o, w_o, x_b, Iw, m_b)
qd_g0 = qd_t[g.dof_idx[0]]
dtype = qd_g0.dtype

S = contacts.rigid_contact_mask.shape[-1]
slots = np.minimum(plan.slots[0], S - 1)


def compaction(cb, vo, wo):
    def slot_vec(arr):
        return tuple(arr[:, slots, k].T for k in range(3))
    nrm = slot_vec(cb.rigid_contact_normal)
    pos = slot_vec(cb.rigid_contact_position)
    depth = cb.rigid_contact_depth[:, slots].T
    active = cb.rigid_contact_mask[:, slots].T
    score = active.astype(dtype) * jnp.maximum(1.0 + depth, 0.5)
    idx = jax.lax.top_k(score.T, K)[1].T
    onehot = (idx[None, :, :] ==
              jnp.arange(c, dtype=idx.dtype)[:, None, None])
    oh_f = onehot.astype(dtype)

    def gK(arr):
        return jnp.sum(arr[:, None, :] * oh_f, axis=0)

    outs = [tuple(gK(x) for x in nrm), tuple(gK(x) for x in pos),
            gK(depth), jnp.any(onehot & active[:, None, :], axis=0)]
    return outs


timeit("compaction (topk+7 gK)", compaction, contacts, v_o, w_o)


# J build on compacted rows
comp = jax.jit(compaction)(contacts, v_o, w_o)
nrmK, posK, depthK, activeK = comp


def jbuild(nrm, pos, vo, wo):
    nx, ny, nz = nrm
    s_ = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (s_ + nz)
    b_ = nx * ny * a
    t1 = (1.0 + s_ * nx * nx * a, s_ * b_, -s_ * nx)
    t2 = (b_, s_ + ny * ny * a, -ny)
    di = g.dof_idx[0]
    vg = bt._rows(vo, di)
    wg = bt._rows(wo, di)
    vg1 = tuple(x[None, :, :] for x in vg)
    wg1 = tuple(x[None, :, :] for x in wg)
    pos1 = tuple(x[:, None, :] for x in pos)
    Vp = bt._add(vg1, bt._cross(wg1, pos1))
    sign = jnp.ones((K, d, 1), dtype=dtype)

    def j_rows(dirs):
        return sum(dc[:, None, :] * Vc for dc, Vc in zip(dirs, Vp)) * sign
    return j_rows(nrm), j_rows(t1), j_rows(t2)


timeit("J build (3 j_rows)", jbuild, nrmK, posK, v_o, w_o)
Jn, Jt1, Jt2 = jax.jit(jbuild)(nrmK, posK, v_o, w_o)
J = jnp.concatenate([Jn, Jt1, Jt2], axis=0)
if nl:
    J = jnp.concatenate([J, jnp.zeros((2 * nl, d, W), dtype)], axis=0)


def minvjt(J_, Minv):
    return sum(J_[:, e, None, :] * Minv[e][None, :, :] for e in range(d))


timeit("MinvJt (r x d x d)", minvjt, J, Minv0)
MJ = jax.jit(minvjt)(J, Minv0)


def pgs(J_, Minv_, qd_g):
    from newton_tpu.solvers.generalized.pgs_pallas import \
        pgs_solve_pallas_fused
    rr = 3 * K
    b_rows = jnp.zeros((rr, W), dtype)
    act3 = jnp.ones((rr, W), dtype)
    mu = jnp.full((K, W), 0.5, dtype)
    lam0 = jnp.zeros((rr, W), dtype)
    kw = dict(c=K, nl=0, ld=(), iters=solver.contact_iterations,
              omega=solver.contact_relaxation, use_cone=False)
    return pgs_solve_pallas_fused(
        J_[:rr], Minv_, qd_g, b_rows, act3, mu, lam0,
        diag_scale=1.0, reg=solver.contact_reg, **kw)


timeit("PGS pallas (8 iters)", pgs, J, Minv0, qd_g0)

timeit("crba+chol+Minv fused", crba_chol_minv, v_o, w_o, x_b, Iw, m_b)


def full_contacts(minv, qdg, vo, wo, bp_, bq_, bv_, bw_, xb, cb, qt):
    return bt._solve_contacts_t(
        solver, m, g, plan, minv, qdg, vo, wo,
        bp_, bq_, bv_, bw_, xb, cb, qt, dt, lp, None)


timeit("solve_contacts_t (full)", full_contacts,
       Minv0, qd_g0, v_o, w_o, bp, bq, bv, bw, x_b, contacts, q_t)
