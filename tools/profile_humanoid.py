"""Fine-grained stage split of the batched humanoid substep (4096 envs).

Times each stage of solvers/generalized/batched.step_batched in isolation
(each as its own scanned jit, 20 iterations per dispatch) so the roofline
in docs/perf.md is evidence, not guesswork.
"""
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
print(f"{ROBOT}: W={W} B={m.structure.body_count} D={gc.D} "
      f"groups={[(gr.n, gr.d, gr.b) for gr in gc.groups]}", flush=True)
contacts = jax.jit(jax.vmap(pipe.collide))(sW)
S = contacts.rigid_contact_mask.shape[-1]
plan = solver.contact_plans[0]
print(f"contact slots S={S} plan.c={plan.c if plan else None} "
      f"K={solver._plan_cap(plan.c) if plan else None}", flush=True)


def mktup(s):
    q_t = s.joint_q.T
    qd_t = s.joint_qd.T
    bp = tuple(s.body_q[:, :, k].T for k in range(3))
    bq = tuple(s.body_q[:, :, 3 + k].T for k in range(4))
    bv = tuple(s.body_qd[:, :, k].T for k in range(3))
    bw = tuple(s.body_qd[:, :, 3 + k].T for k in range(3))
    return q_t, qd_t, bp, bq, bv, bw


def timeit(name, fn, *args):
    """Time fn inside a scan with the args as the carry: each iteration's
    inputs depend on the previous output (via a tiny eps mixed into every
    float leaf), so XLA can neither hoist the body nor constant-fold it."""
    def body(carry, _):
        cur_args, acc = carry
        out = fn(*cur_args)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
        eps = sum(jnp.sum(x).astype(jnp.float32) for x in leaves)
        acc = acc + eps

        def mix(a):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
                return a + (1e-30 * acc).astype(a.dtype)
            return a
        return (jax.tree.map(mix, cur_args), acc), None

    @jax.jit
    def loop(carry):
        return jax.lax.scan(body, carry, None, length=N)[0]

    # NB: strong-typed acc init — a weak 0.0 retraces on the 2nd call and
    # bills a full recompile to the timed loop
    t0 = time.time(); out = loop((args, jnp.float32(0)))
    jax.block_until_ready(out[1])
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = loop(out)
    jax.block_until_ready(out[1])
    el = (time.time() - t0) / (5 * N) * 1e3
    print(f"{name:34s} run {el:7.3f} ms  (compile {tc:.0f}s)", flush=True)
    return el


q_t, qd_t, bp, bq, bv, bw = mktup(sW)
B = m.structure.body_count

# precompute stage inputs once (un-jitted values fed as args)
v_o, w_o = jax.jit(lambda *a: bt._dof_subspace_t(m, *a))(bp, bq, q_t)
x_b, Iw, m_b = jax.jit(
    lambda *a: bt._spatial_inertia_t(m, np.arange(B), *a))(bp, bq)

timeit("collide (vmap)",
       lambda s: jax.vmap(pipe.collide)(s).rigid_contact_depth, sW)
timeit("dof_subspace_t", lambda *a: bt._dof_subspace_t(m, *a), bp, bq, q_t)
timeit("spatial_inertia_t",
       lambda *a: bt._spatial_inertia_t(m, np.arange(B), *a), bp, bq)
timeit("bias_forces_t (RNEA)",
       lambda *a: bt._bias_forces_t(m, *a),
       bp, bq, bv, bw, v_o, w_o, x_b, Iw, m_b)


def crba(vo, wo, xb, iw, mb):
    bi = g.body_idx[0]
    Iw_g = [[iw[i][j][bi] for j in range(3)] for i in range(3)]
    return bt._crba_t(m, g, vo, wo, bt._rows(xb, bi), Iw_g, mb[bi])


M0 = jax.jit(crba)(v_o, w_o, x_b, Iw, m_b)
timeit("crba_t", crba, v_o, w_o, x_b, Iw, m_b)
L0 = jax.jit(bt._chol_t)(M0)
timeit("chol_t", bt._chol_t, M0)
eye = jnp.eye(g.d, dtype=M0.dtype)[:, :, None]
eyeW = jnp.broadcast_to(eye, (g.d, g.d, W))
timeit("cho_solve (qd rhs)", bt._cho_solve_t, L0, qd_t[g.dof_idx[0]])
Minv0 = jax.jit(bt._cho_solve_t)(L0, eyeW)
timeit("cho_solve (Minv, d rhs)", bt._cho_solve_t, L0, eyeW)


def contacts_stage(minv, qdg, vo, wo, *rest):
    return bt._solve_contacts_t(
        solver, m, g, plan, minv, qdg, vo, wo,
        *rest, None)


lp = solver.limit_plans[0] if solver.limit_mode == "constraint" else None


def contacts_full(minv, qdg, vo, wo, bp_, bq_, bv_, bw_, xb, cb, qt):
    return bt._solve_contacts_t(
        solver, m, g, plan, minv, qdg, vo, wo,
        bp_, bq_, bv_, bw_, xb, cb, qt, dt, lp, None)


qd_g0 = qd_t[g.dof_idx[0]]
timeit("solve_contacts_t (full)", contacts_full,
       Minv0, qd_g0, v_o, w_o, bp, bq, bv, bw, x_b, contacts, q_t)
timeit("integrate_coords_t",
       lambda *a: bt._integrate_coords_t(m, *a, dt), q_t, qd_t)
timeit("fk_t", lambda *a: bt._fk_t(m, *a), q_t, qd_t, bp, bq, bv, bw)

timeit("smooth batched (no contacts)",
       lambda s: solver.step_batched(s, None, None, None, dt), sW)
timeit("full batched step", lambda s: solver.step_batched(
    s, None, None, jax.vmap(pipe.collide)(s), dt), sW)
timeit("full batched step+collide", lambda s: solver.step_batched(
    s, None, None, jax.vmap(pipe.collide)(s), dt), sW)
