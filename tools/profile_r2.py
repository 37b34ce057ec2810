import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo
from newton_tpu.solvers.generalized.dynamics import (
    dof_subspace, group_mass_matrix, group_bias_forces,
    get_generalized_cache)
from newton_tpu.solvers.generalized.linalg import (
    cholesky_unrolled, cho_solve_unrolled)
from newton_tpu.parallel import batch_state

W = 4096
N = 20
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
           "assets/ant.xml")
m = b.finalize()
pipe = CollisionPipeline(m)
solver = SolverMuJoCo(m, iterations=8, integrator="euler")
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
ctrl = m.control()
gc = get_generalized_cache(m.structure)
g = gc.groups[0]
sW = batch_state(s1, W)


def timeit(name, stage):
    """Time vmapped `stage` amortized over N sequential scan iterations."""
    def body(s, _):
        out = jax.vmap(stage)(s)
        leaves = [x for x in jax.tree.leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                            jnp.floating)]
        eps = sum(jnp.sum(x) * 1e-30 for x in leaves)
        s = jax.tree.map(
            lambda x: x + eps if (hasattr(x, "dtype")
                                  and jnp.issubdtype(x.dtype, jnp.floating))
            else x, s)
        return s, None

    @jax.jit
    def loop(s):
        return jax.lax.scan(body, s, None, length=N)[0]

    t0 = time.time(); out = loop(sW); jax.block_until_ready(out.joint_q)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = loop(sW)
    jax.block_until_ready(out.joint_q)
    dt = (time.time() - t0) / (5 * N) * 1e3
    print(f"{name}: compile {tc:.0f}s run {dt:.3f}ms", flush=True)


timeit("fk", lambda s: eval_fk(m, s.joint_q, s.joint_qd, s).body_q)
timeit("collide", lambda s: pipe.collide(s).rigid_contact_depth)
timeit("subspace", lambda s: dof_subspace(m, s.body_q)[0])
timeit("subspace+bias", lambda s: group_bias_forces(
    m, s.body_q, s.body_qd, *dof_subspace(m, s.body_q)))


def crba_only(s):
    v, w = dof_subspace(m, s.body_q)
    return group_mass_matrix(m, s.body_q, g, v, w)


timeit("subspace+crba", crba_only)


def chol_inv(s):
    v, w = dof_subspace(m, s.body_q)
    M = group_mass_matrix(m, s.body_q, g, v, w)
    L = cholesky_unrolled(M + 0.01 * jnp.eye(M.shape[-1]))
    return cho_solve_unrolled(
        L, jnp.broadcast_to(jnp.eye(g.d, dtype=M.dtype), (g.n, g.d, g.d)))


timeit("subspace+crba+chol+inv", chol_inv)

timeit("smooth only (no contacts)",
       lambda s: solver.step(s, None, ctrl, None, 1 / 240.))
timeit("full substep (fused collide)",
       lambda s: solver.step(s, None, ctrl, pipe.collide(s), 1 / 240.))
