"""Stage split of the batched substep on TPU (ant, 4096 envs)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo
from newton_tpu.solvers.generalized import batched as bt
from newton_tpu.solvers.generalized.dynamics import integrate_coords
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
sW = batch_state(s1, W)
dt = 1.0 / 240.0


def timeit(name, substep):
    def body(s, _):
        out = substep(s)
        if not isinstance(out, type(s)):
            eps = 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(out)
                              if hasattr(x, "dtype"))
            s = s.replace(joint_q=s.joint_q + eps)
            return s, None
        return out, None

    @jax.jit
    def loop(s):
        return jax.lax.scan(body, s, None, length=N)[0]

    t0 = time.time(); out = loop(sW); jax.block_until_ready(out.joint_q)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = loop(sW)
    jax.block_until_ready(out.joint_q)
    el = (time.time() - t0) / (5 * N) * 1e3
    print(f"{name}: compile {tc:.0f}s run {el:.3f}ms", flush=True)


timeit("collide only", lambda s: jax.vmap(pipe.collide)(s).rigid_contact_depth)
timeit("fk only (vmap)", lambda s: jax.vmap(
    lambda q, qd, si: eval_fk(m, q, qd, si))(s.joint_q, s.joint_qd, s))
timeit("integrate only (vmap)", lambda s: jax.vmap(
    lambda q, qd, bq: integrate_coords(m, q, qd, bq, dt))(
        s.joint_q, s.joint_qd, s.body_q))
timeit("smooth batched (no contacts)",
       lambda s: solver.step_batched(s, None, None, None, dt))
timeit("full batched", lambda s: solver.step_batched(
    s, None, None, jax.vmap(pipe.collide)(s), dt))
