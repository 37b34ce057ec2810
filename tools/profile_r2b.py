import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo
from newton_tpu.parallel import batch_state

W = 4096
N = 20
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
           "assets/ant.xml")
m = b.finalize()
pipe = CollisionPipeline(m)
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
ctrl = m.control()
sW = batch_state(s1, W)


def timeit(name, stage):
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


for iters in (1, 4, 8):
    solver = SolverMuJoCo(m, iterations=iters, integrator="euler")
    timeit(f"substep iters={iters}",
           lambda s, sv=solver: sv.step(s, None, ctrl, pipe.collide(s),
                                        1 / 240.))

# limit_mode penalty removes the 16 limit rows from the impulse system
from newton_tpu.solvers.generalized.solver import SolverFeatherstone
sp = SolverFeatherstone(m, contact_iterations=8, limit_mode="penalty")
timeit("substep iters=8 (penalty limits)",
       lambda s: sp.step(s, None, ctrl, pipe.collide(s), 1 / 240.))
