"""TPU timing: transposed batched step vs vmapped per-env step (ant, 4096)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
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
solver = SolverMuJoCo(m, iterations=8, integrator="euler")
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
sW = batch_state(s1, W)
dt = 1.0 / 240.0


def timeit(name, substep):
    def body(s, _):
        return substep(s), None

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
    print(f"{name}: compile {tc:.0f}s run {el:.3f}ms "
          f"({W / el * 1e3 / 1e6:.2f}M env-steps/s)", flush=True)


def sub_batched(s):
    ct = jax.vmap(pipe.collide)(s)
    return solver.step_batched(s, None, None, ct, dt)


def sub_vmap(s):
    def one(si):
        ct = pipe.collide(si)
        return solver.step(si, None, None, ct, dt)
    return jax.vmap(one)(s)


timeit("batched", sub_batched)
timeit("vmap   ", sub_vmap)
