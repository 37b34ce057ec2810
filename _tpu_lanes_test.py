import time, jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo

W = 4096
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets/ant.xml")
m = b.finalize()
pipe = CollisionPipeline(m)
solver = SolverMuJoCo(m, iterations=8)
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
ctrl = m.control()

def substep(s):
    return solver.step(s, None, ctrl, pipe.collide(s), 1/240.)

for axis, name in ((0, "env-first"), (-1, "env-last")):
    if axis == 0:
        sW = jax.tree.map(lambda x: jnp.broadcast_to(x, (W, *x.shape)).copy(), s1)
    else:
        sW = jax.tree.map(lambda x: jnp.broadcast_to(x[..., None], (*x.shape, W)).copy(), s1)
    f = jax.jit(jax.vmap(substep, in_axes=axis, out_axes=axis))
    t0=time.time(); out = f(sW); jax.block_until_ready(out)
    tc = time.time()-t0
    t0=time.time()
    for _ in range(20): out = f(out)
    jax.block_until_ready(out)
    print(f"{name}: compile {tc:.0f}s run {(time.time()-t0)/20*1e3:.2f} ms/substep", flush=True)
