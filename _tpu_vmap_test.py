import time, jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.generalized.solver import SolverMuJoCo

W = 4096
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets/ant.xml")
model = b.finalize()   # ONE world
pipe = CollisionPipeline(model)
solver = SolverMuJoCo(model, iterations=8)
s0 = eval_fk(model, model.joint_q0, model.joint_qd0, model.state())
ctrl = model.control()
dt = 1/240.

def substep(state):
    c = pipe.collide(state)
    return solver.step(state, None, ctrl, c, dt)

# batch the state over W envs
sW = jax.tree.map(lambda x: jnp.broadcast_to(x, (W, *x.shape)), s0)
step_v = jax.jit(jax.vmap(substep))
t0=time.time(); out = step_v(sW); jax.block_until_ready(out.joint_q)
print("vmap substep: compile", round(time.time()-t0,1), "s", flush=True)
t0=time.time()
for _ in range(20): out = step_v(out)
jax.block_until_ready(out.joint_q)
print("vmap substep run:", round((time.time()-t0)/20*1e3, 2), "ms", flush=True)
print("sane:", float(out.joint_q[0,2]), float(out.joint_q[123,2]))
