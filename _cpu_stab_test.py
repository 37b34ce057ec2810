import jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo
from newton_tpu.parallel import batch_state
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets/ant.xml")
m = b.finalize()
pipe = CollisionPipeline(m)
solver = SolverMuJoCo(m, iterations=8)
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
ctrl = m.control()
D = m.joint_dof_count
gear = m.custom["mjc:actuator_gear"]
W = 256
s = batch_state(s1, W)
key = jax.random.PRNGKey(0)
def env_substep(s, ctl):
    return solver.step(s, None, ctl, pipe.collide(s), 1/240.)
@jax.jit
def frame(s, key):
    key, sub = jax.random.split(key)
    cv = jax.random.uniform(sub, (W, D), minval=-1., maxval=1.)
    ctl = jax.vmap(lambda f: ctrl.replace(joint_f=f))(cv * gear[None])
    def substep(s, _):
        return jax.vmap(env_substep)(s, ctl), None
    return jax.lax.scan(substep, s, None, length=4)[0], key
for i in range(50):
    s, key = frame(s, key)
    n_nan = int(jnp.isnan(s.joint_q.reshape(W, -1)).any(axis=1).sum())
    mx = float(jnp.nanmax(jnp.abs(s.joint_qd)))
    if i % 5 == 0 or n_nan:
        print(i, "nan envs:", n_nan, "max|qd|:", round(mx,1), flush=True)
    if n_nan: break
