import time, jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo
from newton_tpu.parallel import batch_state

W = 4096
N_SUB = 40
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets/ant.xml")
m = b.finalize()
pipe = CollisionPipeline(m)
solver = SolverMuJoCo(m, iterations=8, integrator="euler")
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
ctrl = m.control()
sW = batch_state(s1, W)

def scan_time(name, body):
    @jax.jit
    def run(s):
        return jax.lax.scan(lambda ss, _: (body(ss), None), s, None,
                            length=N_SUB)[0]
    out = run(sW); jax.block_until_ready(out)
    t0=time.time()
    out = run(sW); jax.block_until_ready(out)
    ms = (time.time()-t0)/N_SUB*1e3
    print(f"{name}: {ms:.2f} ms/substep", flush=True)

# full
scan_time("full", jax.vmap(lambda s: solver.step(s, None, ctrl, pipe.collide(s), 1/240.)))
# no contacts (smooth dynamics only)
scan_time("smooth-only", jax.vmap(lambda s: solver.step(s, None, ctrl, None, 1/240.)))
# collide only (touch state so scan carries)
def collide_only(s):
    c = jax.vmap(pipe.collide)(s)
    return s.replace(body_f=s.body_f + 0.0 * jnp.sum(c.rigid_contact_depth) )
scan_time("collide-only", collide_only)
# fk only
def fk_only(s):
    return jax.vmap(lambda ss: eval_fk(m, ss.joint_q, ss.joint_qd, ss))(s)
scan_time("fk-only", fk_only)
