import time, jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo, SolverFeatherstone
from newton_tpu.solvers.generalized.dynamics import dof_subspace, group_mass_matrix, group_bias_forces, get_generalized_cache
from newton_tpu.parallel import batch_state

W, N_SUB = 4096, 40
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets/ant.xml")
m = b.finalize()
pipe = CollisionPipeline(m)
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
ctrl = m.control()
sW = batch_state(s1, W)
gc = get_generalized_cache(m.structure)

def scan_time(name, body):
    @jax.jit
    def run(s):
        return jax.lax.scan(lambda ss, _: (body(ss), None), s, None, length=N_SUB)[0]
    out = run(sW); jax.block_until_ready(out)
    t0=time.time(); out = run(sW); jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/N_SUB*1e3:.2f} ms/substep", flush=True)

for iters in (1, 8, 16):
    sv = SolverMuJoCo(m, iterations=iters)
    scan_time(f"full iters={iters}",
              jax.vmap(lambda s, sv=sv: sv.step(s, None, ctrl, pipe.collide(s), 1/240.)))
# smooth pieces
def bias_only(s):
    def one(ss):
        v, w = dof_subspace(m, ss.body_q)
        tau = group_bias_forces(m, ss.body_q, ss.body_qd, v, w)
        return ss.replace(joint_qd=ss.joint_qd + 0.0 * tau)
    return jax.vmap(one)(s)
scan_time("subspace+bias only", bias_only)
def crba_only(s):
    def one(ss):
        v, w = dof_subspace(m, ss.body_q)
        M = group_mass_matrix(m, ss.body_q, gc.groups[0], v, w)
        return ss.replace(joint_qd=ss.joint_qd + 0.0 * jnp.sum(M))
    return jax.vmap(one)(s)
scan_time("subspace+crba only", crba_only)
