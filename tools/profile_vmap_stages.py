import time, jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo
from newton_tpu.solvers.generalized.dynamics import dof_subspace, group_mass_matrix, group_bias_forces, get_generalized_cache, integrate_coords
from newton_tpu.solvers.generalized.linalg import cholesky_unrolled
from newton_tpu.parallel import batch_state

W = 4096
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets/ant.xml")
m = b.finalize()
pipe = CollisionPipeline(m)
solver = SolverMuJoCo(m, iterations=8, integrator="euler")
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
ctrl = m.control()
gc = get_generalized_cache(m.structure)
sW = batch_state(s1, W)

def timeit(name, fn, arg):
    f = jax.jit(jax.vmap(fn))
    t0=time.time(); out = f(arg); jax.block_until_ready(out); tc=time.time()-t0
    t0=time.time()
    for _ in range(10): out = f(arg)
    jax.block_until_ready(out)
    print(f"{name}: compile {tc:.0f}s run {(time.time()-t0)/10*1e3:.2f}ms", flush=True)

timeit("fk", lambda s: eval_fk(m, s.joint_q, s.joint_qd, s).body_q, sW)
timeit("collide", lambda s: pipe.collide(s).rigid_contact_depth, sW)
timeit("subspace", lambda s: dof_subspace(m, s.body_q)[0], sW)
timeit("bias", lambda s: group_bias_forces(m, s.body_q, s.body_qd, *dof_subspace(m, s.body_q)), sW)
def crba(s):
    v, w = dof_subspace(m, s.body_q)
    M = group_mass_matrix(m, s.body_q, gc.groups[0], v, w)
    return cholesky_unrolled(M + 0.01*jnp.eye(M.shape[-1]))
timeit("crba+chol", crba, sW)
def full(s):
    return solver.step(s, None, ctrl, pipe.collide(s), 1/240.).joint_q
timeit("full substep", full, sW)
