import time, jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.generalized.solver import SolverMuJoCo
from newton_tpu.solvers.generalized.dynamics import dof_subspace, group_mass_matrix, group_bias_forces, get_generalized_cache

W = 4096
robot = nt.ModelBuilder(); robot.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets/ant.xml")
scene = nt.ModelBuilder(); scene.replicate(robot, W)
t0=time.time(); model = scene.finalize(); print("finalize s:", round(time.time()-t0,1), flush=True)
pipe = CollisionPipeline(model)
solver = SolverMuJoCo(model, iterations=8, integrator="euler")
state = eval_fk(model, model.joint_q0, model.joint_qd0, model.state())
ctrl = model.control()
gc = get_generalized_cache(model.structure)

def timeit(name, fn, *args):
    t0=time.time()
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    tc = time.time()-t0
    t0=time.time()
    for _ in range(10):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: compile {tc:.1f}s run {(time.time()-t0)/10*1e3:.2f}ms", flush=True)
    return out

timeit("fk", lambda s: eval_fk(model, s.joint_q, s.joint_qd, s).body_q, state)
timeit("collide", lambda s: pipe.collide(s).rigid_contact_depth, state)
timeit("subspace+bias", lambda s: group_bias_forces(model, s.body_q, s.body_qd, *dof_subspace(model, s.body_q)), state)
def mass_chol(s):
    v, w = dof_subspace(model, s.body_q)
    M = group_mass_matrix(model, s.body_q, gc.groups[0], v, w)
    return jnp.linalg.cholesky(M + 0.01*jnp.eye(M.shape[-1]))
timeit("crba+chol", mass_chol, state)
contacts = jax.jit(pipe.collide)(state)
timeit("full step", lambda s: solver.step(s, None, ctrl, contacts, 1/240.).joint_q, state)
