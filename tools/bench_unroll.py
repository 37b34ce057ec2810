"""Quick A/B: substep-scan unroll effect on the ant KPI."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers.generalized.solver import SolverMuJoCo
from newton_tpu.parallel import batch_state

W, FRAMES, SUB = 4096, 30, 4
asset = "/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets/ant.xml"
robot = nt.ModelBuilder(); robot.add_mjcf(asset)
model = robot.finalize()
pipeline = CollisionPipeline(model)
solver = SolverMuJoCo(model, iterations=8, integrator="euler")
state1 = eval_fk(model, model.joint_q0, model.joint_qd0, model.state())
control = model.control()
dt = 1/240.
D = model.joint_dof_count
gear = model.custom.get("mjc:actuator_gear", jnp.zeros((D,)))

def run(unroll_sub, unroll_frame):
    state = batch_state(state1, W)
    def env_substep(s, ctl):
        return solver.step(s, None, ctl, pipeline.collide(s), dt)
    def frame(carry, _):
        state, key = carry
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (W, D)) * 2 - 1
        def substep(s, _):
            ctl = jax.vmap(lambda f: control.replace(joint_f=f))(u * gear[None])
            return jax.vmap(env_substep)(s, ctl), None
        state, _ = jax.lax.scan(substep, state, None, length=SUB, unroll=unroll_sub)
        return (state, key), None
    def rollout(state, key):
        (state, key), _ = jax.lax.scan(frame, (state, key), None, length=10,
                                       unroll=unroll_frame)
        return state, key
    rj = jax.jit(rollout, donate_argnums=0)
    key = jax.random.PRNGKey(0)
    state, key = rj(state, key); jax.block_until_ready(state.joint_q)
    t0 = time.perf_counter()
    for _ in range(3):
        state, key = rj(state, key)
    jax.block_until_ready(state.joint_q)
    el = time.perf_counter() - t0
    eps = W * 30 / el
    print(f"unroll_sub={unroll_sub} unroll_frame={unroll_frame}: {eps/1000:.1f}k env-steps/s")
    return eps

run(1, 1)
run(2, 1)
run(4, 1)
run(1, 2)
