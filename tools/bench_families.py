"""IK + MPM family benchmarks on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.ik import IKObjectivePosition, IKSolver
from newton_tpu.sim.articulation import eval_fk

# ---- batched IK: 3-link arm, 4096 problems x 4 seeds ----
b = nt.ModelBuilder(gravity=0.0)
parent = -1
for i in range(3):
    link = b.add_body(xform=[0.5 + i, 0, 1, 0, 0, 0, 1])
    b.add_shape_capsule(link, radius=0.04, half_height=0.45)
    b.add_joint_revolute(parent, link, axis="Y",
                         xform_p=([0, 0, 1, 0, 0, 0, 1] if i == 0
                                  else [0.5, 0, 0, 0, 0, 0, 1]),
                         xform_c=[-0.5, 0, 0, 0, 0, 0, 1])
    parent = link
m = b.finalize()
ik = IKSolver(m, [IKObjectivePosition(link=2, offset=(0.5, 0, 0))],
              iterations=16, n_seeds=4)
P = 4096
ang = jnp.linspace(0, 2 * jnp.pi, P)
targets = jnp.stack([1.2 + 0.8 * jnp.cos(ang), jnp.zeros(P),
                     1.0 + 0.8 * jnp.sin(ang)], axis=-1)
solve = jax.jit(lambda t: ik.solve(m.joint_q0, [t]))
q = solve(targets); jax.block_until_ready(q)
t0 = time.perf_counter()
for _ in range(5): q = solve(targets)
jax.block_until_ready(q)
el = (time.perf_counter() - t0) / 5
print(f"ik: {P} problems x 4 seeds x 16 LM iters in {el*1e3:.1f}ms "
      f"= {P/el/1e3:.0f}k solves/s")

# ---- MPM sand ----
from newton_tpu.solvers import SolverImplicitMPM
b = nt.ModelBuilder()
b.add_particle_grid(pos=(0, 0, 0.5), dim_x=24, dim_y=24, dim_z=24,
                    cell_x=0.02, cell_y=0.02, cell_z=0.02, mass=0.01,
                    radius=0.01)
b.add_ground_plane()
m2 = b.finalize()
solver = SolverImplicitMPM(m2)
s = solver.init_state(m2.state())
ctrl = m2.control()
@jax.jit
def frame(s):
    def sub(s, _):
        return solver.step(s, None, ctrl, None, 1 / 240.), None
    return jax.lax.scan(sub, s, None, length=8)[0]
s = frame(s); jax.block_until_ready(s.particle_q)
t0 = time.perf_counter()
for _ in range(5): s = frame(s)
jax.block_until_ready(s.particle_q)
el = time.perf_counter() - t0
steps = 40
Np = m2.particle_count
ok = bool(np.isfinite(np.asarray(s.particle_q)).all())
print(f"mpm: {Np} particles, {steps/el:.0f} steps/s "
      f"({steps*Np/el/1e6:.1f}M particle-steps/s) finite={ok}")
