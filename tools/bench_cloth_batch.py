"""Batched-cloth benchmark: vmap over independent cloth instances."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np
import newton_tpu as nt
from newton_tpu.parallel import batch_state
from newton_tpu.solvers import SolverXPBD

N, B = 48, 64
b = nt.ModelBuilder()
b.add_cloth_grid(pos=(0, 0, 2.0), rot=None, vel=(0, 0, 0),
                 dim_x=N, dim_y=N, cell_x=0.02, cell_y=0.02,
                 mass=0.05, fix_left=True)
m = b.finalize()
solver = SolverXPBD(m, iterations=8, enable_particle_particle=False)
ctrl = m.control()
s1 = m.state()
sB = batch_state(s1, B)
@jax.jit
def frame(s):
    def sub(s, _):
        return solver.step(s, None, ctrl, None, 1/240.), None
    return jax.lax.scan(sub, s, None, length=16)[0]
stepB = jax.jit(jax.vmap(frame))
s = stepB(sB); jax.block_until_ready(s.particle_q)
t0 = time.perf_counter()
for _ in range(5): s = stepB(s)
jax.block_until_ready(s.particle_q)
el = time.perf_counter() - t0
steps = 5 * 16
P = m.particle_count
ok = bool(np.isfinite(np.asarray(s.particle_q)).all())
print(f"batched xpbd: {B} cloths x {P} particles, "
      f"{B*steps/el/1e3:.1f}k cloth-steps/s, "
      f"{B*steps*P/el/1e6:.0f}M particle-steps/s, finite={ok}")
