"""Cloth benchmark: XPBD + VBD + Style3D on an NxN grid (reference:
asv/benchmarks/simulation cloth benchmarks)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np
import newton_tpu as nt
from newton_tpu.solvers import SolverXPBD, SolverVBD, SolverStyle3D

N = 64
def build():
    b = nt.ModelBuilder()
    b.add_cloth_grid(pos=(0, 0, 2.0), rot=None, vel=(0, 0, 0),
                     dim_x=N, dim_y=N, cell_x=0.02, cell_y=0.02,
                     mass=0.05, fix_left=True)
    return b.finalize()

for name, mk in (("xpbd", lambda m: SolverXPBD(m, iterations=8, enable_particle_particle=False)),
                 ("vbd", lambda m: SolverVBD(m, iterations=4)),
                 ("style3d", lambda m: SolverStyle3D(m, iterations=8))):
    m = build()
    solver = mk(m)
    s = m.state()
    ctrl = m.control()
    @jax.jit
    def frame(s, solver=solver, ctrl=ctrl):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, 1/240.), None
        return jax.lax.scan(sub, s, None, length=16)[0]
    s = frame(s); jax.block_until_ready(s.particle_q)   # compile
    t0 = time.perf_counter()
    for _ in range(5): s = frame(s)
    jax.block_until_ready(s.particle_q)
    el = time.perf_counter() - t0
    steps = 5 * 16
    P = m.particle_count
    ok = bool(np.isfinite(np.asarray(s.particle_q)).all())
    print(f"{name}: {P} particles, {steps/el:.0f} steps/s "
          f"({steps*P/el/1e6:.1f}M particle-steps/s) finite={ok}")
