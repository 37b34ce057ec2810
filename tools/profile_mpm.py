import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.solvers import SolverImplicitMPM
from newton_tpu.solvers.solver_mpm import _svd3

b = nt.ModelBuilder()
b.add_particle_grid(pos=(0, 0, 0.5), dim_x=24, dim_y=24, dim_z=24,
                    cell_x=0.02, cell_y=0.02, cell_z=0.02, mass=0.01, radius=0.01)
b.add_ground_plane()
m = b.finalize()
solver = SolverImplicitMPM(m)
s = solver.init_state(m.state())
N = m.particle_count

def timeit(name, f, *a):
    g = jax.jit(f)
    out = g(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20): out = g(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms")

F = s.custom["mpm:F"]
timeit("svd3 alone", lambda F: _svd3(F)[1], F)

# scatter alone: the P2G segment_sum shape
res = solver.res
flat = jnp.asarray(np.random.randint(0, res**3, size=(N*27,)))
vals = jnp.ones((N*27, 3))
timeit("segment_sum 27N->res^3", lambda v: jax.ops.segment_sum(v, flat, res**3), vals)
timeit("gather res^3->27N", lambda g: g[flat], jnp.ones((res**3, 3)))

ctrl = m.control()
timeit("full step", lambda s: solver.step(s, None, ctrl, None, 1/240.).particle_q, s)
