"""Layout experiment: env axis leading (current) vs trailing (W-on-lanes).

If vmap(in_axes=-1) keeps the batch on the minor axis, every elementwise op
runs dense across 128 lanes instead of padding 3-wide minor dims 42x.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers.generalized.dynamics import (
    dof_subspace, group_mass_matrix, group_bias_forces,
    get_generalized_cache)
from newton_tpu.solvers.generalized.linalg import (
    cholesky_unrolled, cho_solve_unrolled)

W = 4096
N = 20
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
           "assets/ant.xml")
m = b.finalize()
gc = get_generalized_cache(m.structure)
g = gc.groups[0]
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())

bq1 = s1.body_q          # (B, 7)
bqd1 = s1.body_qd
key = jax.random.PRNGKey(0)
noise = 0.01 * jax.random.normal(key, (W,) + bq1.shape)
bqW_lead = bq1[None] + noise                     # (W, B, 7)
bqdW_lead = jnp.broadcast_to(bqd1[None], (W,) + bqd1.shape) + 0.0
bqW_trail = jnp.moveaxis(bqW_lead, 0, -1)        # (B, 7, W)
bqdW_trail = jnp.moveaxis(bqdW_lead, 0, -1)


def timeit(name, loop, arg):
    t0 = time.time(); out = loop(arg); jax.block_until_ready(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = loop(arg)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / (5 * N) * 1e3
    print(f"{name}: compile {tc:.0f}s run {dt:.3f}ms", flush=True)


def scan_loop(stage, in_axes):
    def body(x, _):
        out = jax.vmap(stage, in_axes=in_axes, out_axes=in_axes)(x)
        return x + 1e-30 * jnp.sum(out) , None

    @jax.jit
    def loop(x):
        return jax.lax.scan(body, x, None, length=N)[0]
    return loop


def crba(body_q):
    v, w = dof_subspace(m, body_q)
    return jnp.sum(group_mass_matrix(m, body_q, g, v, w))


def chol_inv(body_q):
    v, w = dof_subspace(m, body_q)
    M = group_mass_matrix(m, body_q, g, v, w)
    L = cholesky_unrolled(M + 0.01 * jnp.eye(M.shape[-1]))
    Minv = cho_solve_unrolled(
        L, jnp.broadcast_to(jnp.eye(g.d, dtype=M.dtype), (g.n, g.d, g.d)))
    return jnp.sum(Minv)


timeit("crba lead", scan_loop(crba, 0), bqW_lead)
timeit("crba trail", scan_loop(crba, -1), bqW_trail)
timeit("crba+chol+inv lead", scan_loop(chol_inv, 0), bqW_lead)
timeit("crba+chol+inv trail", scan_loop(chol_inv, -1), bqW_trail)


def bias(args):
    body_q, body_qd = args
    v, w = dof_subspace(m, body_q)
    return jnp.sum(group_bias_forces(m, body_q, body_qd, v, w))


def scan_loop2(stage, ax):
    def body(xs, _):
        out = jax.vmap(stage, in_axes=((ax, ax),))(xs)
        return (xs[0] + 1e-30 * jnp.sum(out), xs[1]), None

    @jax.jit
    def loop(xs):
        return jax.lax.scan(body, xs, None, length=N)[0][0]
    return loop


timeit("bias lead", scan_loop2(bias, 0), (bqW_lead, bqdW_lead))
timeit("bias trail", scan_loop2(bias, -1), (bqW_trail, bqdW_trail))
