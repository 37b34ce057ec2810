import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.math import orthonormal_basis
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.sim.collide import CollisionPipeline
from newton_tpu.solvers import SolverMuJoCo
from newton_tpu.solvers.generalized.dynamics import (
    dof_subspace, group_mass_matrix, get_generalized_cache)
from newton_tpu.solvers.generalized.linalg import (
    cholesky_unrolled, cho_solve_unrolled)
from newton_tpu.parallel import batch_state

W = 4096
N = 20
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
           "assets/ant.xml")
m = b.finalize()
pipe = CollisionPipeline(m)
solver = SolverMuJoCo(m, iterations=8, integrator="euler")
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
ctrl = m.control()
gc = get_generalized_cache(m.structure)
g = gc.groups[0]
plan = solver.contact_plans[0]
sW = batch_state(s1, W)
hp = jax.lax.Precision.HIGHEST


def timeit(name, stage):
    def body(s, _):
        out = jax.vmap(stage)(s)
        leaves = [x for x in jax.tree.leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                            jnp.floating)]
        eps = sum(jnp.sum(x) * 1e-30 for x in leaves)
        s = jax.tree.map(
            lambda x: x + eps if (hasattr(x, "dtype")
                                  and jnp.issubdtype(x.dtype, jnp.floating))
            else x, s)
        return s, None

    @jax.jit
    def loop(s):
        return jax.lax.scan(body, s, None, length=N)[0]

    t0 = time.time(); out = loop(sW); jax.block_until_ready(out.joint_q)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = loop(sW)
    jax.block_until_ready(out.joint_q)
    dt = (time.time() - t0) / (5 * N) * 1e3
    print(f"{name}: compile {tc:.0f}s run {dt:.3f}ms", flush=True)


def minv_of(s):
    v, w = dof_subspace(m, s.body_q)
    M = group_mass_matrix(m, s.body_q, g, v, w)
    L = cholesky_unrolled(M + 0.01 * jnp.eye(M.shape[-1]))
    Minv = cho_solve_unrolled(
        L, jnp.broadcast_to(jnp.eye(g.d, dtype=M.dtype), (g.n, g.d, g.d)))
    return Minv, v, w


def build_jt(s):
    c = pipe.collide(s)
    nrm = c.rigid_contact_normal[plan.slots]
    pos = c.rigid_contact_position[plan.slots]
    t1, t2 = orthonormal_basis(nrm)
    Minv, v_o, w_o = minv_of(s)
    vg = v_o[g.dof_idx]
    wg = w_o[g.dof_idx]
    Vp = vg[:, None, :, :] + jnp.cross(wg[:, None, :, :], pos[:, :, None, :])
    anc = jnp.asarray(g.anc, dtype=s.joint_q.dtype)
    zero = jnp.zeros((g.d,), dtype=s.joint_q.dtype)
    anc1 = jnp.where((plan.lb1 >= 0)[:, None], anc[np.maximum(plan.lb1, 0)],
                     zero)
    anc0 = jnp.where((plan.lb0 >= 0)[:, None], anc[np.maximum(plan.lb0, 0)],
                     zero)
    dirs = jnp.stack([nrm, t1, t2], axis=2)
    sign_t = jnp.swapaxes(anc1 - anc0, 0, 1)[None, :, :, None]
    n_env = nrm.shape[0]
    Jt = (jnp.einsum("nckx,ncdx->ndck", dirs, Vp) * sign_t
          ).reshape(n_env, g.d, -1)
    return Jt, Minv


timeit("collide+minv+Jt build", lambda s: build_jt(s)[0])


def build_minvjt(s):
    Jt, Minv = build_jt(s)
    MinvJt = jnp.einsum("nde,ner->ndr", Minv, Jt, precision=hp)
    diag = jnp.einsum("ndr,ndr->nr", Jt, MinvJt, precision=hp)
    return MinvJt, diag


timeit("... + MinvJt + diag", build_minvjt)


def with_cap(s):
    Jt, Minv = build_jt(s)
    MinvJt = jnp.einsum("nde,ner->ndr", Minv, Jt, precision=hp)
    diag = jnp.einsum("ndr,ndr->nr", Jt, MinvJt, precision=hp) + 1e-6

    def Avec(x):
        return jnp.einsum("ndr,nd->nr", Jt,
                          jnp.einsum("ndr,nr->nd", MinvJt, x, precision=hp),
                          precision=hp)

    inv_sqrt_d = jax.lax.rsqrt(diag)
    u = jnp.ones_like(diag)
    for _ in range(6):
        u2 = inv_sqrt_d * Avec(inv_sqrt_d * u)
        u = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True),
                             1e-9)
    return u


timeit("... + 6 power iters", with_cap)
