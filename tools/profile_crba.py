"""Decompose CRBA cost: subspace / inertia / V build / einsums / precision."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import newton_tpu as nt
from newton_tpu.math import quat_rotate, quat_to_matrix
from newton_tpu.sim.articulation import eval_fk
from newton_tpu.solvers.generalized.dynamics import (
    dof_subspace, get_generalized_cache, _body_spatial_inertia)

W = 4096
N = 20
b = nt.ModelBuilder()
b.add_mjcf("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
           "assets/ant.xml")
m = b.finalize()
gc = get_generalized_cache(m.structure)
g = gc.groups[0]
s1 = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
key = jax.random.PRNGKey(0)
bqW = s1.body_q[None] + 0.01 * jax.random.normal(key, (W,) + s1.body_q.shape)


def timeit(name, stage):
    def body(x, _):
        out = jax.vmap(stage)(x)
        return x + 1e-30 * jnp.sum(out), None

    @jax.jit
    def loop(x):
        return jax.lax.scan(body, x, None, length=N)[0]
    t0 = time.time(); out = loop(bqW); jax.block_until_ready(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = loop(bqW)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / (5 * N) * 1e3
    print(f"{name}: compile {tc:.0f}s run {dt:.3f}ms", flush=True)


timeit("subspace", lambda bq: sum(jnp.sum(x) for x in dof_subspace(m, bq)))
timeit("inertia", lambda bq: sum(jnp.sum(x) for x in _body_spatial_inertia(m, bq)))


def v_build(bq):
    v_o, w = dof_subspace(m, bq)
    m_b, x_b, I_w = _body_spatial_inertia(m, bq)
    anc = jnp.asarray(g.anc, dtype=bq.dtype)
    vg = v_o[g.dof_idx]
    wg = w[g.dof_idx]
    xg = x_b[g.body_idx]
    V = vg[:, None, :, :] + jnp.cross(wg[:, None, :, :], xg[:, :, None, :])
    V = V * anc[None, :, :, None]
    Wm = wg[:, None, :, :] * anc[None, :, :, None]
    return jnp.sum(V) + jnp.sum(Wm)


timeit("subspace+inertia+Vbuild", v_build)


def crba_prec(prec):
    def f(bq):
        v_o, w = dof_subspace(m, bq)
        m_b, x_b, I_w = _body_spatial_inertia(m, bq)
        anc = jnp.asarray(g.anc, dtype=bq.dtype)
        vg = v_o[g.dof_idx]
        wg = w[g.dof_idx]
        xg = x_b[g.body_idx]
        mg = m_b[g.body_idx]
        Ig = I_w[g.body_idx]
        V = vg[:, None, :, :] + jnp.cross(wg[:, None, :, :], xg[:, :, None, :])
        V = V * anc[None, :, :, None]
        Wm = wg[:, None, :, :] * anc[None, :, :, None]
        M = (jnp.einsum("nb,nbdc,nbec->nde", mg, V, V, precision=prec)
             + jnp.einsum("nbdc,nbck,nbek->nde", Wm, Ig, Wm, precision=prec))
        return jnp.sum(M)
    return f


timeit("crba HIGHEST", crba_prec(jax.lax.Precision.HIGHEST))
timeit("crba DEFAULT", crba_prec(jax.lax.Precision.DEFAULT))


def crba_flat(prec):
    """Single contraction: M = K^T K with K = (n, 6b, d)."""
    def f(bq):
        v_o, w = dof_subspace(m, bq)
        m_b, x_b, I_w = _body_spatial_inertia(m, bq)
        anc = jnp.asarray(g.anc, dtype=bq.dtype)
        vg = v_o[g.dof_idx]
        wg = w[g.dof_idx]
        xg = x_b[g.body_idx]
        mg = m_b[g.body_idx]
        Ig = I_w[g.body_idx]
        V = (vg[:, None, :, :] + jnp.cross(wg[:, None, :, :],
                                           xg[:, :, None, :]))
        V = V * anc[None, :, :, None]                     # (n, b, d, 3)
        Wm = wg[:, None, :, :] * anc[None, :, :, None]
        # P = [sqrt(m) V; L_I^T W]: M = P^T P, via per-body chol of I (3x3)
        LI = jnp.linalg.cholesky(Ig + 1e-12 * jnp.eye(3))  # (n, b, 3, 3)
        P1 = jnp.sqrt(mg)[:, :, None, None] * V           # (n, b, d, 3)
        P2 = jnp.einsum("nbck,nbdc->nbdk", LI, Wm, precision=prec)
        P = jnp.concatenate([P1, P2], axis=-1)            # (n, b, d, 6)
        n = P.shape[0]
        Pf = jnp.moveaxis(P, 2, 1).reshape(n, g.d, g.b * 6)  # (n, d, 6b)
        M = jnp.einsum("ndk,nek->nde", Pf, Pf, precision=prec)
        return jnp.sum(M)
    return f


timeit("crba flat HIGHEST", crba_flat(jax.lax.Precision.HIGHEST))
timeit("crba flat DEFAULT", crba_flat(jax.lax.Precision.DEFAULT))
