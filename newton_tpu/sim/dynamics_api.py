"""Public articulation dynamics API: Jacobian, mass matrix, inverse dynamics.

TPU-native equivalents of reference newton/_src/sim/articulation.py
``eval_jacobian`` (:1172), ``eval_mass_matrix`` (:1594, CRBA),
``eval_inverse_dynamics_force`` (:1472, RNEA) and
sim/inverse_dynamics.py:364 ``eval_inverse_dynamics_passive`` — thin
wrappers over the batched generalized-coordinate machinery in
:mod:`newton_tpu.solvers.generalized.dynamics`.

All functions return per-articulation batches ``(n_arts, ...)`` grouped by
topology; for a single-signature model (the common case, incl. every
``replicate`` scene) the group axis is the environment axis.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..math import quat_rotate
from ..solvers.generalized.dynamics import (
    dof_subspace,
    get_generalized_cache,
    group_bias_forces,
    group_mass_matrix,
)
from .model import Model
from .state import State

__all__ = ["eval_mass_matrix", "eval_jacobian", "eval_inverse_dynamics",
           "eval_dense_jacobian_rows"]


def eval_mass_matrix(model: Model, state: State) -> List[jnp.ndarray]:
    """Joint-space mass matrices, one ``(n, d, d)`` array per articulation
    group (reference: articulation.py:1594)."""
    v_o, w_o = dof_subspace(model, state.body_q, state.joint_q)
    gc = get_generalized_cache(model.structure)
    return [group_mass_matrix(model, state.body_q, g, v_o, w_o)
            for g in gc.groups]


def eval_jacobian(model: Model, state: State) -> List[jnp.ndarray]:
    """Body Jacobians ``(n, bodies, 6, d)`` per articulation group — the
    twist ``[v_com, w]`` of each body per unit dof velocity
    (reference: articulation.py:1172)."""
    v_o, w_o = dof_subspace(model, state.body_q, state.joint_q)
    gc = get_generalized_cache(model.structure)
    bq = state.body_q
    x_com = bq[:, 0:3] + quat_rotate(bq[:, 3:7], model.body_com)
    out = []
    for g in gc.groups:
        vg = v_o[g.dof_idx]                                 # (n, d, 3)
        wg = w_o[g.dof_idx]
        xg = x_com[g.body_idx]                              # (n, b, 3)
        anc = jnp.asarray(g.anc, dtype=bq.dtype)            # (b, d)
        V = (vg[:, None, :, :] + jnp.cross(wg[:, None, :, :],
                                           xg[:, :, None, :]))
        V = V * anc[None, :, :, None]
        W = jnp.broadcast_to(wg[:, None, :, :], V.shape) * anc[None, :, :, None]
        J = jnp.concatenate([V, W], axis=-1)                # (n, b, d, 6)
        out.append(jnp.swapaxes(J, 2, 3))                   # (n, b, 6, d)
    return out


def eval_dense_jacobian_rows(model: Model, state: State, points: jnp.ndarray,
                             bodies: np.ndarray, dirs: jnp.ndarray,
                             group_index: int = 0) -> jnp.ndarray:
    """Task-space Jacobian rows dir . v(point) for arbitrary attachment
    points — the building block the IK/OSC layers use."""
    v_o, w_o = dof_subspace(model, state.body_q, state.joint_q)
    gc = get_generalized_cache(model.structure)
    g = gc.groups[group_index]
    vg = v_o[g.dof_idx]
    wg = w_o[g.dof_idx]
    anc = jnp.asarray(g.anc, dtype=state.body_q.dtype)
    Vp = vg[:, None, :, :] + jnp.cross(wg[:, None, :, :],
                                       points[:, :, None, :])
    Vp = Vp * anc[None, bodies][:, :, :, None]
    return jnp.einsum("npx,npdx->npd", dirs, Vp)


def eval_inverse_dynamics(model: Model, state: State,
                          qdd: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Generalized forces realizing ``qdd`` at the current state:
    tau = M qdd + bias(q, qd) (RNEA; reference articulation.py:1472).
    With ``qdd=None`` returns the passive bias forces alone
    (reference inverse_dynamics.py:364)."""
    v_o, w_o = dof_subspace(model, state.body_q, state.joint_q)
    tau = group_bias_forces(model, state.body_q, state.body_qd, v_o, w_o)
    if qdd is not None:
        gc = get_generalized_cache(model.structure)
        for g in gc.groups:
            M = group_mass_matrix(model, state.body_q, g, v_o, w_o)
            tg = jnp.einsum("nde,ne->nd", M, qdd[g.dof_idx])
            tau = tau.at[g.dof_idx.reshape(-1)].add(tg.reshape(-1))
    return tau
