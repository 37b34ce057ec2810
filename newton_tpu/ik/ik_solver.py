"""Batched inverse kinematics: Levenberg-Marquardt over (problems x seeds).

TPU-native re-design of reference newton/_src/sim/ik (4283 LoC):
ik_solver.py:196 IKSolver (multi-seed sampling :22-35),
ik_lm_optimizer.py:121, objectives position/rotation/joint-limit
(ik_objectives.py:257,875,575). The reference builds analytic or wp.Tape
Jacobians per problem; here the residual is a pure function of q and the
Jacobian is ``jax.jacfwd`` through vectorized FK — one vmap over
(n_problems * n_seeds) gives the whole batch, and the LM loop is a
lax.scan with per-problem adaptive damping.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math import (
    quat_conjugate,
    quat_mul,
    quat_to_axis_angle,
    transform_multiply,
    transform_point,
)
from ..sim.articulation import eval_fk
from ..sim.model import Model

__all__ = ["IKSolver", "IKSampling", "IKObjectivePosition",
           "IKObjectiveRotation", "IKObjectiveJointLimit"]


class IKSampling(enum.Enum):
    """Seed sampling strategies (reference: ik_solver.py:22-35)."""

    NONE = 0
    GAUSS = 1
    UNIFORM = 2
    ROBERTS = 3


@dataclass
class IKObjectivePosition:
    """End-effector position objective (reference: ik_objectives.py:257).

    link: body index; offset: point in the body frame; weight scales the
    3 residual rows. The target is supplied per problem at solve time.
    """

    link: int
    offset: Sequence[float] = (0.0, 0.0, 0.0)
    weight: float = 1.0
    n_residuals: int = 3

    def residual(self, model, body_q, target):
        p = transform_point(body_q[self.link],
                            jnp.asarray(self.offset, dtype=body_q.dtype))
        return self.weight * (p - target)


@dataclass
class IKObjectiveRotation:
    """End-effector orientation objective (reference: ik_objectives.py:875)."""

    link: int
    weight: float = 1.0
    n_residuals: int = 3

    def residual(self, model, body_q, target):
        q = body_q[self.link][3:7]
        dq = quat_mul(target, quat_conjugate(q))
        axis, ang = quat_to_axis_angle(dq)
        return self.weight * axis * ang


@dataclass
class IKObjectiveJointLimit:
    """Soft joint-limit residuals (reference: ik_objectives.py:575)."""

    weight: float = 0.1

    def residuals_for(self, model):
        return model.joint_coord_count


class IKSolver:
    """Multi-seed batched LM IK (reference: ik_solver.py:196).

    Args:
        model: finalized model (a single articulation or replicated batch;
            FK runs on the whole model).
        objectives: list of position/rotation objectives.
        joint_limit_weight: weight for soft limit residuals (0 disables).
        iterations, lambda_init: LM controls.
        n_seeds, sampling, seed_scale: initial-guess sampling.

    ``solve(q0, targets)``:
        q0: (Q,) initial coordinates; targets: list matching objectives,
        each (n_problems, 3) or (n_problems, 4). Returns (n_problems, Q)
        best coordinates (lowest residual over seeds).
    """

    def __init__(self, model: Model, objectives: List,
                 joint_limit_weight: float = 0.0, iterations: int = 16,
                 lambda_init: float = 1e-2, n_seeds: int = 1,
                 sampling: IKSampling = IKSampling.GAUSS,
                 seed_scale: float = 0.3, key=None,
                 method: str = "lm"):
        self.model = model
        self.objectives = objectives
        self.joint_limit_weight = float(joint_limit_weight)
        self.iterations = int(iterations)
        self.lambda_init = float(lambda_init)
        self.n_seeds = int(n_seeds)
        self.sampling = sampling
        self.seed_scale = float(seed_scale)
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.method = method  # "lm" | "bfgs" (reference: ik_lm_optimizer.py,
        # ik_lbfgs_optimizer.py)

    # ------------------------------------------------------------------
    def _residual(self, q, targets):
        model = self.model
        state = eval_fk(model, q, jnp.zeros(model.joint_dof_count,
                                            dtype=q.dtype), model.state())
        parts = [obj.residual(model, state.body_q, t)
                 for obj, t in zip(self.objectives, targets)]
        if self.joint_limit_weight > 0:
            # soft limits on 1-coord dofs only (ball/free quats unconstrained)
            from ..solvers.generalized.dynamics import get_generalized_cache
            gc = get_generalized_cache(model.structure)
            li, ld = gc.lin_coord_idx, gc.lin_coord_dof
            lo = model.joint_limit_lower[ld]
            hi = model.joint_limit_upper[ld]
            viol = (jnp.minimum(q[li] - lo, 0.0)
                    + jnp.maximum(q[li] - hi, 0.0))
            parts.append(self.joint_limit_weight * viol)
        return jnp.concatenate([p.reshape(-1) for p in parts])

    def _solve_single(self, q0, targets):
        def res(q):
            return self._residual(q, targets)

        def lm_step(carry, _):
            q, lam = carry
            r = res(q)
            J = jax.jacfwd(res)(q)
            JtJ = J.T @ J
            g = J.T @ r
            n = JtJ.shape[0]
            A = JtJ + lam * jnp.eye(n, dtype=q.dtype)
            dq = -jnp.linalg.solve(A, g)
            q_new = q + dq
            cost_new = jnp.sum(res(q_new) ** 2)
            cost_old = jnp.sum(r ** 2)
            improved = cost_new < cost_old
            q = jnp.where(improved, q_new, q)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-8, 1e6)
            return (q, lam), cost_new

        if self.method == "bfgs":
            from jax.scipy.optimize import minimize

            def cost(q):
                return jnp.sum(res(q) ** 2)

            out = minimize(cost, q0, method="BFGS",
                           options={"maxiter": self.iterations})
            return out.x, out.fun

        (q, _), _ = jax.lax.scan(
            lm_step, (q0, jnp.asarray(self.lambda_init, dtype=q0.dtype)),
            None, length=self.iterations)
        return q, jnp.sum(res(q) ** 2)

    def solve(self, q0, targets) -> jnp.ndarray:
        """Solve batched problems; see class docstring."""
        q0 = jnp.asarray(q0)
        targets = [jnp.asarray(t) for t in targets]
        single = targets[0].ndim == 1
        if single:
            targets = [t[None] for t in targets]
        # one cached jit per target batch shape (eager dispatch of the LM
        # loop is orders of magnitude slower)
        if not hasattr(self, "_solve_jit"):
            self._solve_jit = jax.jit(self._solve_batched)
        return self._solve_jit(q0, tuple(targets))[0] if single \
            else self._solve_jit(q0, tuple(targets))

    def _solve_batched(self, q0, targets):
        Q = q0.shape[-1]

        # seeds
        if self.n_seeds > 1:
            if self.sampling == IKSampling.GAUSS:
                noise = self.seed_scale * jax.random.normal(
                    self.key, (self.n_seeds - 1, Q), dtype=q0.dtype)
            elif self.sampling == IKSampling.UNIFORM:
                noise = self.seed_scale * jax.random.uniform(
                    self.key, (self.n_seeds - 1, Q), minval=-1.0, maxval=1.0,
                    dtype=q0.dtype)
            else:  # ROBERTS quasi-random
                g = 1.6180339887498949
                alphas = (1.0 / g) ** jnp.arange(1, Q + 1, dtype=q0.dtype)
                idx = jnp.arange(1, self.n_seeds, dtype=q0.dtype)[:, None]
                noise = self.seed_scale * (jnp.mod(idx * alphas, 1.0) - 0.5) * 2
            seeds = jnp.concatenate([q0[None], q0[None] + noise], axis=0)
        else:
            seeds = q0[None]

        def solve_problem(target_row):
            tgt = list(target_row)

            def per_seed(qs):
                return self._solve_single(qs, tgt)

            qs, costs = jax.vmap(per_seed)(seeds)
            best = jnp.argmin(costs)
            return qs[best]

        return jax.vmap(solve_problem)(tuple(targets))
