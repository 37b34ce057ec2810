"""Solver base class and shared integration kernels.

TPU-native re-design of reference newton/_src/solvers/solver.py:188-449.
The contract is preserved — ``step(state_in, state_out, control, contacts,
dt)`` — but steps are **pure functions** returning the new State (the
``state_out`` argument is accepted for signature parity and ignored), so a
whole substep loop jits/vmaps/grads cleanly. The reference's CUDA-graph
machinery, module-option revision tracking and DeterministicMode all dissolve:
jit is the graph capture, and XLA reductions are deterministic by
construction.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..math import quat_mul, quat_normalize, quat_rotate
from ..sim.contacts import Contacts
from ..sim.control import Control
from ..sim.model import Model
from ..sim.state import State

__all__ = ["SolverBase", "integrate_bodies", "integrate_particles"]


def integrate_bodies(model: Model, state: State, dt: float,
                     angular_damping: float = 0.05):
    """Semi-implicit Euler for rigid bodies (reference: solver.py:109-169).

    Returns (body_q, body_qd). Gravity is per-world; body_f is a world-frame
    wrench [f, tau] at the COM. Gyroscopic torque integrated in body frame.
    """
    if model.body_count == 0:
        return state.body_q, state.body_qd
    st = model.structure
    w_idx = np.maximum(st.body_world, 0)
    g = model.gravity[w_idx]                                  # (B, 3)

    q = state.body_q[:, 3:7]
    x_com = state.body_q[:, 0:3] + quat_rotate(q, model.body_com)
    v = state.body_qd[:, 0:3]
    w = state.body_qd[:, 3:6]
    f = state.body_f[:, 0:3]
    t = state.body_f[:, 3:6]

    inv_m = model.body_inv_mass[:, None]
    dynamic = (inv_m > 0.0)
    v_new = v + (g * dynamic + f * inv_m) * dt

    # angular update in body frame with gyroscopic term
    wb = quat_rotate(jnp.concatenate([-q[:, :3], q[:, 3:]], axis=-1), w)
    tb = quat_rotate(jnp.concatenate([-q[:, :3], q[:, 3:]], axis=-1), t)
    gyr = -jnp.cross(wb, jnp.einsum("bij,bj->bi", model.body_inertia, wb))
    wb_new = wb + dt * jnp.einsum("bij,bj->bi", model.body_inv_inertia, tb + gyr)
    w_new = quat_rotate(q, wb_new)
    w_new = w_new * (1.0 / (1.0 + dt * angular_damping))
    v_new = jnp.where(dynamic, v_new, v)
    w_new = jnp.where(dynamic, w_new, w)

    x_com_new = x_com + v_new * dt
    dq = quat_mul(jnp.concatenate([w_new, jnp.zeros_like(w_new[:, :1])], axis=-1), q)
    q_new = quat_normalize(q + 0.5 * dt * dq)
    x_new = x_com_new - quat_rotate(q_new, model.body_com)

    body_q = jnp.concatenate([x_new, q_new], axis=-1)
    body_qd = jnp.concatenate([v_new, w_new], axis=-1)
    return body_q, body_qd


def integrate_particles(model: Model, state: State, dt: float):
    """Semi-implicit Euler for particles (reference: solver.py:21-107)."""
    if model.particle_count == 0:
        return state.particle_q, state.particle_qd
    st = model.structure
    w_idx = np.maximum(st.particle_world, 0)
    g = model.gravity[w_idx]
    inv_m = model.particle_inv_mass[:, None]
    active = (inv_m > 0.0)
    v_new = state.particle_qd + (g * active + state.particle_f * inv_m) * dt
    vmax = model.particle_max_velocity
    vn = jnp.linalg.norm(v_new, axis=-1, keepdims=True)
    v_new = jnp.where(vn > vmax, v_new * (vmax / jnp.maximum(vn, 1e-9)), v_new)
    x_new = state.particle_q + v_new * dt
    x_new = jnp.where(active, x_new, state.particle_q)
    v_new = jnp.where(active, v_new, state.particle_qd)
    return x_new, v_new


class SolverBase:
    """Common solver interface (reference: solvers/solver.py:188).

    Subclasses implement :meth:`step`. All solvers are pure: they never
    mutate inputs and return the post-step State.
    """

    def __init__(self, model: Model):
        self.model = model

    @property
    def device(self):
        return self.model.device

    def step(self, state_in: State, state_out: Optional[State], control:
             Optional[Control], contacts: Optional[Contacts], dt: float) -> State:
        raise NotImplementedError

    def reset(self, state: State, world_mask=None) -> State:
        """Reset masked worlds to the model's initial conditions
        (reference: solver.py:342). ``world_mask``: (world_count,) bool or
        None for all worlds."""
        model = self.model
        st = model.structure
        if world_mask is None:
            return model.state()
        world_mask = jnp.asarray(world_mask, dtype=bool)

        def sel(worlds, new, old):
            m = world_mask[np.maximum(worlds, 0)] | jnp.asarray(worlds < 0)
            return jnp.where(m.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)

        init = model.state()
        out = state.replace(
            body_q=sel(st.body_world, init.body_q, state.body_q),
            body_qd=sel(st.body_world, init.body_qd, state.body_qd),
            body_f=sel(st.body_world, init.body_f, state.body_f),
            particle_q=sel(st.particle_world, init.particle_q, state.particle_q),
            particle_qd=sel(st.particle_world, init.particle_qd, state.particle_qd),
            particle_f=sel(st.particle_world, init.particle_f, state.particle_f),
        )
        if st.joint_count:
            jq_world = np.repeat(st.joint_world,
                                 np.diff(st.joint_q_start))
            jd_world = np.repeat(st.joint_world,
                                 np.diff(st.joint_qd_start))
            out = out.replace(
                joint_q=sel(jq_world, init.joint_q, state.joint_q),
                joint_qd=sel(jd_world, init.joint_qd, state.joint_qd),
            )
        return out

    def notify_model_changed(self, flags: int = 0):
        """No-op: model arrays are pytree leaves; passing an updated Model to
        a jitted step picks the values up without recompilation
        (reference: solver.py:392 needs this because Warp kernels capture
        array pointers)."""

    def update_contacts(self, contacts: Contacts, state_in: State,
                        state_out: State, dt: float) -> Contacts:
        """Fill per-contact force report (reference: solver.py:429). Default:
        unchanged; solvers that compute contact impulses override."""
        return contacts

    @staticmethod
    def register_custom_attributes(builder) -> None:
        """Solver-specific ModelBuilder extension hook (reference: solver.py:440)."""
