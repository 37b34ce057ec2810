"""Actuator pipeline: delay -> controller -> clamping -> joint_f.

TPU-native re-design of reference newton/_src/actuators/actuator.py:33 and
delay.py:115. The reference mutates control.joint_f via scatter-add kernels
with a per-env circular delay buffer; here the actuator is a pure function
with an explicit carry (delay ring as a pytree), so it composes with
jit/scan and RL rollouts.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..sim.control import Control
from ..sim.model import Model
from ..sim.state import State

__all__ = ["Actuator", "Delay"]


class DelayState(NamedTuple):
    buffer: jnp.ndarray   # (steps, n)
    head: jnp.ndarray     # () int32


class Delay:
    """Fixed-step transport delay over actuator commands
    (reference: actuators/delay.py:115)."""

    def __init__(self, steps: int, n: int, dtype=jnp.float32):
        self.steps = int(steps)
        self.n = int(n)
        self.dtype = dtype

    def init(self) -> DelayState:
        return DelayState(jnp.zeros((max(self.steps, 1), self.n),
                                    dtype=self.dtype),
                          jnp.zeros((), dtype=jnp.int32))

    def __call__(self, ds: DelayState, u: jnp.ndarray):
        if self.steps == 0:
            return ds, u
        buf = ds.buffer.at[ds.head % self.steps].set(u)
        out = buf[(ds.head + 1) % self.steps]
        return DelayState(buf, ds.head + 1), out


class Actuator:
    """Composable actuator: delay -> controller -> clamp -> joint_f
    (reference: actuator.py:33).

    Args:
        model: finalized model.
        dof_indices: generalized dof indices this actuator drives.
        controller: callable (model, state, command, dof_indices) -> effort,
            e.g. a PD from :mod:`newton_tpu.controllers`.
        clamping: callable (model, state, effort, dof_indices) -> effort.
        delay_steps: transport delay in control steps.
    """

    def __init__(self, model: Model, dof_indices,
                 controller: Callable, clamping: Optional[Callable] = None,
                 delay_steps: int = 0):
        self.model = model
        self.dof_indices = np.asarray(dof_indices, dtype=np.int32)
        self.controller = controller
        self.clamping = clamping
        self.delay = Delay(delay_steps, len(self.dof_indices))

    def init_carry(self):
        return self.delay.init()

    def __call__(self, carry, state: State, control: Control,
                 command: jnp.ndarray) -> Tuple[Any, Control]:
        carry, cmd = self.delay(carry, jnp.asarray(command))
        effort = self.controller(self.model, state, cmd, self.dof_indices)
        if self.clamping is not None:
            effort = self.clamping(self.model, state, effort, self.dof_indices)
        joint_f = control.joint_f.at[self.dof_indices].add(effort)
        return carry, control.replace(joint_f=joint_f)
