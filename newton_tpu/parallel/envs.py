"""Environment batching & device-mesh sharding: the TPU scale-out axis.

The reference batches environments as flat multi-world arrays inside one
Model (SURVEY.md §1); that layout survives here for API parity, but the
*performance* path is this module: define physics on a ONE-world model and
``vmap`` the whole step over a leading env axis (profiled 2x faster than the
flat layout at 4096 envs, with ~3x faster compiles — XLA batches the small
per-world gathers far better than it handles world-sized index tensors).

Scaling beyond one chip is one line: shard the env axis of the batched
State across a ``jax.sharding.Mesh`` — worlds are independent, so the step
runs with zero cross-device collectives (SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..sim.model import Model
from ..sim.state import State

__all__ = ["batch_state", "unbatch_env", "vmap_step", "shard_batched_state"]


def batch_state(state: State, n_envs: int) -> State:
    """Tile a single-world State into an (n_envs, ...) batched State."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_envs, *x.shape)).copy()
        if hasattr(x, "shape") else x, state)


def unbatch_env(state: State, env: int) -> State:
    """Extract one environment's State from a batched State."""
    return jax.tree.map(lambda x: x[env], state)


def vmap_step(step_fn: Callable[[State], State]) -> Callable[[State], State]:
    """Vectorize a single-world step over the leading env axis."""
    return jax.vmap(step_fn)


def shard_batched_state(state: State, mesh=None,
                        axis_name: str = "env") -> State:
    """Place a batched State with its env axis sharded across a device mesh.

    With no mesh given, builds a 1-D mesh over all local devices. Model
    arrays stay replicated (they are small and read-only); only the State
    carries the env axis, so each device owns n_envs/n_devices whole worlds
    and the jitted step partitions with no collectives.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if mesh is None:
        devices = jax.devices()
        mesh = Mesh(devices, axis_names=(axis_name,))

    def shard(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(
                x, NamedSharding(mesh, P(axis_name,
                                         *([None] * (x.ndim - 1)))))
        return x

    return jax.tree.map(shard, state)
