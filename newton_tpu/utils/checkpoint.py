"""State checkpoint / resume.

The reference has no training checkpoints; its equivalents are State.assign
deep-copies and ViewerFile recordings (SURVEY.md §5). Here State/Control/
Contacts are pytrees, so checkpointing is a straight orbax (or npz fallback)
save/restore — usable for long-running RL farms and exact-resume tests.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

__all__ = ["save_state", "load_state", "state_digest"]


def save_state(path: str, state: Any):
    """Save a pytree of arrays (State/Control/...) to .npz or an orbax dir."""
    import jax
    leaves, treedef = jax.tree.flatten(state)
    if path.endswith(".npz"):
        np.savez(path, *[np.asarray(l) for l in leaves])
        with open(path + ".tree", "w") as f:
            f.write(str(treedef))
        return
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
    except ImportError:
        np.savez(path + ".npz", *[np.asarray(l) for l in leaves])


def load_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`; ``like`` supplies the
    tree structure (e.g. ``model.state()``)."""
    import jax
    import jax.numpy as jnp
    leaves, treedef = jax.tree.flatten(like)
    if path.endswith(".npz") or os.path.exists(path + ".npz"):
        p = path if path.endswith(".npz") else path + ".npz"
        data = np.load(p)
        new_leaves = [jnp.asarray(data[k]) for k in data.files]
        return jax.tree.unflatten(treedef, new_leaves)
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=like)


def state_digest(state: Any) -> str:
    """Deterministic content hash of a state pytree (bit-exact repeat-run
    checks — the reference's determinism tests compare snapshots,
    tests/determinism/test_solver_determinism.py:22)."""
    import hashlib
    import jax
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(state):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()
