"""Fixed-radius particle neighborhoods via sorted spatial hashing.

TPU-native replacement for the reference's wp.HashGrid particle queries
(reference: XPBD particle contacts, solver_xpbd.py:404 hash-grid rebuild;
geometry/hashtable.py). GPU hash grids use atomics and dynamic cell lists;
here neighborhoods are computed with **static shapes**: hash cells -> one
``lax.sort`` by cell id -> per-particle gather of a fixed budget of
candidates from the 27 neighboring cells via ``searchsorted``. Everything
is jit/vmap-safe and deterministic.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HashGrid", "neighbor_pairs"]

_P1, _P2, _P3 = 73856093, 19349663, 83492791


class HashGrid:
    """Stateless neighbor finder with a fixed candidate budget.

    Args:
        cell_size: grid spacing (>= query radius).
        table_size: hash modulus (power of two recommended; collisions only
            add false-positive candidates, never drop true neighbors within
            budget).
        max_per_cell: candidate budget gathered per neighboring cell.
    """

    def __init__(self, cell_size: float, table_size: int = 1 << 16,
                 max_per_cell: int = 4):
        self.cell_size = float(cell_size)
        self.table_size = int(table_size)
        self.max_per_cell = int(max_per_cell)
        offs = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                         for k in (-1, 0, 1)], dtype=np.int32)
        self._offsets = offs

    def _hash(self, cell: jnp.ndarray) -> jnp.ndarray:
        h = (cell[..., 0] * _P1) ^ (cell[..., 1] * _P2) ^ (cell[..., 2] * _P3)
        return jnp.abs(h) % self.table_size

    def build(self, x: jnp.ndarray):
        """Sort particles by cell hash. Returns (sorted hash, perm)."""
        cell = jnp.floor(x / self.cell_size).astype(jnp.int32)
        h = self._hash(cell)
        order = jnp.argsort(h)
        return h[order], order

    def query(self, x: jnp.ndarray, radius: float
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Neighbors within ``radius`` of each particle.

        Returns (idx (N, 27*max_per_cell) int32, mask same shape). Self
        pairs and out-of-radius candidates are masked off.
        """
        N = x.shape[0]
        K = self.max_per_cell
        h_sorted, perm = self.build(x)
        cell = jnp.floor(x / self.cell_size).astype(jnp.int32)

        # neighbor cell hashes: (N, 27)
        ncells = cell[:, None, :] + jnp.asarray(self._offsets)[None, :, :]
        nh = self._hash(ncells)
        start = jnp.searchsorted(h_sorted, nh)              # (N, 27)
        k = jnp.arange(K)
        slots = jnp.minimum(start[..., None] + k, N - 1)    # (N, 27, K)
        cand = perm[slots]
        valid = h_sorted[slots] == nh[..., None]
        cand = cand.reshape(N, 27 * K)
        valid = valid.reshape(N, 27 * K)

        d = x[cand] - x[:, None, :]
        dist2 = jnp.sum(d * d, axis=-1)
        mask = valid & (dist2 < radius * radius) & (cand != jnp.arange(N)[:, None])
        return cand.astype(jnp.int32), mask


def neighbor_pairs(x: jnp.ndarray, radius: float, cell_size: float = None,
                   max_per_cell: int = 4):
    """One-shot fixed-radius neighborhood query (see HashGrid.query)."""
    grid = HashGrid(cell_size or radius, max_per_cell=max_per_cell)
    return grid.query(x, radius)
