# On-disk cache for baked SDFs (dense grids and sparse quantized textures).
#
# Equivalent of the reference's _sdf_cache.py: baking is the most
# expensive part of finalize for mesh-heavy scenes (O(grid_points *
# triangles) host work), and meshes recur across runs — so bakes are
# memoized under ~/.cache/newton_tpu/sdf keyed by a content hash of the
# mesh geometry and every bake parameter. Safe across processes: writes
# go to a temp file and rename into place.

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Optional

import numpy as np

_ENV_DISABLE = "NEWTON_TPU_DISABLE_SDF_CACHE"
_VERSION = 1


def cache_dir() -> str:
    root = os.environ.get("NEWTON_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "newton_tpu", "sdf")
    return root


def _enabled() -> bool:
    return os.environ.get(_ENV_DISABLE, "0") not in ("1", "true")


def mesh_bake_key(vertices: np.ndarray, indices: np.ndarray,
                  **params) -> str:
    h = hashlib.sha1()
    h.update(b"newton_tpu_sdf_v%d" % _VERSION)
    v = np.ascontiguousarray(np.asarray(vertices, dtype=np.float64))
    f = np.ascontiguousarray(np.asarray(indices, dtype=np.int64))
    h.update(v.tobytes())
    h.update(f.tobytes())
    for k in sorted(params):
        h.update(f"{k}={params[k]!r}".encode())
    return h.hexdigest()


def load(key: str) -> Optional[dict]:
    if not _enabled():
        return None
    path = os.path.join(cache_dir(), key + ".npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        return None


def store(key: str, arrays: dict) -> None:
    if not _enabled():
        return
    d = cache_dir()
    try:
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
        os.close(fd)
        np.savez_compressed(tmp, **arrays)      # .npz suffix: no rename
        os.replace(tmp, os.path.join(d, key + ".npz"))
    except Exception:
        pass


def cached_bake_mesh_sdf(mesh, resolution: int, margin: float = 0.1):
    """bake_mesh_sdf with disk memoization."""
    from .sdf import bake_mesh_sdf
    from .types import SDF
    key = mesh_bake_key(mesh.vertices, mesh.indices, kind="dense",
                        resolution=int(resolution), margin=float(margin))
    hit = load(key)
    if hit is not None:
        return SDF(data=hit["data"], lower=hit["lower"], upper=hit["upper"])
    sdf = bake_mesh_sdf(mesh, resolution=resolution, margin=margin)
    store(key, {"data": sdf.data, "lower": sdf.lower, "upper": sdf.upper})
    return sdf


def cached_bake_texture_sdf(mesh, resolution: int, margin: float = 0.1,
                            band_cells: float = 3.0):
    """bake_texture_sdf with disk memoization."""
    from .sdf_texture import TextureSDF, bake_texture_sdf
    key = mesh_bake_key(mesh.vertices, mesh.indices, kind="texture",
                        resolution=int(resolution), margin=float(margin),
                        band_cells=float(band_cells))
    hit = load(key)
    if hit is not None:
        return TextureSDF(block_index=hit["block_index"],
                          blocks=hit["blocks"],
                          block_scale=hit["block_scale"],
                          block_offset=hit["block_offset"],
                          coarse=hit["coarse"],
                          lower=hit["lower"], upper=hit["upper"])
    tex = bake_texture_sdf(mesh, resolution=resolution, margin=margin,
                           band_cells=band_cells)
    store(key, {"block_index": tex.block_index, "blocks": tex.blocks,
                "block_scale": tex.block_scale,
                "block_offset": tex.block_offset, "coarse": tex.coarse,
                "lower": tex.lower, "upper": tex.upper})
    return tex
