"""Point-cloud surface reconstruction / remeshing.

TPU-native equivalent of reference newton/_src/geometry/remesh.py:262,876,
1350 (VoxelHashGrid, PointCloudExtractor, SurfaceReconstructor). Host-side
utility (build/visualization-time): points are splatted into a dense
distance field over their AABB (the voxel-hash stage of the reference
collapses to vectorized window scatter), then the r-offset surface is
extracted with marching tetrahedra.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .sdf_mc import marching_tets

__all__ = ["reconstruct_surface", "point_distance_field"]


def point_distance_field(points: np.ndarray, radius: float,
                         resolution: int = 48,
                         pad: float = None) -> Tuple[np.ndarray, np.ndarray,
                                                     np.ndarray]:
    """Dense field d(x) = min_i |x - p_i| - radius over the padded AABB.

    Returns (grid (n, n, n), lower, upper). Cells farther than the splat
    window from every point keep a large positive value.
    """
    pts = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    if len(pts) == 0:
        raise ValueError("no points")
    pad = 2.5 * radius if pad is None else pad
    lower = pts.min(0) - pad
    upper = pts.max(0) + pad
    n = int(resolution)
    spacing = ((upper - lower) / (n - 1)).astype(np.float32)
    grid = np.full((n, n, n), 1e9, dtype=np.float32)

    # splat: each point lowers the distance inside a local window around the
    # iso surface (radius + 2 cells of margin for interpolation); squared
    # distances throughout, one sqrt on the per-cell minima at the end
    w = int(np.ceil(radius / spacing.min())) + 2
    off = np.arange(-w, w + 1)
    OX, OY, OZ = np.meshgrid(off, off, off, indexing="ij")
    offsets = np.stack([OX, OY, OZ], axis=-1).reshape(-1, 3).astype(np.int32)
    base = np.floor((pts - lower) / spacing).astype(np.int32)     # (P, 3)
    for chunk in range(0, len(pts), 2048):
        p = pts[chunk:chunk + 2048]
        b = base[chunk:chunk + 2048]
        cells = b[:, None, :] + offsets[None, :, :]               # (p, W, 3)
        ok = ((cells >= 0) & (cells < n)).all(axis=-1)
        delta = (lower[None, None] + cells * spacing[None, None]
                 - p[:, None, :]).astype(np.float32)
        d2 = np.einsum("pwc,pwc->pw", delta, delta)
        flat = (cells[..., 0].astype(np.int64) * n
                + cells[..., 1]) * n + cells[..., 2]
        flat = np.where(ok, flat, 0).reshape(-1)
        d2 = np.where(ok, d2, 1e18).reshape(-1)
        # scatter-min via sort + reduceat (np.minimum.at is ~50x slower)
        order = np.argsort(flat, kind="stable")
        fs = flat[order]
        ds = d2[order]
        starts = np.flatnonzero(np.r_[True, fs[1:] != fs[:-1]])
        mins = np.minimum.reduceat(ds, starts)
        idx = fs[starts]
        g = grid.reshape(-1)
        g[idx] = np.minimum(g[idx], mins)
    finite = grid < 1e17
    grid = np.where(finite, np.sqrt(np.minimum(grid, 1e17)), 1e9)
    return grid - radius, lower, upper


def reconstruct_surface(points: np.ndarray, radius: float,
                        resolution: int = 48):
    """Watertight r-offset surface around a point cloud
    (reference: remesh.py:1350 SurfaceReconstructor). Returns a Mesh."""
    from .types import Mesh
    grid, lower, upper = point_distance_field(points, radius, resolution)
    v, f = marching_tets(grid, lower, upper, iso=0.0)
    return Mesh(v, f.reshape(-1), is_solid=True)
