"""Geometry source types: GeoType enum, Mesh, SDF, Heightfield, TetMesh.

TPU-native re-design of reference newton/_src/geometry/types.py:70-2400.
Geometry *sources* (meshes, heightfields, SDF volumes) are host-side objects
holding numpy data; at ``ModelBuilder.finalize()`` they are packed into
device-resident pooled arrays on the Model (fixed shapes, index + offset
addressing) so that jitted collision kernels can consume them.
"""

from __future__ import annotations

from enum import IntEnum
from typing import Optional

import numpy as np

__all__ = ["GeoType", "Mesh", "SDF", "Heightfield", "TetMesh", "Gaussian"]


class GeoType(IntEnum):
    """Shape geometry types (reference: geometry/types.py:70)."""

    PLANE = 0
    SPHERE = 1
    BOX = 2
    CAPSULE = 3
    CYLINDER = 4
    CONE = 5
    MESH = 6
    SDF = 7
    CONVEX = 8
    HFIELD = 9
    ELLIPSOID = 10
    GAUSSIAN = 11
    NONE = 12


class Mesh:
    """Triangle mesh geometry source.

    Vertices/indices are numpy; mass properties computed on demand via the
    divergence theorem (reference: geometry/types.py:133, inertia.py).
    """

    def __init__(
        self,
        vertices: np.ndarray,
        indices: np.ndarray,
        compute_inertia: bool = True,
        is_solid: bool = True,
        maxhullvert: int = 64,
    ):
        self.vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
        self.indices = np.asarray(indices, dtype=np.int32).reshape(-1)
        self.is_solid = bool(is_solid)
        self.maxhullvert = int(maxhullvert)
        self.mass: float = 1.0
        self.com: np.ndarray = np.zeros(3)
        self.inertia: np.ndarray = np.eye(3)
        self.has_inertia = False
        if compute_inertia and len(self.indices) >= 3:
            from .inertia import compute_mesh_inertia

            try:
                m, com, I = compute_mesh_inertia(
                    1.0, self.vertices, self.indices, is_solid=self.is_solid
                )
                self.mass, self.com, self.inertia = m, com, I
                self.has_inertia = True
            except Exception:
                pass

    @property
    def num_vertices(self) -> int:
        return len(self.vertices)

    @property
    def num_triangles(self) -> int:
        return len(self.indices) // 3

    def copy(self) -> "Mesh":
        m = Mesh(self.vertices.copy(), self.indices.copy(), compute_inertia=False,
                 is_solid=self.is_solid, maxhullvert=self.maxhullvert)
        m.mass, m.com, m.inertia = self.mass, self.com.copy(), self.inertia.copy()
        m.has_inertia = self.has_inertia
        return m

    def compute_aabb(self):
        return self.vertices.min(axis=0), self.vertices.max(axis=0)


class SDF:
    """Signed distance field baked on a regular grid (host-side source).

    The reference bakes sparse quantized SDF textures (geometry/sdf_utils.py:177);
    here we bake a dense grid (numpy) that finalize() packs into a pooled
    device array for jitted trilinear sampling.
    """

    def __init__(
        self,
        data: Optional[np.ndarray] = None,
        lower: Optional[np.ndarray] = None,
        upper: Optional[np.ndarray] = None,
    ):
        self.data = None if data is None else np.asarray(data, dtype=np.float32)
        self.lower = np.zeros(3) if lower is None else np.asarray(lower, dtype=np.float64)
        self.upper = np.ones(3) if upper is None else np.asarray(upper, dtype=np.float64)

    @staticmethod
    def from_mesh(mesh: "Mesh", resolution: int = 64, margin: float = 0.05) -> "SDF":
        from .sdf import bake_mesh_sdf

        return bake_mesh_sdf(mesh, resolution=resolution, margin=margin)


class Heightfield:
    """Regular-grid heightfield (reference: geometry/types.py:2143)."""

    def __init__(self, heights: np.ndarray, size_x: float, size_y: float, base: float = 0.0):
        self.heights = np.asarray(heights, dtype=np.float32)
        if self.heights.ndim != 2:
            raise ValueError("heights must be 2D (nx, ny)")
        self.size_x = float(size_x)
        self.size_y = float(size_y)
        self.base = float(base)

    @property
    def nx(self) -> int:
        return self.heights.shape[0]

    @property
    def ny(self) -> int:
        return self.heights.shape[1]


class TetMesh:
    """Tetrahedral mesh source for soft bodies (reference: geometry/types.py:1627)."""

    def __init__(self, vertices: np.ndarray, tet_indices: np.ndarray,
                 tri_indices: Optional[np.ndarray] = None):
        self.vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
        self.tet_indices = np.asarray(tet_indices, dtype=np.int32).reshape(-1, 4)
        self.tri_indices = (
            None if tri_indices is None else np.asarray(tri_indices, dtype=np.int32).reshape(-1, 3)
        )


class Gaussian:
    """Gaussian-splat geometry source (reference: geometry/types.py:2334).

    Stored for viewer/sensor consumption; not a collision geometry.
    """

    def __init__(self, means: np.ndarray, scales: np.ndarray, quats: np.ndarray,
                 colors: Optional[np.ndarray] = None, opacities: Optional[np.ndarray] = None):
        self.means = np.asarray(means, dtype=np.float32).reshape(-1, 3)
        self.scales = np.asarray(scales, dtype=np.float32).reshape(-1, 3)
        self.quats = np.asarray(quats, dtype=np.float32).reshape(-1, 4)
        n = len(self.means)
        self.colors = (
            np.ones((n, 3), dtype=np.float32) if colors is None
            else np.asarray(colors, dtype=np.float32).reshape(-1, 3)
        )
        self.opacities = (
            np.ones((n,), dtype=np.float32) if opacities is None
            else np.asarray(opacities, dtype=np.float32).reshape(-1)
        )
