from .flags import ParticleFlags, ShapeFlags
from .inertia import (
    compute_box_inertia,
    compute_capsule_inertia,
    compute_cone_inertia,
    compute_cylinder_inertia,
    compute_ellipsoid_inertia,
    compute_mesh_inertia,
    compute_sphere_inertia,
    transform_inertia,
)
from .types import SDF, Gaussian, GeoType, Heightfield, Mesh, TetMesh

__all__ = [
    "SDF",
    "Gaussian",
    "GeoType",
    "Heightfield",
    "Mesh",
    "ParticleFlags",
    "ShapeFlags",
    "TetMesh",
    "compute_box_inertia",
    "compute_capsule_inertia",
    "compute_cone_inertia",
    "compute_cylinder_inertia",
    "compute_ellipsoid_inertia",
    "compute_mesh_inertia",
    "compute_sphere_inertia",
    "transform_inertia",
]
