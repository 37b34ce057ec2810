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

from .broad_phase import (
    BroadPhaseAllPairs,
    BroadPhaseExplicit,
    BroadPhaseSAP,
    compute_shape_aabbs,
)
from .hashgrid import HashGrid, neighbor_pairs
from .raycast import raycast_model
from .remesh import point_distance_field, reconstruct_surface
from .sdf_mc import marching_tets, sdf_to_mesh
from .terrain import generate_fractal_terrain, generate_stairs, heightfield_to_mesh

__all__ += [
    "BroadPhaseAllPairs", "BroadPhaseExplicit", "BroadPhaseSAP", "HashGrid",
    "compute_shape_aabbs", "generate_fractal_terrain", "generate_stairs",
    "heightfield_to_mesh", "marching_tets", "neighbor_pairs",
    "point_distance_field", "raycast_model", "reconstruct_surface",
    "sdf_to_mesh",
]
