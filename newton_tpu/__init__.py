"""newton_tpu — a TPU-native differentiable physics engine for robotics.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
newton-physics/newton (reference mounted at /root/reference): ModelBuilder
authoring, multi-world batched simulation, rigid/cloth/soft solvers, sensors,
importers and an RL selection API — built TPU-first (static shapes, vmap over
worlds, `jax.sharding` scale-out, pure-function solver steps).
"""

__version__ = "0.1.0"

from .core.types import MAXVAL, Axis, AxisType, axis_to_vec3
from .geometry import (
    SDF,
    Gaussian,
    GeoType,
    Heightfield,
    Mesh,
    ParticleFlags,
    ShapeFlags,
    TetMesh,
)
from .sim import (
    AttributeAssignment,
    AttributeFrequency,
    AttributeSpec,
    BodyFlags,
    Contacts,
    Control,
    EqType,
    JointDofConfig,
    JointTargetMode,
    JointType,
    Model,
    ModelBuilder,
    ModelFlags,
    ModelStructure,
    ShapeConfig,
    State,
    StateFlags,
)

from . import math  # noqa: E402

__all__ = [
    "MAXVAL", "Axis", "AxisType", "axis_to_vec3",
    "SDF", "Gaussian", "GeoType", "Heightfield", "Mesh", "ParticleFlags",
    "ShapeFlags", "TetMesh",
    "AttributeAssignment", "AttributeFrequency", "AttributeSpec", "BodyFlags",
    "Contacts", "Control", "EqType", "JointDofConfig", "JointTargetMode",
    "JointType", "Model", "ModelBuilder", "ModelFlags", "ModelStructure",
    "ShapeConfig", "State", "StateFlags", "math",
]
