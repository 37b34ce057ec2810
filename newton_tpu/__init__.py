"""newton_tpu — a TPU-native differentiable physics engine for robotics.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
newton-physics/newton (reference mounted at /root/reference): ModelBuilder
authoring, multi-world batched simulation, rigid/cloth/soft solvers, sensors,
importers and an RL selection API — built TPU-first (static shapes, vmap over
worlds, `jax.sharding` scale-out, pure-function solver steps).
"""

__version__ = "0.1.0"

# Physics needs true float32 matmuls: TPU's default bf16 matmul precision
# corrupts mass matrices / contact Delassus operators enough to blow up the
# solvers (NaNs). Opt out with jax.default_matmul_precision(...) if desired.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "float32")

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
from . import actuators, controllers, geometry, ik, parallel, sensors  # noqa: E402
from . import solvers, utils, viewer  # noqa: E402
from .sim.articulation import eval_fk, eval_ik  # noqa: E402
from .sim.collide import CollisionPipeline, match_contacts  # noqa: E402
from .sim.dynamics_api import (  # noqa: E402
    eval_inverse_dynamics,
    eval_jacobian,
    eval_mass_matrix,
)
from .utils.selection import ArticulationView  # noqa: E402

__all__ = [
    "MAXVAL", "Axis", "AxisType", "axis_to_vec3",
    "SDF", "Gaussian", "GeoType", "Heightfield", "Mesh", "ParticleFlags",
    "ShapeFlags", "TetMesh",
    "AttributeAssignment", "AttributeFrequency", "AttributeSpec", "BodyFlags",
    "Contacts", "Control", "EqType", "JointDofConfig", "JointTargetMode",
    "JointType", "Model", "ModelBuilder", "ModelFlags", "ModelStructure",
    "ShapeConfig", "State", "StateFlags", "math",
    "ArticulationView", "CollisionPipeline", "actuators", "controllers",
    "eval_fk", "eval_ik", "eval_inverse_dynamics", "eval_jacobian",
    "eval_mass_matrix", "geometry", "ik", "parallel", "sensors", "solvers",
    "utils", "viewer",
]
