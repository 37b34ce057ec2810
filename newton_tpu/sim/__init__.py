from .builder import JointDofConfig, ModelBuilder, ShapeConfig
from .contacts import Contacts
from .control import Control
from .enums import (
    BodyFlags,
    EqType,
    JointTargetMode,
    JointType,
    ModelFlags,
    StateFlags,
)
from .model import (
    AttributeAssignment,
    AttributeFrequency,
    AttributeSpec,
    Model,
    ModelStructure,
)
from .state import State

__all__ = [
    "AttributeAssignment", "AttributeFrequency", "AttributeSpec",
    "BodyFlags", "Contacts", "Control", "EqType", "JointDofConfig",
    "JointTargetMode", "JointType", "Model", "ModelBuilder", "ModelFlags",
    "ModelStructure", "ShapeConfig", "State", "StateFlags",
]
