from .actuator import Actuator, Delay
from .clamping import ClampDCMotor, ClampMaxEffort, ClampPositionBased

__all__ = ["Actuator", "ClampDCMotor", "ClampMaxEffort",
           "ClampPositionBased", "Delay"]
