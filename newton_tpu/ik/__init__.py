from .ik_solver import (
    IKObjectiveJointLimit,
    IKObjectivePosition,
    IKObjectiveRotation,
    IKSampling,
    IKSolver,
)

__all__ = ["IKObjectiveJointLimit", "IKObjectivePosition",
           "IKObjectiveRotation", "IKSampling", "IKSolver"]
