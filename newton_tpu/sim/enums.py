"""Simulation enums (reference: newton/_src/sim/enums.py:8-346)."""

from __future__ import annotations

from enum import IntEnum, IntFlag

__all__ = ["ModelFlags", "StateFlags", "BodyFlags", "JointType", "EqType",
           "JointTargetMode"]


class ModelFlags(IntFlag):
    """Model-level feature flags (reference: enums.py:8)."""

    NONE = 0
    HAS_SOFT_CONTACTS = 1 << 0
    HAS_RIGID_CONTACTS = 1 << 1
    HAS_PARTICLES = 1 << 2


class StateFlags(IntFlag):
    """Opt-in extended State attributes (reference: enums.py:57)."""

    NONE = 0
    BODY_QDD = 1 << 0
    BODY_PARENT_F = 1 << 1


class BodyFlags(IntFlag):
    """Per-body flags (reference: enums.py:119)."""

    NONE = 0
    KINEMATIC = 1 << 0


class JointType(IntEnum):
    """Joint types (reference: enums.py:150-210)."""

    PRISMATIC = 0
    REVOLUTE = 1
    BALL = 2
    FIXED = 3
    FREE = 4
    DISTANCE = 5
    D6 = 6
    CABLE = 7

    def dof_count(self, num_axes: int) -> tuple:
        """(dof_count, coord_count) for this joint type (reference: enums.py:179)."""
        dof, coord = num_axes, num_axes
        if self == JointType.BALL:
            dof, coord = 3, 4
        elif self in (JointType.FREE, JointType.DISTANCE):
            dof, coord = 6, 7
        elif self == JointType.FIXED:
            dof, coord = 0, 0
        elif self == JointType.CABLE:
            # split stretch/shear/bend/twist constraint slots, no joint_q
            # coordinates: cable body transforms are integrated directly by
            # the maximal-coordinate solvers (reference: builder.py:5166
            # add_joint_cable note)
            dof, coord = num_axes, 0
        return dof, coord

    def constraint_count(self, num_axes: int) -> int:
        """Bilateral velocity-constraint rows (reference: enums.py:211)."""
        cts = 6 - num_axes
        if self == JointType.BALL:
            cts = 3
        elif self in (JointType.FREE, JointType.DISTANCE):
            cts = 0
        elif self == JointType.FIXED:
            cts = 6
        return cts


class EqType(IntEnum):
    """Equality constraint types (reference: enums.py:258)."""

    CONNECT = 0
    WELD = 1
    JOINT = 2


class JointTargetMode(IntEnum):
    """Actuator target mode per joint dof (reference: enums.py:270)."""

    NONE = 0
    TARGET_POSITION = 1
    TARGET_VELOCITY = 2
