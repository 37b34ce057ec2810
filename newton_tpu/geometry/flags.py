"""Particle and shape bit flags (reference: newton/_src/geometry/flags.py:8,27)."""

from __future__ import annotations

from enum import IntFlag

__all__ = ["ParticleFlags", "ShapeFlags"]


class ParticleFlags(IntFlag):
    ACTIVE = 1 << 0


class ShapeFlags(IntFlag):
    VISIBLE = 1 << 0
    COLLIDE_SHAPES = 1 << 1
    COLLIDE_PARTICLES = 1 << 2
    SITE = 1 << 3
