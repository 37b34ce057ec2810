from .import_mjcf import parse_mjcf
from .import_urdf import parse_urdf

__all__ = ["parse_mjcf", "parse_urdf"]
