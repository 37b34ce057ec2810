from .solver import SolverBase, integrate_bodies, integrate_particles
from .solver_xpbd import SolverXPBD

__all__ = ["SolverBase", "SolverXPBD", "integrate_bodies",
           "integrate_particles"]
