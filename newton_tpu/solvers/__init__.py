from .generalized.solver import SolverFeatherstone, SolverMuJoCo
from .solver import SolverBase, integrate_bodies, integrate_particles
from .solver_semi_implicit import SolverSemiImplicit
from .solver_xpbd import SolverXPBD

__all__ = ["SolverBase", "SolverFeatherstone", "SolverMuJoCo",
           "SolverSemiImplicit", "SolverXPBD", "integrate_bodies",
           "integrate_particles"]
