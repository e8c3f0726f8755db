from . import dgrad, rotation
from .deform_solver import (DeformationSolver, DeformConsts, SolverSpec,
                            padded_chunk_map, solve_fn)
from .dgrad import (deformation_gradients, deformation_gradients_np,
                    deformation_matrices, dgrad_to_transforms_t)
from .rotation import so3_exp, so3_log

__all__ = [
    "dgrad",
    "rotation",
    "DeformationSolver",
    "DeformConsts",
    "SolverSpec",
    "solve_fn",
    "padded_chunk_map",
    "deformation_gradients",
    "deformation_gradients_np",
    "deformation_matrices",
    "dgrad_to_transforms_t",
    "so3_exp",
    "so3_log",
]
