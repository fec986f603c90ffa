from .operators import (ShapeOperators, gradients_to_gather,  # noqa: F401
                        mesh_operators, point_cloud_operators)
from . import diffusion  # noqa: F401
