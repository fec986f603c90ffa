from .operators import ShapeOperators, mesh_operators, point_cloud_operators  # noqa: F401
from . import diffusion  # noqa: F401
