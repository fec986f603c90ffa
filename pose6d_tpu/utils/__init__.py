from .misc import quaternion_rotation_matrix  # noqa: F401
from .profiling import profile_trace, StageTimer  # noqa: F401
