from . import geometry, masking, sampling  # noqa: F401
