from .dpfm import DPFMNet, DPFMConfig  # noqa: F401
from .port_weights import port_reference_checkpoint  # noqa: F401
