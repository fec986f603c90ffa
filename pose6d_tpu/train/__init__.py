from .loss import DPFMLossConfig, dpfm_loss  # noqa: F401
from . import metrics  # noqa: F401
from .train_step import TrainState, make_train_step, make_optimizer  # noqa: F401
