from .cdist import masked_argmin_cdist, masked_topk_cdist  # noqa: F401
from .consistency import masked_consistency_sum  # noqa: F401
