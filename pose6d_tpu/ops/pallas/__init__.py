from .cdist import masked_argmin_cdist, masked_topk_cdist  # noqa: F401
