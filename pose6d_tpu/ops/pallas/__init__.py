from .cdist import masked_argmin_cdist, masked_topk_cdist  # noqa: F401
from .consistency import (consistency_sum_rank_major,  # noqa: F401
                          masked_consistency_sum)
