from .mesh import (make_mesh, shard_batch, replicate,  # noqa: F401
                   make_parallel_train_step, make_parallel_forward)
from .multihost import (init_multihost, shard_frame_list,  # noqa: F401
                        allreduce_metric_sums)
