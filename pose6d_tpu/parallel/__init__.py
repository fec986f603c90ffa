from .mesh import (make_mesh, shard_batch, replicate,  # noqa: F401
                   make_parallel_train_step, make_parallel_forward)
