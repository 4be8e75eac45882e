from .sharding import (
    data_parallel_elbo_step,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_elbo_step"]
