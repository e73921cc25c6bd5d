from neurosync_trainer_lite_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    batch_sharding,
    shard_params,
)

__all__ = ["make_mesh", "param_shardings", "batch_sharding", "shard_params"]
