from .mesh import make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    batch_sharding, commit_replicated, make_image_train_step_for_mesh,
    make_sharded_train_step, make_shardmap_train_step,
    make_train_step_for_mesh, param_partition_specs, replicate,
    shard_params)
