from .sharded import (  # noqa: F401
    make_train_step_sharded, ray_sharding, replicated, shard_map)
