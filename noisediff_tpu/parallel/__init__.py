from .mesh import (
    data_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
)
