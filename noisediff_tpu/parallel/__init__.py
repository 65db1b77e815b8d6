from .mesh import (
    activate,
    data_sharding,
    make_mesh,
    param_sharding_rules,
    put_replicated,
    replicated,
    shard_batch,
)
