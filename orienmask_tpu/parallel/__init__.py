from .mesh import (  # noqa: F401
    data_mesh,
    init_distributed,
    replicate_sharding,
    batch_sharding,
    shard_batch,
)
