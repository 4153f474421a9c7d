from .mesh import (  # noqa: F401
    data_mesh,
    init_distributed,
    replicate_sharding,
    batch_sharding,
    shard_batch,
)
from .spatial import (  # noqa: F401
    image_sharding,
    spatial_forward,
    spatial_mesh,
)
