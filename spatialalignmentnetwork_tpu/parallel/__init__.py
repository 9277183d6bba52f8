from .mesh import (
    make_mesh,
    dp_shardings,
    shard_batch,
    shard_batch_multihost,
    replicate_state,
)
