from .mesh import make_mesh, dp_shardings, shard_batch, replicate_state
