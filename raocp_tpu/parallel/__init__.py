from raocp_tpu.parallel.sharding import (
    initialize_distributed,
    make_mesh,
    node_sharding,
    shard_problem,
    shard_variables,
)

__all__ = ["initialize_distributed", "make_mesh", "node_sharding",
           "shard_problem", "shard_variables"]
