from raocp_tpu.parallel.sharding import (
    make_mesh,
    node_sharding,
    shard_problem,
    shard_variables,
)

__all__ = ["make_mesh", "node_sharding", "shard_problem", "shard_variables"]
