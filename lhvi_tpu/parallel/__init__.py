from lhvi_tpu.parallel.mesh import (
    make_mesh,
    chain_sharding,
    replicated,
    shard_chain_state,
    shard_fg_factors,
)

__all__ = [
    "make_mesh",
    "chain_sharding",
    "replicated",
    "shard_chain_state",
    "shard_fg_factors",
]
