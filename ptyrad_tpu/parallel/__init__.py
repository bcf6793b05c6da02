from ptyrad_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicate,
    shard_model,
)

__all__ = ["make_mesh", "data_sharding", "replicate", "shard_model"]
