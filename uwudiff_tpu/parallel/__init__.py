from uwudiff_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    fsdp_param_sharding,
    replicate_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "fsdp_param_sharding",
    "replicate_sharding",
]
