from uwudiff_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    fsdp_param_sharding,
    replicate_sharding,
)
from uwudiff_tpu.parallel.expert import expert_parallel, constrain_expert
from uwudiff_tpu.parallel.pipeline import pipeline_blocks, pipelined_dit_apply

__all__ = [
    "make_mesh",
    "batch_sharding",
    "fsdp_param_sharding",
    "replicate_sharding",
    "expert_parallel",
    "constrain_expert",
    "pipeline_blocks",
    "pipelined_dit_apply",
]
