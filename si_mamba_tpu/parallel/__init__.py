from si_mamba_tpu.parallel.pipeline import pipeline_mixer_apply, stack_mixer_params
from si_mamba_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    dp_train_jit,
    dp_eval_jit,
    maybe_initialize_distributed,
    per_process_batch,
    local_eval_mesh,
    localize,
    global_host_sum,
    global_host_concat,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
           "replicate", "dp_train_jit", "dp_eval_jit",
           "maybe_initialize_distributed", "per_process_batch",
           "local_eval_mesh", "localize", "global_host_sum",
           "global_host_concat",
           "pipeline_mixer_apply", "stack_mixer_params"]
