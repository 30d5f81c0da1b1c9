from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    clip_param_pspecs,
    create_mesh,
    default_mesh,
    replicate_params,
    replicated,
    shard_batch_arrays,
    shard_clip_params,
)
