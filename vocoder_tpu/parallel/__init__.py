from vocoder_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    constrain,
    infer_param_specs,
    make_mesh,
    replicated,
    shard_channels,
    shard_train_state,
    train_state_specs,
)
