from vocoder_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    infer_param_specs,
    make_mesh,
    replicated,
    shard_train_state,
)
