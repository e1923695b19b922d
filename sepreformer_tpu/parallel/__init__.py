from sepreformer_tpu.parallel.mesh import (  # noqa: F401
    batch_spec,
    create_mesh,
    param_specs,
    shard_train_state,
    sources_spec,
)
