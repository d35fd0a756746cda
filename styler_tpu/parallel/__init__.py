from styler_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    init_distributed,
    make_hybrid_mesh,
    make_mesh,
    param_sharding_for,
    replicate_state,
    replicated,
    shard_batch,
    shard_state,
)
