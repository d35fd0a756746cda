from styler_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)
