from mm_s2ut.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    param_shardings,
    maybe_shard,
)
