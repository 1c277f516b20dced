from mm_s2ut.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    PIPE_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    param_shardings,
    maybe_shard,
)
from mm_s2ut.parallel.pipeline import (  # noqa: F401
    PipelinedEncoderStack,
    gpipe,
    stack_layer_params,
    unstack_layer_params,
)
