from lynx_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    shard_beam,
    shard_segment,
    make_tuning_train_step,
)
from lynx_tpu.parallel.pipeline import (  # noqa: F401
    STAGE_AXIS,
    make_pipeline_mesh,
    pipeline_track,
    split_into_stages,
)
from lynx_tpu.parallel.distributed import (  # noqa: F401
    initialize,
    is_initialized,
    global_mesh,
    host_local_beam_to_global,
    replicate_to_global,
    process_count,
    process_index,
)
