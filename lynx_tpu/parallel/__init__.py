from lynx_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    shard_beam,
    shard_segment,
    make_tuning_train_step,
)
