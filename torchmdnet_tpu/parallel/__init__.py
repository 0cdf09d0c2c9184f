from torchmdnet_tpu.parallel.dp import (  # noqa: F401
    make_data_parallel_train_step,
    make_mesh,
    shard_batch,
)
