from tcs_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    initialize_distributed,
    replicate,
    shard_batch,
)
