from micro_quad_slam_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replay_mapping_sharded,
    batch_metrics,
)
