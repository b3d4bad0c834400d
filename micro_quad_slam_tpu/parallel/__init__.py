from micro_quad_slam_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_pytree,
    replay_mapping_sharded,
    replay_fusion_sharded,
    slam_replay_sharded,
    sim_run_sharded,
    batch_metrics,
)
