from micro_quad_slam_tpu.replay.mapping import (  # noqa: F401
    MappingState,
    mapping_init,
    mapping_step,
    scanlog_to_arrays,
    replay_mapping,
    replay_mapping_batched,
)
