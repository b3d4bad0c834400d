from micro_quad_slam_tpu.models.behavior import (  # noqa: F401
    BehaviorState,
    behavior_init,
    behavior_step,
)
