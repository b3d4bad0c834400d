from micro_quad_slam_tpu.slam.posegraph import (  # noqa: F401
    PoseGraph,
    gauss_newton,
    se2_compose,
    se2_relative,
)
from micro_quad_slam_tpu.slam.pipeline import slam_replay  # noqa: F401
