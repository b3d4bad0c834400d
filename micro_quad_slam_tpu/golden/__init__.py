from micro_quad_slam_tpu.golden.model import (  # noqa: F401
    GoldenMapper,
    robust_col_dist_m,
    compute_beams_and_minima,
    tof_filter_step,
    frontier_score_dir,
    golden_replay_mapping,
)
