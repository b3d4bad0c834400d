from micro_quad_slam_tpu.ops.beams import extract_beams, tof_filter_update  # noqa: F401
from micro_quad_slam_tpu.ops.raycast import (  # noqa: F401
    GridGeom,
    make_rays,
    window_scan_update,
    apply_scan_to_grid,
    recenter_grid,
    frontier_scores,
    new_padded_grid,
    logical_grid,
)
