from micro_quad_slam_tpu.sim.synthio import synth_room_scanlog, room_tof_distance  # noqa: F401
