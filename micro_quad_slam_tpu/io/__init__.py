from micro_quad_slam_tpu.io.native import (  # noqa: F401
    native_available,
    read_scanlog_native,
    decode_stream_native,
)
