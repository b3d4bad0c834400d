from micro_quad_slam_tpu.formats.scanlog import (  # noqa: F401
    SCANREC_DTYPE,
    SCANREC_MAGIC,
    SCANLOG_FILE_HEADER,
    ScanLog,
    read_scanlog,
    write_scanlog,
)
from micro_quad_slam_tpu.formats.scanframe import (  # noqa: F401
    SCAN_HEADER,
    CTRL_HEADER,
    SCAN_BYTES,
    CTRL_BYTES,
    xor8,
    encode_scan_frame,
    encode_ctrl_frame,
    decode_stream,
)
from micro_quad_slam_tpu.formats.navlog import (  # noqa: F401
    NAVLOG_HEADER,
    NavlogWriter,
    read_navlog,
)
