"""Native C++ IO vs pure-python codecs: byte-equality + speed sanity."""

import io
import time

import numpy as np
import pytest

from micro_quad_slam_tpu.formats import (
    encode_ctrl_frame,
    encode_scan_frame,
    read_scanlog,
    write_scanlog,
)
from micro_quad_slam_tpu.formats.scanframe import decode_stream_arrays
from micro_quad_slam_tpu.io import (
    decode_stream_native,
    native_available,
    read_scanlog_native,
)
from micro_quad_slam_tpu.sim import synth_room_scanlog

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="g++ toolchain unavailable")


@needs_native
def test_native_scanlog_matches_python(tmp_path):
    log = synth_room_scanlog(n_frames=40, seed=5, noise_mm=6.0,
                             dropout_p=0.04, with_flow=True)
    p = str(tmp_path / "scanlog.bin")
    write_scanlog(p, log)
    a = read_scanlog(p)
    b = read_scanlog_native(p)
    for k in ("host_ms", "scan_ms", "x_m", "y_m", "yaw_deg", "alt_m",
              "roll_rad", "pitch_rad", "rf_m", "of_rate_x", "of_rate_y",
              "of_q", "state", "kf_flags", "sys_health", "grid_mm"):
        np.testing.assert_array_equal(getattr(a, k), getattr(b, k),
                                      err_msg=k)


@needs_native
def test_native_scanlog_skips_bad_magic(tmp_path):
    log = synth_room_scanlog(n_frames=4)
    buf = io.BytesIO()
    write_scanlog(buf, log)
    raw = bytearray(buf.getvalue())
    raw[7 + 569] ^= 0xFF  # corrupt record 1's magic
    out = read_scanlog_native(bytes(raw))
    assert len(out) == 3
    np.testing.assert_array_equal(out.host_ms,
                                  np.asarray(log.host_ms)[[0, 2, 3]])


@needs_native
def test_native_stream_matches_python():
    rng = np.random.default_rng(0)
    parts = [bytes(rng.integers(0, 256, 200, dtype=np.uint8).tobytes())]
    for i in range(5):
        grid = (rng.integers(0, 160, (4, 8, 8)).astype(np.uint16) + 1000)
        parts.append(encode_scan_frame(100 + i, grid))
        parts.append(encode_ctrl_frame(i % 2, i))
        parts.append(bytes([0xA6, 0x01]))  # torn ctrl: eats 5 bytes
        parts.append(b"\x00\x42" * 7)
    stream = b"".join(parts)
    t_p, g_p, c_p = decode_stream_arrays(stream)
    t_n, g_n, c_n = decode_stream_native(stream)
    np.testing.assert_array_equal(t_p, t_n)
    np.testing.assert_array_equal(g_p, g_n)
    assert c_p == c_n


@needs_native
def test_native_decode_is_fast(tmp_path):
    log = synth_room_scanlog(n_frames=600, seed=1)
    p = str(tmp_path / "big.bin")
    write_scanlog(p, log)
    t0 = time.perf_counter()
    out = read_scanlog_native(p)
    dt = time.perf_counter() - t0
    assert len(out) == 600
    # 600 records (340 KB) must decode in well under 50 ms natively
    assert dt < 0.05, f"native decode took {dt*1e3:.1f} ms"
