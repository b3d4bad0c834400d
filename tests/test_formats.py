"""Format round-trip tests: scanrec_t, SCAN/CTRL wire frames, navlog.csv.

These pin the byte-exact contracts of SURVEY.md §2E (E1/E2) and §2A (A5/A6).
"""

import io

import numpy as np
import pytest

from micro_quad_slam_tpu.formats import (
    CTRL_BYTES,
    SCAN_BYTES,
    SCANREC_DTYPE,
    NavlogWriter,
    decode_stream,
    encode_ctrl_frame,
    encode_scan_frame,
    read_navlog,
    read_scanlog,
    write_scanlog,
    xor8,
)
from micro_quad_slam_tpu.formats.scanlog import SCANLOG_FILE_HEADER, SCANREC_MAGIC
from micro_quad_slam_tpu.sim import synth_room_scanlog


def test_scanrec_layout():
    # 57-byte header + 512-byte grid = 569 (uav_local_nav.c:1522-1547)
    assert SCANREC_DTYPE.itemsize == 569
    assert SCANREC_DTYPE.fields["grid_raw"][1] == 57
    assert SCANREC_MAGIC == 0x324E4353


def test_scanlog_roundtrip(tmp_path):
    log = synth_room_scanlog(n_frames=7, seed=3, noise_mm=5.0, dropout_p=0.05)
    p = str(tmp_path / "scanlog.bin")
    write_scanlog(p, log)
    with open(p, "rb") as f:
        raw = f.read()
    assert raw.startswith(SCANLOG_FILE_HEADER)
    assert (len(raw) - len(SCANLOG_FILE_HEADER)) % 569 == 0

    back = read_scanlog(p)
    assert len(back) == 7
    np.testing.assert_array_equal(back.grid_mm, log.grid_mm)
    np.testing.assert_array_equal(back.x_m, log.x_m)
    np.testing.assert_array_equal(back.state, log.state)
    np.testing.assert_array_equal(back.host_ms, log.host_ms)


def test_scanlog_append_no_duplicate_header(tmp_path):
    log = synth_room_scanlog(n_frames=3)
    p = str(tmp_path / "scanlog.bin")
    write_scanlog(p, log)
    write_scanlog(p, log, append=True)  # restart-continuation semantics
    back = read_scanlog(p)
    assert len(back) == 6


def test_scanlog_strict_rejects_truncation(tmp_path):
    log = synth_room_scanlog(n_frames=2)
    buf = io.BytesIO()
    write_scanlog(buf, log)
    data = buf.getvalue()[:-10]  # torn final record
    with pytest.raises(ValueError):
        read_scanlog(data, strict=True)
    back = read_scanlog(data, strict=False)
    assert len(back) == 1


def test_scan_frame_roundtrip():
    # values chosen so no payload byte equals 0xA6 (see hijack test below)
    grid = (np.arange(256, dtype=np.uint16).reshape(4, 8, 8) % 160) + 1000
    frame = encode_scan_frame(123456, grid)
    assert len(frame) == SCAN_BYTES == 518
    assert frame[0] == 0xA5
    assert frame[-1] == xor8(frame[:-1])
    out = list(decode_stream(frame))
    assert len(out) == 1 and out[0][0] == "scan"
    assert out[0][1]["t_ms"] == 123456
    np.testing.assert_array_equal(out[0][1]["grid_mm"], grid)


def test_ctrl_frame_roundtrip():
    frame = encode_ctrl_frame(1, 42)
    assert len(frame) == CTRL_BYTES == 7
    assert frame[0] == 0xA6
    out = list(decode_stream(frame))
    assert out == [("ctrl", {"cmd": 1, "seq": 42})]


def test_stream_resync_with_garbage_and_interleave():
    grid = np.full((4, 8, 8), 1500, np.uint16)
    scan = encode_scan_frame(99, grid)
    ctrl = encode_ctrl_frame(0, 7)
    # garbage + ctrl + garbage + scan + torn scan prefix + ctrl
    stream = b"\x00\x13\x37" + ctrl + b"\xa5\x01"[:0] + b"\x42" + scan + scan[:100] + ctrl
    kinds = [k for k, _ in decode_stream(stream)]
    # the torn scan swallows the final ctrl's bytes into its 518-byte frame
    # (exactly as the byte-wise C parser would) -> only 1 ctrl + 1 scan
    assert kinds.count("scan") == 1
    assert kinds.count("ctrl") >= 1


def test_ctrl_header_hijacks_mid_scan():
    # Reference quirk (uav_local_nav.c:1394-1399): a 0xA6 byte *inside* a
    # SCAN payload is stolen by the CTRL parser (it runs first every byte),
    # corrupting the scan.  This is why the clean revision debounces DISARM
    # ("spurious headers in the ToF stream", clean_uav_fc_tof_nav.c:75-77).
    grid = np.full((4, 8, 8), 1000, np.uint16)
    grid[0, 0, 0] = 0x00A6  # low byte 0xA6 mid-payload
    frame = encode_scan_frame(5, grid)
    kinds = [k for k, _ in decode_stream(frame)]
    assert "scan" not in kinds  # frame is corrupted, exactly like the C parser


def test_bad_checksum_dropped():
    grid = np.full((4, 8, 8), 1000, np.uint16)
    frame = bytearray(encode_scan_frame(5, grid))
    frame[-1] ^= 0xFF
    assert list(decode_stream(bytes(frame))) == []


def test_navlog_roundtrip(tmp_path):
    p = str(tmp_path / "navlog.csv")
    with NavlogWriter(p) as w:
        w.write_row(100, 5, True, True, 4, 12.5, 0.5, 2, 1.0, -2.0, 0.1, 0.0,
                    0.48, 80, 0.01, -0.02, 1.2, 2.0, 3.0, 0.9, 7.8, 2)
        w.write_row(150, 8, False, True, 9, float("nan"), float("nan"), 0,
                    float("nan"), float("nan"), float("nan"), float("nan"),
                    float("nan"), 0, float("nan"), float("nan"),
                    float("nan"), float("nan"), float("nan"), float("nan"),
                    float("nan"), 0)
    cols = read_navlog(p)
    assert cols["t_ms"].tolist() == [100, 150]
    assert cols["state"].tolist() == [5, 8]
    assert cols["alt_src"][0] == 2
    assert np.isnan(cols["yaw_deg"][1])
    assert abs(cols["yaw_deg"][0] - 12.5) < 1e-6
    assert cols["batt_cells"].tolist() == [2, 0]
