"""ctypes bindings for the native IO library (csrc/mqs_io.cpp).

Builds libmqs_io.so lazily with g++ on first use (cached next to the
package); every entry point falls back to the pure-python codecs in
micro_quad_slam_tpu.formats when the toolchain is unavailable, and the
tests assert byte-equality between the two paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from micro_quad_slam_tpu.formats.scanlog import ScanLog

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


class _ScanRecSoA(ctypes.Structure):
    _fields_ = [
        ("host_ms", ctypes.c_void_p),
        ("scan_ms", ctypes.c_void_p),
        ("x_m", ctypes.c_void_p),
        ("y_m", ctypes.c_void_p),
        ("yaw_deg", ctypes.c_void_p),
        ("alt_m", ctypes.c_void_p),
        ("roll_rad", ctypes.c_void_p),
        ("pitch_rad", ctypes.c_void_p),
        ("rf_m", ctypes.c_void_p),
        ("of_rate_x", ctypes.c_void_p),
        ("of_rate_y", ctypes.c_void_p),
        ("of_q", ctypes.c_void_p),
        ("state", ctypes.c_void_p),
        ("kf_flags", ctypes.c_void_p),
        ("sys_health", ctypes.c_void_p),
        ("grid_mm", ctypes.c_void_p),
    ]


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.normpath(os.path.join(here, "..", "..", "csrc",
                                            "mqs_io.cpp"))
        so = os.path.join(here, "_libmqs_io.so")
        try:
            if (not os.path.exists(so)
                    or (os.path.exists(src)
                        and os.path.getmtime(src) > os.path.getmtime(so))):
                if not os.path.exists(src):
                    return None
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", so, src],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.SubprocessError):
            return None

        lib.mqs_scanlog_count.restype = ctypes.c_longlong
        lib.mqs_scanlog_count.argtypes = [ctypes.c_char_p, ctypes.c_longlong]
        lib.mqs_scanlog_decode.restype = ctypes.c_longlong
        lib.mqs_scanlog_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.POINTER(_ScanRecSoA)]
        lib.mqs_stream_decode.restype = ctypes.c_longlong
        lib.mqs_stream_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong)]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def read_scanlog_native(src) -> ScanLog:
    """Native scanlog decode (file path or bytes).  Skips bad-magic
    records (lenient semantics).  Falls back to the python reader."""
    if isinstance(src, str):
        with open(src, "rb") as f:
            data = f.read()
    else:
        data = bytes(src)

    lib = _build_and_load()
    if lib is None:
        from micro_quad_slam_tpu.formats.scanlog import read_scanlog
        return read_scanlog(data, strict=False)

    n = lib.mqs_scanlog_count(data, len(data))
    cols = {
        "host_ms": np.empty(n, np.uint32),
        "scan_ms": np.empty(n, np.uint32),
        "x_m": np.empty(n, np.float32),
        "y_m": np.empty(n, np.float32),
        "yaw_deg": np.empty(n, np.float32),
        "alt_m": np.empty(n, np.float32),
        "roll_rad": np.empty(n, np.float32),
        "pitch_rad": np.empty(n, np.float32),
        "rf_m": np.empty(n, np.float32),
        "of_rate_x": np.empty(n, np.float32),
        "of_rate_y": np.empty(n, np.float32),
        "of_q": np.empty(n, np.uint8),
        "state": np.empty(n, np.uint8),
        "kf_flags": np.empty(n, np.uint8),
        "sys_health": np.empty(n, np.uint32),
    }
    grid = np.empty((n, 256), np.uint16)
    soa = _ScanRecSoA(**{k: _ptr(v) for k, v in cols.items()},
                      grid_mm=_ptr(grid))
    got = lib.mqs_scanlog_decode(data, len(data), ctypes.byref(soa))
    assert got == n, (got, n)
    return ScanLog(grid_mm=grid.reshape(n, 4, 8, 8), **cols)


def decode_stream_native(data) -> Tuple[np.ndarray, np.ndarray, list]:
    """Native UART stream parse -> (t_ms [S], grid_mm [S,4,8,8], ctrls).
    Identical accept/reject behavior to formats.scanframe.decode_stream."""
    data = bytes(data)
    lib = _build_and_load()
    if lib is None:
        from micro_quad_slam_tpu.formats.scanframe import decode_stream_arrays
        return decode_stream_arrays(data)

    max_s = len(data) // 518 + 1
    max_c = len(data) // 7 + 1
    t_ms = np.empty(max_s, np.uint32)
    grids = np.empty((max_s, 256), np.uint16)
    cmd = np.empty(max_c, np.uint8)
    seq = np.empty(max_c, np.uint32)
    ncs = ctypes.c_longlong(0)
    ns = lib.mqs_stream_decode(data, len(data), _ptr(t_ms), _ptr(grids),
                               max_s, _ptr(cmd), _ptr(seq), max_c,
                               ctypes.byref(ncs))
    ctrls = [(int(cmd[i]), int(seq[i])) for i in range(ncs.value)]
    return (t_ms[:ns].copy(), grids[:ns].reshape(ns, 4, 8, 8).copy(), ctrls)
