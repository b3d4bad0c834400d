"""Compile the reference's pure C functions into a test-only shared lib.

Every "bit-exact" claim in this repo bottoms out at golden/model.py — a
hand re-expression of /root/reference/uav_local_nav.c.  This module turns
that trust into a machine check: it extracts the *verbatim* C text of the
pure perception/mapping functions straight out of the read-only reference
tree at build time (nothing is vendored into this repo), compiles it with
gcc into a shared library with the impure dependencies stubbed (UART fds,
now_ms, telemetry globals), and exposes the functions through ctypes so
tests/test_golden_vs_c.py can fuzz-diff them against the golden model.

Extracted (uav_local_nav.c):
  * SCAN/CTRL framing constants                        (:77-98)
  * ToF constants + beam/filter state                  (:99-129)
  * mapping core: clamp_lo, world_to_grid, raycast_update,
    map_update_from_beams, recenter, frontier_score_dir (:180-385)
  * AltSrc enum + ceiling state                        (:533-548)
  * xor8 / LE readers / robust_col_dist_m /
    compute_beams_and_minima                           (:1302-1359)
  * tof_filter_tick + update_alt_estimate              (:1429-1470)

If the reference tree is not present the build returns None and the
fidelity tests skip (the repo stays standalone).
"""

from __future__ import annotations

import ctypes
import os
import re
import subprocess
import tempfile
from typing import Optional

REF_C = os.environ.get("MQS_REF_C", "/root/reference/uav_local_nav.c")

# (start_regex, end_regex) — start inclusive, end exclusive.
_SECTIONS = [
    (r"// -+ ToF frame -+", r"// Last-good ToF frame"),
    (r"// Physical order in the packet", r"// -+ Liftoff assist"),
    (r"// -+ Mapping -+", r"// -+ MAVLink state"),
    (r"// Ceiling logic", r"// Takeoff command latch"),
    (r"// -+ ToF parsing -+", r"static void accept_scan_frame"),
    (r"// -+ Filtering -+", r"// -+ Logging \(pose \+ scans\)"),
]

_PRELUDE = """
#include <stdint.h>
#include <stdbool.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <stdio.h>
/* silence the reference's recenter/ctrl printfs in the test lib */
#define printf(...) ((void)0)
/* stubs for update_alt_estimate's telemetry globals (set via exports) */
#define MAV_LANDED_STATE_ON_GROUND 1
static bool have_lpos, have_rangefinder, have_ext, have_xy;
static uint64_t lpos_last_update_ms, rangefinder_last_update_ms;
static uint8_t landed_state;
static float rangefinder_m = NAN, lpos_alt_filt_m = NAN;
static uint64_t stub_now_ms;
static uint64_t now_ms(void) { return stub_now_ms; }
"""

_EPILOGUE = """
/* ---- exported C ABI for the ctypes fuzz harness ---- */
void ref_map_reset(float ox, float oy) {
  memset(occ_grid, 0, sizeof(occ_grid));
  map_inited = true;
  map_origin_x = ox;
  map_origin_y = oy;
  pending_kf_flags = 0;
}
void ref_map_set(const int8_t* g) { memcpy(occ_grid, g, sizeof(occ_grid)); }
void ref_map_get(int8_t* out) { memcpy(out, occ_grid, sizeof(occ_grid)); }
float ref_origin_x(void) { return map_origin_x; }
float ref_origin_y(void) { return map_origin_y; }
unsigned ref_kf_flags(void) { return pending_kf_flags; }
void ref_raycast(float x0, float y0, float x1, float y1, int hit) {
  raycast_update(x0, y0, x1, y1, hit != 0);
}
void ref_set_beams(const float* b) {
  memcpy(tof_beams_m, b, sizeof(tof_beams_m));
}
void ref_map_update(float x, float y, float yaw) {
  map_update_from_beams(x, y, yaw);
}
void ref_recenter(float x, float y) { map_recentre_if_needed(x, y); }
int ref_frontier(float x, float y, float yaw, float off) {
  return frontier_score_dir(x, y, yaw, off);
}
float ref_robust_col(const uint8_t* grid_u16le, int col) {
  return robust_col_dist_m(grid_u16le, col);
}
void ref_compute_beams(const uint8_t* frame, float* beams_out,
                       float* min_out) {
  compute_beams_and_minima(frame);
  memcpy(beams_out, tof_beams_m, sizeof(tof_beams_m));
  memcpy(min_out, tof_min_m, sizeof(tof_min_m));
}
void ref_filter_tick(const float* filt_in, const float* minima,
                     float* filt_out) {
  memcpy(tof_filt_m, filt_in, sizeof(tof_filt_m));
  memcpy(tof_min_m, minima, sizeof(tof_min_m));
  tof_filter_tick();
  memcpy(filt_out, tof_filt_m, sizeof(tof_filt_m));
}
void ref_alt_setup(uint64_t now, int hv_lpos, uint64_t lpos_ms, int hv_rf,
                   uint64_t rf_ms, float rf_val, int hv_ext, int landed,
                   float lpos_alt, float alt0, int ceil0) {
  stub_now_ms = now;
  have_lpos = hv_lpos != 0;
  lpos_last_update_ms = lpos_ms;
  have_rangefinder = hv_rf != 0;
  rangefinder_last_update_ms = rf_ms;
  rangefinder_m = rf_val;
  have_ext = hv_ext != 0;
  landed_state = (uint8_t)landed;
  lpos_alt_filt_m = lpos_alt;
  alt_est_m = alt0;
  ceiling_active = ceil0 != 0;
}
void ref_alt_tick(float* alt_out, int* src_out, int* ceil_out,
                  int* have_xy_out) {
  update_alt_estimate();
  *alt_out = alt_est_m;
  *src_out = (int)alt_src;
  *ceil_out = ceiling_active ? 1 : 0;
  *have_xy_out = have_xy ? 1 : 0;
}
"""


def extract_sections(src_path: str = REF_C) -> str:
    with open(src_path, "r") as f:
        lines = f.read().splitlines()
    parts = []
    for start_re, end_re in _SECTIONS:
        start = end = None
        for i, ln in enumerate(lines):
            if start is None and re.search(start_re, ln):
                start = i
            elif start is not None and re.search(end_re, ln):
                end = i
                break
        if start is None or end is None:
            raise RuntimeError(f"section not found: {start_re} .. {end_re}")
        parts.append("\n".join(lines[start:end]))
    return "\n\n".join(parts)


def build_shim(out_dir: Optional[str] = None) -> Optional[str]:
    """Extract + compile the reference shim; returns the .so path, or
    None when the reference tree / gcc is unavailable."""
    if not os.path.exists(REF_C):
        return None
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="mqs_refshim_")
    os.makedirs(out_dir, exist_ok=True)
    c_path = os.path.join(out_dir, "ref_shim.c")
    so_path = os.path.join(out_dir, "libref_shim.so")
    with open(c_path, "w") as f:
        f.write(_PRELUDE + extract_sections() + _EPILOGUE)
    cmd = ["gcc", "-O2", "-fPIC", "-shared", "-w", "-o", so_path, c_path,
           "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return None
    return so_path


def load_shim(so_path: str) -> ctypes.CDLL:
    lib = ctypes.CDLL(so_path)
    c_f = ctypes.c_float
    c_i = ctypes.c_int
    c_u64 = ctypes.c_uint64
    p_i8 = ctypes.POINTER(ctypes.c_int8)
    p_u8 = ctypes.POINTER(ctypes.c_uint8)
    p_f = ctypes.POINTER(c_f)
    p_i = ctypes.POINTER(c_i)
    lib.ref_map_reset.argtypes = [c_f, c_f]
    lib.ref_map_set.argtypes = [p_i8]
    lib.ref_map_get.argtypes = [p_i8]
    lib.ref_origin_x.restype = c_f
    lib.ref_origin_y.restype = c_f
    lib.ref_kf_flags.restype = ctypes.c_uint
    lib.ref_raycast.argtypes = [c_f, c_f, c_f, c_f, c_i]
    lib.ref_set_beams.argtypes = [p_f]
    lib.ref_map_update.argtypes = [c_f, c_f, c_f]
    lib.ref_recenter.argtypes = [c_f, c_f]
    lib.ref_frontier.argtypes = [c_f, c_f, c_f, c_f]
    lib.ref_frontier.restype = c_i
    lib.ref_robust_col.argtypes = [p_u8, c_i]
    lib.ref_robust_col.restype = c_f
    lib.ref_compute_beams.argtypes = [p_u8, p_f, p_f]
    lib.ref_filter_tick.argtypes = [p_f, p_f, p_f]
    lib.ref_alt_setup.argtypes = [c_u64, c_i, c_u64, c_i, c_u64, c_f, c_i,
                                  c_i, c_f, c_f, c_i]
    lib.ref_alt_tick.argtypes = [p_f, p_i, p_i, p_i]
    return lib
