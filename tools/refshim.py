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


# ---------------------------------------------------------------------------
# Second extraction unit: the CLEAN binary (clean_uav_fc_tof_nav.c).
# Every CL-specific semantic previously rested on hand transliteration plus
# golden<->JAX agreement, which cannot catch a shared misreading of the C
# (VERDICT round 3, missing 1).  Extracted verbatim:
#   * CTRL framing constants incl. the DISARM debounce window   (:73-80)
#   * stability-first params (HOVER/TAKEOFF/CEIL/PREARM/REQUIRE) (:100-112)
#   * battery constants + failsafe state                        (:148-159)
#   * ceiling/alt state + AltSrc enum                           (:370-383)
#   * servo_motor_avg .. hover_target_z_down: health gates,
#     battery validity/sampling, vel_xy gating, hover readiness (:891-1045)
#   * rd_u32_le                                                 (:1403-1408)
#   * accept_ctrl_frame (DISARM streak debounce)                (:1605-1654)
#   * update_alt_estimate + tof_filter_tick (alt_max, RF sanity) (:1700-1785)
#   * handle_battery_status (validity window + cell inference)  (:1247-1301)

REF_C_CL = os.environ.get("MQS_REF_C_CL",
                          "/root/reference/clean_uav_fc_tof_nav.c")

_SECTIONS_CL = [
    (r"// Control frames from ESP32 hub", r"static uint8_t ctrl_rxbuf"),
    (r"// -+ Stability-first params", r"// -+ Liftoff assist"),
    (r"// -+ Battery safety", r"// -+ Keyframes"),
    (r"// Ceiling logic", r"// Takeoff command latch"),
    (r"static float servo_motor_avg", r"static void init_hover_targets_on_ground"),
    (r"static uint32_t rd_u32_le", r"static float rd_f32_le"),
    (r"static void accept_ctrl_frame", r"static void pump_tof_uart"),
    (r"static void tof_filter_tick", r"// -+ Logging -+"),
    (r"static void handle_sys_status", r"static void handle_servo_output_raw"),
    (r"static void handle_battery_status", r"static void handle_attitude"),
]

_PRELUDE_CL = """
#include <stdint.h>
#include <stdbool.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <stdio.h>
#define printf(...) ((void)0)
#define MAV_LANDED_STATE_ON_GROUND 1
#define MAV_SYS_STATUS_SENSOR_3D_GYRO 0x01u
#define MAV_SYS_STATUS_SENSOR_Z_ALTITUDE_CONTROL 0x2000u
#define MAV_SYS_STATUS_SENSOR_XY_POSITION_CONTROL 0x4000u
#define MAV_SYS_STATUS_SENSOR_MOTOR_OUTPUTS 0x400000u
/* telemetry globals the extracted functions read (set via exports) */
static bool have_sys, have_att, have_of, have_lpos, have_rangefinder;
static bool have_ext, have_xy, fc_armed, want_arm;
static uint32_t sys_health, sys_enabled;
static uint64_t sys_last_ms, of_last_update_ms, lpos_last_update_ms;
static uint64_t rangefinder_last_update_ms;
static uint8_t of_quality, landed_state;
static float lpos_alt_filt_m = NAN, rangefinder_m = NAN;
static uint16_t servo_raw[8];
static float tof_min_m[4] = {NAN, NAN, NAN, NAN};
static float tof_filt_m[4] = {NAN, NAN, NAN, NAN};
static float batt_v_total = NAN, batt_vpc = NAN, batt_v_total_sys = NAN;
static int batt_cells = 0;
static uint64_t batt_sys_last_ms = 0;
static FILE *log_fp = NULL, *txt_log_fp = NULL;
static uint64_t stub_now_ms;
static uint64_t now_ms(void) { return stub_now_ms; }
static uint32_t sys_present;
/* minimal mavlink stand-ins so the handlers compile verbatim */
typedef struct { uint16_t voltages[10]; } mavlink_battery_status_t;
typedef struct {
  uint32_t onboard_control_sensors_present;
  uint32_t onboard_control_sensors_enabled;
  uint32_t onboard_control_sensors_health;
  uint16_t voltage_battery;
} mavlink_sys_status_t;
typedef struct {
  union { mavlink_battery_status_t batt; mavlink_sys_status_t sys; } u;
} mavlink_message_t;
static void mavlink_msg_battery_status_decode(const mavlink_message_t* m,
                                              mavlink_battery_status_t* b) {
  *b = m->u.batt;
}
static void mavlink_msg_sys_status_decode(const mavlink_message_t* m,
                                          mavlink_sys_status_t* s) {
  *s = m->u.sys;
}
"""

_EPILOGUE_CL = """
/* ---- exported C ABI for the ctypes fuzz harness ---- */
void cl_reset(void) {
  xy_ok_since_ms = 0; prearm_ok_since_ms = 0;
  ceiling_active = false; alt_est_m = NAN; alt_max_m = NAN;
  alt_src = ALT_SRC_NONE; have_xy = false;
  batt_v_total = NAN; batt_vpc = NAN; batt_cells = 0;
  batt_v_total_sys = NAN; batt_sys_last_ms = 0; batt_last_ms = 0;
  batt_valid = false; last_batt_log_ms = 0; want_arm = false;
  for (int i = 0; i < 4; i++) { tof_min_m[i] = NAN; tof_filt_m[i] = NAN; }
}
void cl_set_telem(uint64_t now, int hv_sys, uint64_t sys_ms,
                  uint32_t health, uint32_t enabled, int hv_att, int hv_of,
                  uint64_t of_ms, int ofq, int hv_lpos, uint64_t lpos_ms,
                  float lpos_alt, int hv_rf, uint64_t rf_ms, float rf,
                  int hv_ext, int landed, int armed) {
  stub_now_ms = now; have_sys = hv_sys != 0; sys_last_ms = sys_ms;
  sys_health = health; sys_enabled = enabled;
  have_att = hv_att != 0; have_of = hv_of != 0;
  of_last_update_ms = of_ms; of_quality = (uint8_t)ofq;
  have_lpos = hv_lpos != 0; lpos_last_update_ms = lpos_ms;
  lpos_alt_filt_m = lpos_alt;
  have_rangefinder = hv_rf != 0; rangefinder_last_update_ms = rf_ms;
  rangefinder_m = rf;
  have_ext = hv_ext != 0; landed_state = (uint8_t)landed;
  fc_armed = armed != 0;
}
void cl_alt_tick(float* alt, float* altmax, int* src, int* ceil_out,
                 int* hv_xy) {
  update_alt_estimate();
  *alt = alt_est_m; *altmax = alt_max_m; *src = (int)alt_src;
  *ceil_out = ceiling_active ? 1 : 0; *hv_xy = have_xy ? 1 : 0;
}
void cl_gates(int* out7) {
  uint64_t t = stub_now_ms;
  out7[0] = vel_xy_allowed(t) ? 1 : 0;
  out7[1] = vel_xy_stable(t) ? 1 : 0;
  out7[2] = hover_ready_now(t) ? 1 : 0;
  out7[3] = hover_ready_stable(t) ? 1 : 0;
  out7[4] = hard_nogo(t) ? 1 : 0;
  out7[5] = z_ctrl_ok(t) ? 1 : 0;
  out7[6] = xy_ctrl_ok(t) ? 1 : 0;
}
float cl_hover_target_z_down(void) { return hover_target_z_down(); }
int cl_batt_sample(float* vpc_out) {
  return batt_vpc_sample(stub_now_ms, vpc_out) ? 1 : 0;
}
void cl_set_batt_sys(float v_total_sys, uint64_t sys_ms) {
  batt_v_total_sys = v_total_sys; batt_sys_last_ms = sys_ms;
}
void cl_batt_status(const uint16_t* volts, uint64_t t, float* vpc,
                    int* cells, float* vtot, int* valid,
                    uint64_t* last_ms) {
  mavlink_message_t m;
  memcpy(m.u.batt.voltages, volts, sizeof(m.u.batt.voltages));
  stub_now_ms = t;
  handle_battery_status(&m);
  *vpc = batt_vpc; *cells = batt_cells; *vtot = batt_v_total;
  *valid = batt_valid ? 1 : 0; *last_ms = batt_last_ms;
}
void cl_sys_status(uint32_t present, uint32_t enabled, uint32_t health,
                   uint16_t voltage_battery, uint64_t t, int* valid,
                   float* v_sys) {
  mavlink_message_t m;
  m.u.sys.onboard_control_sensors_present = present;
  m.u.sys.onboard_control_sensors_enabled = enabled;
  m.u.sys.onboard_control_sensors_health = health;
  m.u.sys.voltage_battery = voltage_battery;
  stub_now_ms = t;
  handle_sys_status(&m);
  *valid = batt_valid ? 1 : 0;
  *v_sys = batt_v_total_sys;
}
int cl_ctrl_frame(uint8_t cmd, uint32_t seq, uint64_t t) {
  uint8_t frame[7];
  frame[0] = 0xA6; frame[1] = cmd;
  frame[2] = (uint8_t)(seq & 0xFF);
  frame[3] = (uint8_t)((seq >> 8) & 0xFF);
  frame[4] = (uint8_t)((seq >> 16) & 0xFF);
  frame[5] = (uint8_t)((seq >> 24) & 0xFF);
  frame[6] = 0;
  stub_now_ms = t;
  accept_ctrl_frame(frame);
  return want_arm ? 1 : 0;
}
void cl_set_want_arm(int v) { want_arm = v != 0; }
void cl_filter_tick(const float* filt_in, const float* minima,
                    float* filt_out) {
  memcpy(tof_filt_m, filt_in, sizeof(tof_filt_m));
  memcpy(tof_min_m, minima, sizeof(tof_min_m));
  tof_filter_tick();
  memcpy(filt_out, tof_filt_m, sizeof(tof_filt_m));
}
"""


def extract_sections(src_path: str = REF_C, sections=None) -> str:
    with open(src_path, "r") as f:
        lines = f.read().splitlines()
    parts = []
    for start_re, end_re in (sections if sections is not None else _SECTIONS):
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


def _compile(c_text: str, out_dir: Optional[str], tag: str) -> Optional[str]:
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix=f"mqs_refshim_{tag}_")
    os.makedirs(out_dir, exist_ok=True)
    c_path = os.path.join(out_dir, f"ref_shim_{tag}.c")
    so_path = os.path.join(out_dir, f"libref_shim_{tag}.so")
    with open(c_path, "w") as f:
        f.write(c_text)
    cmd = ["gcc", "-O2", "-fPIC", "-shared", "-w", "-o", so_path, c_path,
           "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return None
    return so_path


def build_shim(out_dir: Optional[str] = None) -> Optional[str]:
    """Extract + compile the UL reference shim; returns the .so path, or
    None when the reference tree / gcc is unavailable."""
    if not os.path.exists(REF_C):
        return None
    return _compile(_PRELUDE + extract_sections() + _EPILOGUE, out_dir, "ul")


def build_shim_cl(out_dir: Optional[str] = None) -> Optional[str]:
    """Extract + compile the CLEAN-binary shim (second extraction unit)."""
    if not os.path.exists(REF_C_CL):
        return None
    return _compile(
        _PRELUDE_CL + extract_sections(REF_C_CL, _SECTIONS_CL) + _EPILOGUE_CL,
        out_dir, "cl")


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


def load_shim_cl(so_path: str) -> ctypes.CDLL:
    lib = ctypes.CDLL(so_path)
    c_f = ctypes.c_float
    c_i = ctypes.c_int
    c_u8 = ctypes.c_uint8
    c_u32 = ctypes.c_uint32
    c_u64 = ctypes.c_uint64
    p_f = ctypes.POINTER(c_f)
    p_i = ctypes.POINTER(c_i)
    p_u16 = ctypes.POINTER(ctypes.c_uint16)
    p_u64 = ctypes.POINTER(c_u64)
    lib.cl_reset.argtypes = []
    lib.cl_set_telem.argtypes = [c_u64, c_i, c_u64, c_u32, c_u32, c_i, c_i,
                                 c_u64, c_i, c_i, c_u64, c_f, c_i, c_u64,
                                 c_f, c_i, c_i, c_i]
    lib.cl_alt_tick.argtypes = [p_f, p_f, p_i, p_i, p_i]
    lib.cl_gates.argtypes = [p_i]
    lib.cl_hover_target_z_down.restype = c_f
    lib.cl_batt_sample.argtypes = [p_f]
    lib.cl_batt_sample.restype = c_i
    lib.cl_set_batt_sys.argtypes = [c_f, c_u64]
    lib.cl_batt_status.argtypes = [p_u16, c_u64, p_f, p_i, p_f, p_i, p_u64]
    lib.cl_sys_status.argtypes = [c_u32, c_u32, c_u32, ctypes.c_uint16,
                                  c_u64, p_i, p_f]
    lib.cl_ctrl_frame.argtypes = [c_u8, c_u32, c_u64]
    lib.cl_ctrl_frame.restype = c_i
    lib.cl_set_want_arm.argtypes = [c_i]
    lib.cl_filter_tick.argtypes = [p_f, p_f, p_f]
    return lib
