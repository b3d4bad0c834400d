"""Compile the reference's control_tick itself into a test-only shared lib.

Third extraction unit (after tools/refshim.py's UL pure-function shim and
the CL shim): the ~500-LoC heart of L2 — control_tick
(uav_local_nav.c:1866-2333) together with enter_state, the per-state
ticks (hover hold, liftoff assist, battery failsafe, takeoff helpers,
choose_turn_dir), the gating stack, and ALL send_* helpers — extracted
VERBATIM out of the read-only reference at build time (nothing vendored).

The impure boundary is shimmed, not rewritten:
  * mavlink pack/encode calls are stand-ins that RECORD the emitted
    command (kind + params) instead of serializing bytes — the recorded
    per-tick command trace is the observable the golden machine is
    diffed against;
  * now_ms() reads an injected clock;
  * the mapping layer (occ_grid algorithms) is stubbed — it is
    machine-checked separately by the UL shim — with frontier_score_dir
    returning INJECTED per-direction scores, exactly how the golden
    machine consumes frontier scores from its telemetry snapshot;
  * log files stay NULL (every write is `if (fp)`-guarded in the C) and
    scan_new stays false, so log_tick's mapping branch never runs.

Telemetry globals are set per tick through one exported setter — the
same per-tick snapshot semantics the golden machine's Telemetry models.

Function-local statics (heartbeat cadence, print timers) cannot be reset
through the C ABI, so the fuzz harness loads a FRESH COPY of the .so per
scenario (tests/test_control_tick_vs_c.py).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import tempfile
from typing import Optional

from tools.refshim import REF_C, _compile, extract_sections

_SECTIONS_CT = [
    (r"// -+ Logging paths", r"// -+ ToF frame"),
    (r"// -+ ToF frame -+", r"static uint8_t tof_rxbuf"),
    (r"// Last-good ToF frame", r"// -+ Mapping"),
    (r"// Keyframe flags", r"static void raycast_update"),
    (r"// -+ MAVLink state", r"// -+ State machine"),
    (r"// -+ State machine", r"// -+ Timing helpers"),
    (r"static float rad2deg", r"// -+ UART open"),
    (r"// -+ MAVLink send", r"// -+ Requests"),
    (r"// -+ Filtering -+", r"// -+ Logging \(pose \+ scans\)"),
    (r"// -+ Logging \(pose \+ scans\)", r"// -+ Behavior -+"),
    (r"// -+ Behavior -+", r"// -+ main -+"),
]

_PRELUDE_CT = """
#include <stdint.h>
#include <stdbool.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <stdio.h>
#include <unistd.h>
#include <errno.h>
#define printf(...) ((void)0)
#define PRINT_HZ 2

/* ---- MAVLink constants the extracted text references ---- */
#define MAVLINK_MAX_PACKET_LEN 280
#define MAV_COMP_ID_ONBOARD_COMPUTER 191
#define MAV_TYPE_ONBOARD_CONTROLLER 18
#define MAV_AUTOPILOT_INVALID 8
#define MAV_STATE_ACTIVE 4
#define MAV_MODE_FLAG_CUSTOM_MODE_ENABLED 1
#define MAV_CMD_DO_SET_MODE 176
#define MAV_CMD_NAV_TAKEOFF 22
#define MAV_CMD_COMPONENT_ARM_DISARM 400
#define MAV_FRAME_LOCAL_NED 1
#define MAV_FRAME_BODY_OFFSET_NED 7
#define MAV_LANDED_STATE_UNDEFINED 0
#define MAV_LANDED_STATE_ON_GROUND 1
#define MAV_LANDED_STATE_IN_AIR 2
#define MAV_LANDED_STATE_TAKEOFF 3
#define MAV_LANDED_STATE_LANDING 4
#define MAV_RESULT_ACCEPTED 0
#define MAV_RESULT_TEMPORARILY_REJECTED 1
#define MAV_RESULT_DENIED 2
#define MAV_SYS_STATUS_SENSOR_3D_GYRO 0x01u
#define MAV_SYS_STATUS_SENSOR_Z_ALTITUDE_CONTROL 0x2000u
#define MAV_SYS_STATUS_SENSOR_XY_POSITION_CONTROL 0x4000u
#define MAV_SYS_STATUS_SENSOR_MOTOR_OUTPUTS 0x400000u

/* ---- command recorder: pack/encode stand-ins ---- */
typedef struct { int _x; } mavlink_message_t;
typedef struct {
  uint32_t time_boot_ms;
  float q[4];
  float body_roll_rate, body_pitch_rate, body_yaw_rate, thrust;
  uint8_t target_system, target_component;
  uint8_t type_mask;
} mavlink_set_attitude_target_t;
typedef struct {
  uint16_t chan1_raw, chan2_raw, chan3_raw, chan4_raw;
  uint16_t chan5_raw, chan6_raw, chan7_raw, chan8_raw;
  uint8_t target_system, target_component;
} mavlink_rc_channels_override_t;

#define REC_MAX 64
#define REC_W 13
/* kinds: 1 command_long, 2 heartbeat, 3 set_mode, 4 pos_target,
   5 att_target, 6 rc_override, 7 request_data_stream */
static float rec_buf[REC_MAX][REC_W];
static int rec_n = 0;
static float* rec_new(int kind) {
  float* r = rec_buf[rec_n < REC_MAX ? rec_n++ : REC_MAX - 1];
  memset(r, 0, REC_W * sizeof(float));
  r[0] = (float)kind;
  return r;
}
static uint16_t mavlink_msg_command_long_pack(
    uint8_t s, uint8_t c, mavlink_message_t* m, uint8_t ts, uint8_t tc,
    uint16_t cmd, uint8_t conf, float p1, float p2, float p3, float p4,
    float p5, float p6, float p7) {
  float* r = rec_new(1);
  r[1] = (float)cmd; r[2] = p1; r[3] = p2; r[4] = p3; r[5] = p4;
  r[6] = p5; r[7] = p6; r[8] = p7;
  (void)s; (void)c; (void)m; (void)ts; (void)tc; (void)conf;
  return 0;
}
static uint16_t mavlink_msg_request_data_stream_pack(
    uint8_t s, uint8_t c, mavlink_message_t* m, uint8_t ts, uint8_t tc,
    uint8_t sid, uint16_t rate, uint8_t go) {
  float* r = rec_new(7);
  r[1] = sid; r[2] = rate; r[3] = go;
  return 0;
}
static uint16_t mavlink_msg_heartbeat_pack(
    uint8_t s, uint8_t c, mavlink_message_t* m, uint8_t type, uint8_t ap,
    uint8_t bm, uint32_t cm, uint8_t state_) {
  rec_new(2);
  return 0;
}
static uint16_t mavlink_msg_set_mode_pack(
    uint8_t s, uint8_t c, mavlink_message_t* m, uint8_t ts, uint8_t base,
    uint32_t custom) {
  float* r = rec_new(3);
  r[1] = (float)base; r[2] = (float)custom;
  return 0;
}
static uint16_t mavlink_msg_set_position_target_local_ned_pack(
    uint8_t s, uint8_t c, mavlink_message_t* m, uint32_t tms, uint8_t ts,
    uint8_t tc, uint8_t frame, uint16_t mask, float x, float y, float z,
    float vx, float vy, float vz, float ax, float ay, float az,
    float yaw, float yr) {
  float* r = rec_new(4);
  r[1] = (float)frame; r[2] = (float)mask; r[3] = x; r[4] = y; r[5] = z;
  r[6] = vx; r[7] = vy; r[8] = vz; r[9] = yaw; r[10] = yr;
  return 0;
}
static uint16_t mavlink_msg_set_attitude_target_encode(
    uint8_t s, uint8_t c, mavlink_message_t* m,
    const mavlink_set_attitude_target_t* a) {
  float* r = rec_new(5);
  r[1] = a->thrust; r[2] = a->q[0]; r[3] = a->q[1]; r[4] = a->q[2];
  r[5] = a->q[3]; r[6] = (float)a->type_mask;
  return 0;
}
static uint16_t mavlink_msg_rc_channels_override_encode(
    uint8_t s, uint8_t c, mavlink_message_t* m,
    const mavlink_rc_channels_override_t* o) {
  float* r = rec_new(6);
  r[1] = (float)o->chan1_raw; r[2] = (float)o->chan2_raw;
  r[3] = (float)o->chan3_raw; r[4] = (float)o->chan4_raw;
  return 0;
}
static uint16_t mavlink_msg_to_send_buffer(uint8_t* buf,
                                           const mavlink_message_t* m) {
  (void)buf; (void)m;
  return 0;
}

/* ---- injected clock ---- */
static uint64_t stub_now_ms;
static uint64_t now_ms(void) { return stub_now_ms; }

/* ---- mapping layer stub: the grid ALGORITHMS are machine-checked by
   the UL shim; here frontier scores are injected per tick, exactly how
   the golden machine consumes them from its telemetry snapshot ---- */
#define MAP_RES_M 0.10f
#define MAP_W 500
#define MAP_H 500
static int8_t occ_grid[MAP_W * MAP_H];
static bool   map_inited = false;
static float  map_origin_x = NAN;
static float  map_origin_y = NAN;
static int frontier_inject[4];  /* offsets 0, +90, -90, 180 */
static int frontier_score_dir(float x, float y, float yaw, float off) {
  (void)x; (void)y; (void)yaw;
  if (off == 0.0f)   return frontier_inject[0];
  if (off == 90.0f)  return frontier_inject[1];
  if (off == -90.0f) return frontier_inject[2];
  return frontier_inject[3];
}
static void map_recentre_if_needed(float x, float y) { (void)x; (void)y; }
static void map_update_from_beams(float x, float y, float yaw) {
  (void)x; (void)y; (void)yaw;
}
"""

_EPILOGUE_CT = """
/* ---- exported C ABI for the trace-equality harness ---- */
void ct_set_telem(const int64_t* I, const float* Fv) {
  have_fc = I[0] != 0;
  fc_armed = I[1] != 0;
  hb_custom_mode = (uint32_t)I[2];
  have_ext = I[3] != 0;
  landed_state = (uint8_t)I[4];
  have_sys = I[5] != 0;
  sys_last_ms = (uint64_t)I[6];
  sys_health = (uint32_t)I[7];
  have_servo = I[8] != 0;
  servo_last_ms = (uint64_t)I[9];
  for (int i = 0; i < 4; i++) servo_raw[i] = (uint16_t)I[10];
  batt_cells = (int)I[11];
  batt_last_ms = (uint64_t)I[12];
  have_lpos = I[13] != 0;
  lpos_last_update_ms = (uint64_t)I[14];
  have_att = I[15] != 0;
  have_of = I[16] != 0;
  of_last_update_ms = (uint64_t)I[17];
  of_quality = (uint8_t)I[18];
  have_rangefinder = I[19] != 0;
  rangefinder_last_update_ms = (uint64_t)I[20];
  want_arm = I[21] != 0;
  have_takeoff_ack = I[22] != 0;
  takeoff_ack_res = (uint8_t)I[23];
  takeoff_ack_ms = (uint64_t)I[24];
  takeoff_accept_ms = (uint64_t)I[25];
  map_inited = I[26] != 0;
  frontier_inject[0] = (int)I[27];
  frontier_inject[1] = (int)I[28];
  frontier_inject[2] = (int)I[29];
  frontier_inject[3] = (int)I[30];
  batt_vpc = Fv[0];
  batt_v_total = Fv[1];
  lpos_x_m = Fv[2];
  lpos_y_m = Fv[3];
  lpos_alt_filt_m = Fv[4];
  yaw_rad = deg2rad(Fv[5]);
  rangefinder_m = Fv[6];
  for (int i = 0; i < 4; i++) tof_min_m[i] = Fv[7 + i];
}

void ct_tick(uint64_t t, int64_t* oi, float* of_, float* recs,
             int64_t* nrec) {
  stub_now_ms = t;
  rec_n = 0;
  control_tick();
  oi[0] = (int64_t)st;
  oi[1] = (int64_t)pending_kf_flags;
  oi[2] = map_inited ? 1 : 0;
  oi[3] = (int64_t)alt_src;
  oi[4] = ceiling_active ? 1 : 0;
  oi[5] = have_yaw_target ? 1 : 0;
  oi[6] = have_takeoff_ack ? 1 : 0;   /* enter TAKEOFF clears the latch */
  of_[0] = alt_est_m;
  of_[1] = map_origin_x;
  of_[2] = map_origin_y;
  of_[3] = yaw_target_deg;
  memcpy(recs, rec_buf, sizeof(rec_buf));
  *nrec = rec_n;
}
"""


def build_shim_ct(out_dir: Optional[str] = None) -> Optional[str]:
    """Extract + compile the control_tick shim; returns the .so path."""
    if not os.path.exists(REF_C):
        return None
    return _compile(
        _PRELUDE_CT + extract_sections(REF_C, _SECTIONS_CT) + _EPILOGUE_CT,
        out_dir, "ct")


def load_shim_ct(so_path: str, fresh: bool = True) -> ctypes.CDLL:
    """Load the shim.  fresh=True dlopens a unique COPY so every load
    gets pristine static state (function-local statics cannot be reset
    through the ABI; dlopen caches by path)."""
    if fresh:
        fd, copy_path = tempfile.mkstemp(suffix=".so", prefix="mqs_ct_")
        os.close(fd)
        shutil.copy(so_path, copy_path)
        so_path = copy_path
    lib = ctypes.CDLL(so_path)
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_f = ctypes.POINTER(ctypes.c_float)
    lib.ct_set_telem.argtypes = [p_i64, p_f]
    lib.ct_tick.argtypes = [ctypes.c_uint64, p_i64, p_f, p_f, p_i64]
    return lib
