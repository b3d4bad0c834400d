"""Compile the CLEAN binary's control_tick itself into a test-only lib.

Fourth extraction unit (after the UL pure-function shim, the CL helper
shim, and the UL control_tick shim): the clean revision's full behavior
layer — control_tick (clean_uav_fc_tof_nav.c:2339-2660) together with
enter_state + reason strings (clean:1957-2031), the prearm
hover_ready_stable gating (clean:2452-2462 via :1025-1036), the hover
stale-sensor failsafe (clean:2422-2442), the 10 Hz snapshot tick
(clean:2350-2357), the takeoff attitude ramp (clean:2097-2119), liftoff
assist (clean:2038-2095), the log-only battery failsafe
(clean:2122-2175), and ALL senders — extracted VERBATIM from the
read-only reference at build time (nothing vendored).

Shim boundary (same design as tools/refshim_ct.py):
  * mavlink pack/encode calls RECORD the emitted command instead of
    serializing — the per-tick command trace is the observable;
  * now_ms() reads an injected clock;
  * stdout is remapped to a NULL FILE* so the 10 Hz snapshot line and
    the pre-fail ring dump (both fprintf(stdout, ...), NULL-guarded in
    print_snap_line) stay silent; log files stay NULL;
  * rcmap params are marked known so control_tick does not interleave
    PARAM_REQUEST_READ bursts into the trace (D5 is modeled and tested
    separately in formats/mavlink.py).

Function-local statics (snapshot cadence, heartbeat, send throttles)
cannot be reset through the ABI, so the harness loads a FRESH COPY of
the .so per scenario (tests/test_control_tick_vs_c_cl.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

from tools.refshim import REF_C_CL, _compile, extract_sections

_SECTIONS_CT_CL = [
    (r"// -+ Logging paths", r"// -+ ToF frame"),
    (r"// -+ ToF frame -+", r"static uint8_t tof_rxbuf"),
    (r"// Last-good ToF frame", r"// -+ ToF processing"),
    (r"// -+ ToF processing", r"// -+ Stability-first"),
    (r"// -+ Stability-first params", r"// -+ MAVLink state"),
    (r"// -+ MAVLink state", r"// -+ Timing helpers"),
    (r"static float rad2deg", r"// -+ Logging Helper"),
    (r"// -+ MAVLink send", r"// -+ MAVLink decode handlers"),
    (r"// -+ Filtering -+", r"// -+ Logging -+"),
    (r"// -+ Logging -+", r"// -+ Behavior -+"),
    (r"// -+ Behavior -+", r"// -+ main -+"),
]

_PRELUDE_CT_CL = """
#include <stdint.h>
#include <stdbool.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <stdio.h>
#include <unistd.h>
#include <errno.h>
#define printf(...) ((void)0)
#define PRINT_HZ 1

/* silence the snapshot-ring console stream: print_snap_line(stdout,..)
   is NULL-guarded, fflush(NULL) legally flushes all streams */
static FILE* mqs_sink = NULL;
#define stdout mqs_sink

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
#define MAV_CMD_SET_MESSAGE_INTERVAL 511
#define MAV_FRAME_LOCAL_NED 1
#define MAV_FRAME_BODY_OFFSET_NED 7
#define MAV_LANDED_STATE_UNDEFINED 0
#define MAV_LANDED_STATE_ON_GROUND 1
#define MAV_LANDED_STATE_IN_AIR 2
#define MAV_LANDED_STATE_TAKEOFF 3
#define MAV_LANDED_STATE_LANDING 4
#define MAV_RESULT_ACCEPTED 0
#define MAV_SYS_STATUS_SENSOR_3D_GYRO 0x01u
#define MAV_SYS_STATUS_SENSOR_Z_ALTITUDE_CONTROL 0x2000u
#define MAV_SYS_STATUS_SENSOR_XY_POSITION_CONTROL 0x4000u
#define MAV_SYS_STATUS_SENSOR_MOTOR_OUTPUTS 0x400000u
#define MAVLINK_MSG_ID_SYS_STATUS 1
#define MAVLINK_MSG_ID_ATTITUDE 30
#define MAVLINK_MSG_ID_LOCAL_POSITION_NED 32
#define MAVLINK_MSG_ID_SERVO_OUTPUT_RAW 36
#define MAVLINK_MSG_ID_RC_CHANNELS 65
#define MAVLINK_MSG_ID_OPTICAL_FLOW 100
#define MAVLINK_MSG_ID_OPTICAL_FLOW_RAD 106
#define MAVLINK_MSG_ID_DISTANCE_SENSOR 132
#define MAVLINK_MSG_ID_BATTERY_STATUS 147
#define MAVLINK_MSG_ID_RANGEFINDER 173
#define MAVLINK_MSG_ID_EXTENDED_SYS_STATE 245

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
   5 att_target, 6 rc_override, 8 param_request_read */
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
static uint16_t mavlink_msg_param_request_read_pack(
    uint8_t s, uint8_t c, mavlink_message_t* m, uint8_t ts, uint8_t tc,
    const char* name, int16_t idx) {
  rec_new(8);
  (void)name; (void)idx;
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
"""

_EPILOGUE_CT_CL = """
/* ---- exported C ABI for the trace-equality harness ---- */
void clct_set_telem(const int64_t* I, const float* Fv) {
  have_fc = I[0] != 0;
  fc_armed = I[1] != 0;
  hb_custom_mode = (uint32_t)I[2];
  have_ext = I[3] != 0;
  landed_state = (uint8_t)I[4];
  have_sys = I[5] != 0;
  sys_last_ms = (uint64_t)I[6];
  sys_health = (uint32_t)I[7];
  sys_enabled = (uint32_t)I[8];
  have_servo = I[9] != 0;
  servo_last_ms = (uint64_t)I[10];
  for (int i = 0; i < 4; i++) servo_raw[i] = (uint16_t)I[11];
  batt_cells = (int)I[12];
  batt_last_ms = (uint64_t)I[13];
  batt_valid = I[14] != 0;
  have_lpos = I[15] != 0;
  lpos_last_update_ms = (uint64_t)I[16];
  have_att = I[17] != 0;
  have_of = I[18] != 0;
  of_last_update_ms = (uint64_t)I[19];
  of_quality = (uint8_t)I[20];
  have_rangefinder = I[21] != 0;
  rangefinder_last_update_ms = (uint64_t)I[22];
  want_arm = I[23] != 0;
  have_takeoff_ack = I[24] != 0;
  rcmap_known = true;            /* D5 modeled separately; keep the
                                    PARAM_REQUEST bursts out of the trace */
  batt_vpc = Fv[0];
  batt_v_total = Fv[1];
  lpos_x_m = Fv[2];
  lpos_y_m = Fv[3];
  lpos_alt_filt_m = Fv[4];
  yaw_rad = deg2rad(Fv[5]);
  rangefinder_m = Fv[6];
  for (int i = 0; i < 4; i++) tof_min_m[i] = Fv[7 + i];
}

void clct_tick(uint64_t t, int64_t* oi, float* of_, float* recs,
               int64_t* nrec) {
  stub_now_ms = t;
  rec_n = 0;
  control_tick();
  oi[0] = (int64_t)st;
  oi[1] = (int64_t)pending_kf_flags;
  oi[2] = hover_xy_locked ? 1 : 0;
  oi[3] = (int64_t)alt_src;
  oi[4] = ceiling_active ? 1 : 0;
  oi[5] = have_yaw_target ? 1 : 0;
  oi[6] = have_takeoff_ack ? 1 : 0;   /* enter TAKEOFF clears the latch */
  oi[7] = hover_xy_prelock_valid ? 1 : 0;
  of_[0] = alt_est_m;
  of_[1] = alt_max_m;
  of_[2] = yaw_target_deg;
  of_[3] = hover_lock_x_m;
  of_[4] = hover_lock_y_m;
  memcpy(recs, rec_buf, sizeof(rec_buf));
  *nrec = rec_n;
}
"""


def build_shim_ct_cl(out_dir: Optional[str] = None) -> Optional[str]:
    """Extract + compile the clean control_tick shim; returns .so path."""
    if not os.path.exists(REF_C_CL):
        return None
    return _compile(
        _PRELUDE_CT_CL + extract_sections(REF_C_CL, _SECTIONS_CT_CL)
        + _EPILOGUE_CT_CL, out_dir, "clct")


def load_shim_ct_cl(so_path: str, fresh: bool = True) -> ctypes.CDLL:
    """Fresh-copy dlopen (statics cannot be reset through the ABI;
    dlopen caches by path — same mechanism as refshim_ct.load_shim_ct)."""
    import shutil
    import tempfile

    if fresh:
        fd, copy_path = tempfile.mkstemp(suffix=".so", prefix="mqs_clct_")
        os.close(fd)
        shutil.copy(so_path, copy_path)
        so_path = copy_path
    lib = ctypes.CDLL(so_path)
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_f = ctypes.POINTER(ctypes.c_float)
    lib.clct_set_telem.argtypes = [p_i64, p_f]
    lib.clct_tick.argtypes = [ctypes.c_uint64, p_i64, p_f, p_f, p_i64]
    return lib
