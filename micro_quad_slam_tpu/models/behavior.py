"""Branchless flight state machine — the reference's 50 Hz control_tick
(uav_local_nav.c:1866-2333) as a pure, jittable, batchable step function.

Ten states (WAIT_LINK..DISARMING, uav_local_nav.c:484-496), all timers in
int32 ms, every conditional a `jnp.where` so the whole machine vmaps over
thousands of virtual quads.  Sequencing matters and is preserved in SSA
form: enter_state side effects (uav_local_nav.c:1642-1698), command rate
limiters consumed in C call order (an earlier SET_MODE in the same tick
suppresses a later one, :699-715), the battery failsafe running before
the guards (:1875), the 2 Hz status print's observable vel_xy_stable call
(:1886-1889), and the switch dispatching on the post-guard state.

Fuzz-tested for exact trace equality against the stateful golden model
(micro_quad_slam_tpu/golden/behavior.py) in tests/test_behavior.py.

Telemetry is a dict of [B]-shaped arrays mirroring golden.Telemetry; the
FC side (arming, acks, spool-up) is produced by the log adapter or the
closed-loop simulator (models/simulator.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from micro_quad_slam_tpu.utils.config import PipelineConfig, UL_PROFILE

_F32 = np.float32

# states
ST_WAIT_LINK, ST_IDLE, ST_ARMING, ST_TAKEOFF, ST_LIFTOFF_ASSIST = 0, 1, 2, 3, 4
ST_HOVER, ST_EXPLORE, ST_TURNING, ST_LANDING, ST_DISARMING = 5, 6, 7, 8, 9
D_FRONT, D_RIGHT, D_BACK, D_LEFT = 0, 1, 2, 3
LANDED_ON_GROUND = 1
RES_ACCEPTED, RES_TEMP_REJECTED, RES_DENIED = 0, 1, 2
SENSOR_3D_GYRO = 0x01
SENSOR_Z_ALTITUDE_CONTROL = 0x2000
SENSOR_XY_POSITION_CONTROL = 0x4000
SENSOR_MOTOR_OUTPUTS = 0x400000
ALT_NONE, ALT_LPOS, ALT_RF, ALT_GND = 0, 1, 2, 3
CMD_NONE, CMD_VEL_BODY, CMD_VEL_NED, CMD_POS_YAW, CMD_ATT_THRUST, CMD_RC_OVERRIDE = (
    0, 1, 2, 3, 4, 5,
)
MODE_STABILIZE, MODE_GUIDED, MODE_LAND = 0, 4, 9
KF_TAKEOFF, KF_TURN_START, KF_TURN_END, KF_LAND_START = 1, 2, 4, 8
KF_LIFTOFF_AST, KF_MAP_RECENTER, KF_BATT_LAND, KF_BATT_EMERG = 16, 32, 64, 128

_STATE_FIELDS = [
    ("st", jnp.int32, 0),
    ("yaw_tv", bool, False),
    ("yaw_t", jnp.float32, 0.0),
    ("hover_valid", bool, False),
    ("hover_x", jnp.float32, np.nan),
    ("hover_y", jnp.float32, np.nan),
    ("hover_z", jnp.float32, np.nan),
    ("hover_yaw", jnp.float32, np.nan),
    ("hover_enter", jnp.int32, 0),
    ("turn_init", bool, False),
    ("turn_dir", jnp.int32, D_RIGHT),
    ("turn_target", jnp.float32, 0.0),
    ("turn_start", jnp.int32, 0),
    ("turn_forced", bool, False),
    ("forced_dir", jnp.int32, D_RIGHT),
    ("ceiling", bool, False),
    ("alt_est", jnp.float32, np.nan),
    ("alt_src", jnp.int32, ALT_NONE),
    ("to_sent", bool, False),
    ("to_sent_ms", jnp.int32, 0),
    ("to_no_vel_until", jnp.int32, 0),
    ("to_started", bool, False),
    ("to_started_ms", jnp.int32, 0),
    ("to_nsp", bool, False),
    ("ramp_active", bool, False),
    ("ramp_start", jnp.int32, 0),
    ("ramp_last", jnp.int32, 0),
    ("as_start", jnp.int32, 0),
    ("as_last", jnp.int32, 0),
    ("as_base", bool, False),
    ("as_mot0", jnp.float32, np.nan),
    ("as_warned", bool, False),
    ("land_sent", bool, False),
    ("land_sent_ms", jnp.int32, 0),
    ("b_low", jnp.int32, 0),
    ("b_emerg", jnp.int32, 0),
    ("b_warn", jnp.int32, 0),
    ("xy_since", jnp.int32, 0),
    ("lim_arm", jnp.int32, 0),
    ("lim_mode", jnp.int32, 0),
    ("lim_disarm", jnp.int32, 0),
    ("fr_eval", jnp.int32, 0),
    ("ex_pause", jnp.int32, 0),
    ("armed_prev", bool, False),
    ("kf", jnp.int32, 0),
    ("hb_last", jnp.int32, 0),
    ("print_last", jnp.int32, 0),
]


class BehaviorState(NamedTuple):
    st: jnp.ndarray
    yaw_tv: jnp.ndarray
    yaw_t: jnp.ndarray
    hover_valid: jnp.ndarray
    hover_x: jnp.ndarray
    hover_y: jnp.ndarray
    hover_z: jnp.ndarray
    hover_yaw: jnp.ndarray
    hover_enter: jnp.ndarray
    turn_init: jnp.ndarray
    turn_dir: jnp.ndarray
    turn_target: jnp.ndarray
    turn_start: jnp.ndarray
    turn_forced: jnp.ndarray
    forced_dir: jnp.ndarray
    ceiling: jnp.ndarray
    alt_est: jnp.ndarray
    alt_src: jnp.ndarray
    to_sent: jnp.ndarray
    to_sent_ms: jnp.ndarray
    to_no_vel_until: jnp.ndarray
    to_started: jnp.ndarray
    to_started_ms: jnp.ndarray
    to_nsp: jnp.ndarray
    ramp_active: jnp.ndarray
    ramp_start: jnp.ndarray
    ramp_last: jnp.ndarray
    as_start: jnp.ndarray
    as_last: jnp.ndarray
    as_base: jnp.ndarray
    as_mot0: jnp.ndarray
    as_warned: jnp.ndarray
    land_sent: jnp.ndarray
    land_sent_ms: jnp.ndarray
    b_low: jnp.ndarray
    b_emerg: jnp.ndarray
    b_warn: jnp.ndarray
    xy_since: jnp.ndarray
    lim_arm: jnp.ndarray
    lim_mode: jnp.ndarray
    lim_disarm: jnp.ndarray
    fr_eval: jnp.ndarray
    ex_pause: jnp.ndarray
    armed_prev: jnp.ndarray
    kf: jnp.ndarray
    hb_last: jnp.ndarray
    print_last: jnp.ndarray
    tof_filt: jnp.ndarray


def behavior_init(batch: int = 1) -> BehaviorState:
    vals = {}
    for name, dt, dv in _STATE_FIELDS:
        if dt is bool:
            vals[name] = jnp.full((batch,), dv, bool)
        else:
            vals[name] = jnp.full((batch,), dv, dt)
    vals["tof_filt"] = jnp.full((batch, 4), jnp.nan, jnp.float32)
    return BehaviorState(**vals)


def _wrap_deg(d):
    """wrap to [-180, 180) in float32 (uav_local_nav.c:585-589).  The C
    loops; two conditional folds cover any |d| < 540 which all call sites
    satisfy (inputs are wrapped headings plus +/-90/180 offsets)."""
    d = jnp.asarray(d, jnp.float32)
    d = jnp.where(d >= _F32(180.0), d - _F32(360.0), d)
    d = jnp.where(d >= _F32(180.0), d - _F32(360.0), d)
    d = jnp.where(d < _F32(-180.0), d + _F32(360.0), d)
    d = jnp.where(d < _F32(-180.0), d + _F32(360.0), d)
    return d


def behavior_step(state: BehaviorState, tm: dict,
                  cfg: PipelineConfig = UL_PROFILE):
    """One control tick for the whole batch.  tm: dict of [B] arrays with
    the golden.Telemetry fields.  Returns (BehaviorState, outputs dict)."""
    bh = cfg.behavior
    W = jnp.where
    S = dict(state._asdict())
    t = tm["t_ms"].astype(jnp.int32)
    B = t.shape

    O = {
        "cmd_kind": jnp.zeros(B, jnp.int32),
        "cmd": jnp.zeros(B + (4,), jnp.float32),
        "req_mode": jnp.full(B, -1, jnp.int32),
        "req_arm": jnp.full(B, -1, jnp.int32),
        "req_takeoff": jnp.full(B, jnp.nan, jnp.float32),
        "rc_release": jnp.zeros(B, bool),
        "clear_takeoff_ack": jnp.zeros(B, bool),
        "map_init": jnp.zeros(B, bool),
        "map_origin_x": jnp.full(B, jnp.nan, jnp.float32),
        "map_origin_y": jnp.full(B, jnp.nan, jnp.float32),
    }

    # ---- pure telemetry predicates ----
    sys_fresh = tm["have_sys"] & (t - tm["sys_last_ms"] < 1000)

    def bit_ok(bit):
        return (~sys_fresh) | ((tm["sys_health"] & bit) != 0)

    hard_nogo = sys_fresh & (~bit_ok(SENSOR_3D_GYRO) | ~bit_ok(SENSOR_MOTOR_OUTPUTS))
    z_ok = bit_ok(SENSOR_Z_ALTITUDE_CONTROL)
    xy_ok = bit_ok(SENSOR_XY_POSITION_CONTROL)
    of_fresh = tm["have_of"] & (t - tm["of_last_ms"] < 400)
    lpos_fresh = tm["have_lpos"] & (t - tm["lpos_last_ms"] < 400)
    rf_fresh = tm["have_rf"] & (t - tm["rf_last_ms"] < 400)
    batt_fresh = ((tm["batt_last_ms"] != 0) & (t - tm["batt_last_ms"] < 2000)
                  & jnp.isfinite(tm["batt_vpc"]) & (tm["batt_cells"] > 0))
    servo_fresh_250 = tm["have_servo"] & (t - tm["servo_last_ms"] < 250)
    servo_fresh_200 = tm["have_servo"] & (t - tm["servo_last_ms"] < 200)

    # ---- small state machines shared across call sites ----
    def enter(ns, cond):
        """enter_state (uav_local_nav.c:1642-1698) under a predicate."""
        c = cond & (S["st"] != ns)
        leave_assist = c & (S["st"] == ST_LIFTOFF_ASSIST)
        O["rc_release"] = O["rc_release"] | leave_assist
        if ns == ST_TAKEOFF:
            for k, v in (("to_sent", False), ("to_sent_ms", 0),
                         ("to_no_vel_until", 0), ("to_started", False),
                         ("to_started_ms", 0), ("to_nsp", False),
                         ("ramp_active", False), ("ramp_start", 0),
                         ("ramp_last", 0)):
                S[k] = W(c, jnp.asarray(v, S[k].dtype), S[k])
            O["clear_takeoff_ack"] = O["clear_takeoff_ack"] | c
            S["kf"] = W(c, S["kf"] | KF_TAKEOFF, S["kf"])
        if ns == ST_LIFTOFF_ASSIST:
            S["as_start"] = W(c, t, S["as_start"])
            S["as_last"] = W(c, 0, S["as_last"])
            S["as_base"] = W(c, False, S["as_base"])
            S["as_mot0"] = W(c, jnp.nan, S["as_mot0"])
            S["as_warned"] = W(c, False, S["as_warned"])
            S["kf"] = W(c, S["kf"] | KF_LIFTOFF_AST, S["kf"])
        if ns == ST_HOVER:
            S["hover_enter"] = W(c, t, S["hover_enter"])
            S["hover_valid"] = W(c, False, S["hover_valid"])
        if ns == ST_LANDING:
            S["land_sent"] = W(c, False, S["land_sent"])
            S["land_sent_ms"] = W(c, 0, S["land_sent_ms"])
            S["kf"] = W(c, S["kf"] | KF_LAND_START, S["kf"])
        leave_turning = c & (S["st"] == ST_TURNING)
        S["turn_init"] = W(leave_turning, False, S["turn_init"])
        S["kf"] = W(leave_turning, S["kf"] | KF_TURN_END, S["kf"])
        S["ex_pause"] = W(leave_turning, t + bh.post_turn_pause_ms, S["ex_pause"])
        if ns == ST_TURNING:
            S["kf"] = W(c, S["kf"] | KF_TURN_START, S["kf"])
        S["st"] = W(c, ns, S["st"])

    def emit_mode(mode, cond):
        can = cond & tm["have_fc"] & (t - S["lim_mode"] >= 800)
        S["lim_mode"] = W(can, t, S["lim_mode"])
        O["req_mode"] = W(can, mode, O["req_mode"])

    def emit_arm(cond):
        can = cond & tm["have_fc"] & (t - S["lim_arm"] >= 800)
        S["lim_arm"] = W(can, t, S["lim_arm"])
        O["req_arm"] = W(can, 1, O["req_arm"])

    def emit_disarm_force(cond):
        can = cond & tm["have_fc"] & (t - S["lim_disarm"] >= 800)
        S["lim_disarm"] = W(can, t, S["lim_disarm"])
        O["req_arm"] = W(can, 0, O["req_arm"])

    def set_cmd(cond, kind, a=0.0, b=0.0, c_=0.0, d=0.0):
        O["cmd_kind"] = W(cond, kind, O["cmd_kind"])
        vec = jnp.stack([jnp.broadcast_to(jnp.asarray(v, jnp.float32), B)
                         for v in (a, b, c_, d)], axis=-1)
        O["cmd"] = W(cond[..., None], vec, O["cmd"])

    def vel_xy_allowed():
        ok = xy_ok & tm["have_att"] & lpos_fresh
        ok &= ~(of_fresh & (tm["of_q"] < cfg.gates.of_min_quality))
        ok &= ~(jnp.isfinite(S["alt_est"]) & (S["alt_est"] < _F32(cfg.gates.xy_min_alt_m)))
        return ok

    def vel_xy_stable(callc):
        allowed = vel_xy_allowed()
        set0 = callc & allowed & (S["xy_since"] == 0)
        S["xy_since"] = W(set0, t, S["xy_since"])
        reset = callc & ~allowed
        S["xy_since"] = W(reset, 0, S["xy_since"])
        return (allowed & (S["xy_since"] != 0)
                & (t - S["xy_since"] >= cfg.gates.xy_stable_hold_ms))

    def yaw_hold_rate():
        err = _wrap_deg(S["yaw_t"] - tm["yaw_deg"])
        yr = jnp.clip(err * _F32(bh.yaw_hold_gain),
                      -_F32(bh.yaw_rate_dps), _F32(bh.yaw_rate_dps))
        return W(S["yaw_tv"] & tm["have_att"], yr, _F32(0.0))

    # ---------------- tick body (golden.step order) ----------------
    hb_due = t - S["hb_last"] >= 1000
    S["hb_last"] = W(hb_due, t, S["hb_last"])

    # update_alt_estimate (uav_local_nav.c:1440-1470)
    near_ground = tm["have_ext"] & (tm["landed_state"] == LANDED_ON_GROUND)
    rf_usable = rf_fresh & jnp.isfinite(tm["rf_m"])
    a_rf = jnp.clip(tm["rf_m"], 0.0, 10.0)
    a_lp = jnp.clip(tm["lpos_alt_filt"], 0.0, 10.0)
    alt = S["alt_est"]
    src = jnp.full(B, ALT_NONE, jnp.int32)
    alt = W(near_ground, _F32(0.0), alt)
    src = W(near_ground, ALT_GND, src)
    alt = W(lpos_fresh, a_lp, alt)
    src = W(lpos_fresh, ALT_LPOS, src)
    alt = W(rf_usable, a_rf, alt)
    src = W(rf_usable, ALT_RF, src)
    S["alt_est"] = alt
    S["alt_src"] = src
    ceilv = _F32(cfg.gates.ceil_m)
    S["ceiling"] = W(jnp.isfinite(alt) & (alt >= ceilv), True, S["ceiling"])
    S["ceiling"] = W(
        jnp.isfinite(alt) & (alt <= ceilv - _F32(cfg.gates.ceil_release_margin_m)),
        False, S["ceiling"])

    # tof EMA filter (uav_local_nav.c:1430-1438)
    mins = tm["tof_min"]
    a_ = _F32(cfg.tof.filt_alpha)
    blended = (_F32(1.0) - a_) * S["tof_filt"] + a_ * mins
    upd = jnp.where(jnp.isnan(S["tof_filt"]), mins, blended)
    S["tof_filt"] = jnp.where(jnp.isnan(mins), S["tof_filt"], upd)

    # battery_failsafe_tick (uav_local_nav.c:1797-1837)
    bt = cfg.battery
    on_gnd = batt_fresh & ~tm["fc_armed"]
    warn = on_gnd & tm["want_arm"] & (tm["batt_vpc"] < _F32(bt.arm_min_vpc)) \
        & (t - S["b_warn"] > bt.low_hold_ms)
    S["b_warn"] = W(warn, t, S["b_warn"])
    S["b_low"] = W(on_gnd, 0, S["b_low"])
    S["b_emerg"] = W(on_gnd, 0, S["b_emerg"])
    in_air_b = batt_fresh & tm["fc_armed"]
    emergv = in_air_b & (tm["batt_vpc"] < _F32(bt.emerg_vpc))
    S["b_emerg"] = W(emergv & (S["b_emerg"] == 0), t, S["b_emerg"])
    emerg_trip = emergv & (S["b_emerg"] != 0) & (t - S["b_emerg"] > bt.low_hold_ms)
    S["kf"] = W(emerg_trip, S["kf"] | KF_BATT_EMERG, S["kf"])
    if bt.land_actions_enabled:
        enter(ST_LANDING, emerg_trip & (S["st"] != ST_LANDING)
              & (S["st"] != ST_DISARMING))
    S["b_emerg"] = W(in_air_b & ~emergv, 0, S["b_emerg"])
    lowv = in_air_b & (tm["batt_vpc"] < _F32(bt.land_vpc))
    S["b_low"] = W(lowv & (S["b_low"] == 0), t, S["b_low"])
    low_trip = lowv & (S["b_low"] != 0) & (t - S["b_low"] > bt.low_hold_ms)
    S["kf"] = W(low_trip, S["kf"] | KF_BATT_LAND, S["kf"])
    if bt.land_actions_enabled:
        enter(ST_LANDING, low_trip & (S["st"] != ST_LANDING)
              & (S["st"] != ST_DISARMING))
    S["b_low"] = W(in_air_b & ~lowv, 0, S["b_low"])

    # 2 Hz status print's vel_xy_stable call (uav_local_nav.c:1886-1889)
    print_due = t - S["print_last"] >= 500
    S["print_last"] = W(print_due, t, S["print_last"])
    vel_xy_stable(print_due)

    # ---- guards; `done` short-circuits the rest of the tick ----
    no_fc = ~tm["have_fc"]
    enter(ST_WAIT_LINK, no_fc)
    done = no_fc

    ng = ~done & hard_nogo
    enter(ST_DISARMING, ng & tm["fc_armed"])
    enter(ST_IDLE, ng & ~tm["fc_armed"])
    done |= ng

    live = ~done
    unexp = (live & S["armed_prev"] & ~tm["fc_armed"] & tm["want_arm"]
             & (S["st"] != ST_LANDING) & (S["st"] != ST_DISARMING)
             & (S["st"] != ST_IDLE))
    enter(ST_IDLE, unexp)
    S["armed_prev"] = W(live, tm["fc_armed"], S["armed_prev"])

    enter(ST_DISARMING, live & ~tm["want_arm"] & tm["fc_armed"])

    ceil_override = live & S["ceiling"] & tm["fc_armed"]
    set_cmd(ceil_override, CMD_VEL_NED, 0.0, 0.0, _F32(bh.ceiling_descend_mps), 0.0)
    done |= ceil_override
    live = ~done

    # ---- switch on the post-guard state ----
    st0 = S["st"]

    enter(ST_IDLE, live & (st0 == ST_WAIT_LINK))

    # IDLE (uav_local_nav.c:2035-2042)
    idle = live & (st0 == ST_IDLE)
    batt_ok_arm = (~batt_fresh) | (tm["batt_vpc"] >= _F32(bt.arm_min_vpc))
    idle_go = idle & ~(tm["want_arm"] & ~batt_ok_arm)
    enter(ST_ARMING, idle_go & tm["want_arm"] & ~tm["fc_armed"])
    enter(ST_DISARMING, idle_go & ~tm["want_arm"] & tm["fc_armed"])
    enter(ST_TAKEOFF, idle_go & tm["want_arm"] & tm["fc_armed"])

    # ARMING (uav_local_nav.c:2044-2055)
    arming = live & (st0 == ST_ARMING)
    enter(ST_IDLE, arming & ~batt_ok_arm)
    arming_do = arming & batt_ok_arm & ~tm["fc_armed"]
    emit_mode(MODE_GUIDED, arming_do)
    emit_arm(arming_do)
    enter(ST_TAKEOFF, arming & batt_ok_arm & tm["fc_armed"])

    # TAKEOFF (uav_local_nav.c:2057-2169)
    tko = live & (st0 == ST_TAKEOFF)
    emit_mode(MODE_GUIDED, tko & (tm["hb_custom_mode"] != MODE_GUIDED))

    ack_rej = (tko & tm["have_takeoff_ack"] & (t - tm["takeoff_ack_ms"] < 2000)
               & ((tm["takeoff_ack_res"] == RES_DENIED)
                  | (tm["takeoff_ack_res"] == RES_TEMP_REJECTED)))
    enter(ST_LIFTOFF_ASSIST, ack_rej)
    tko &= ~ack_rej

    first_send = tko & ~S["to_sent"]
    O["req_takeoff"] = W(first_send, _F32(bh.takeoff_target_m), O["req_takeoff"])
    S["to_sent"] = W(first_send, True, S["to_sent"])
    S["to_sent_ms"] = W(first_send, t, S["to_sent_ms"])
    S["to_no_vel_until"] = W(first_send, t + bh.takeoff_no_vel_ms, S["to_no_vel_until"])
    retry = (tko & ~first_send & ~S["to_started"]
             & (t - S["to_sent_ms"] > bh.takeoff_retry_ms))
    O["req_takeoff"] = W(retry, _F32(bh.takeoff_target_m), O["req_takeoff"])
    S["to_sent_ms"] = W(retry, t, S["to_sent_ms"])
    S["to_no_vel_until"] = W(retry, t + bh.takeoff_no_vel_ms, S["to_no_vel_until"])

    mot_avg = W(servo_fresh_250, tm["motor_avg"], jnp.nan)
    mot_started = servo_fresh_250 & (mot_avg > _F32(bh.takeoff_mot_start_us))
    off_ground = (
        (tm["have_ext"] & (tm["landed_state"] != LANDED_ON_GROUND))
        | (rf_fresh & jnp.isfinite(tm["rf_m"]) & (tm["rf_m"] > _F32(bh.ramp_exit_m)))
        | (jnp.isfinite(S["alt_est"]) & (S["alt_est"] > _F32(bh.ramp_exit_m)))
    )
    start_now = tko & ~S["to_started"] & (mot_started | off_ground)
    S["to_started"] = W(start_now, True, S["to_started"])
    S["to_started_ms"] = W(start_now, t, S["to_started_ms"])

    ref = W(tm["takeoff_accept_ms"] != 0, tm["takeoff_accept_ms"], tm["takeoff_ack_ms"])
    ramp_trig = (tko & ~S["to_started"] & tm["have_takeoff_ack"]
                 & (tm["takeoff_ack_res"] == RES_ACCEPTED)
                 & ~S["ramp_active"] & ~S["to_nsp"] & (ref != 0)
                 & (t - ref >= bh.takeoff_start_check_ms)
                 & servo_fresh_250 & (mot_avg <= _F32(bh.takeoff_mot_start_us)))
    S["to_nsp"] = W(ramp_trig, True, S["to_nsp"])
    S["ramp_active"] = W(ramp_trig, True, S["ramp_active"])
    S["ramp_start"] = W(ramp_trig, t, S["ramp_start"])
    S["ramp_last"] = W(ramp_trig, 0, S["ramp_last"])

    ramping = tko & S["ramp_active"]
    cap_yaw = ramping & ~S["yaw_tv"] & tm["have_att"]
    S["yaw_tv"] = W(cap_yaw, True, S["yaw_tv"])
    S["yaw_t"] = W(cap_yaw, tm["yaw_deg"], S["yaw_t"])
    S["ramp_start"] = W(ramping & (S["ramp_start"] == 0), t, S["ramp_start"])
    ramp_send = ramping & (t - S["ramp_last"] >= bh.ramp_send_ms)
    S["ramp_last"] = W(ramp_send, t, S["ramp_last"])
    rdt = (t - S["ramp_start"]).astype(jnp.float32)
    u = jnp.clip(W(rdt >= bh.ramp_total_ms, _F32(1.0),
                   rdt / _F32(float(bh.ramp_total_ms))), 0.0, 1.0)
    thr = (_F32(1.0) - u) * _F32(bh.ramp_thr_min) + u * _F32(bh.ramp_thr_max)
    ryaw = W(S["yaw_tv"], S["yaw_t"], W(tm["have_att"], tm["yaw_deg"], _F32(0.0)))
    set_cmd(ramp_send, CMD_ATT_THRUST,
            jnp.minimum(jnp.maximum(thr, _F32(0.0)), _F32(bh.thrust_clamp)),
            ryaw, 0.0, 0.0)
    ramp_exit = ramping & (off_ground | (servo_fresh_250
                                         & (mot_avg > _F32(bh.takeoff_mot_start_us))))
    S["ramp_active"] = W(ramp_exit, False, S["ramp_active"])
    S["to_started"] = W(ramp_exit, True, S["to_started"])
    S["to_started_ms"] = W(ramp_exit, t, S["to_started_ms"])
    O["req_takeoff"] = W(ramp_exit, _F32(bh.takeoff_target_m), O["req_takeoff"])
    S["to_no_vel_until"] = W(ramp_exit, t + bh.takeoff_no_vel_ms, S["to_no_vel_until"])
    ramp_abort = (ramping & ~ramp_exit
                  & (t - S["ramp_start"] > bh.ramp_abort_ms))
    S["ramp_active"] = W(ramp_abort, False, S["ramp_active"])
    enter(ST_LIFTOFF_ASSIST, ramp_abort)
    tko &= ~ramping  # ramp branch breaks out of the TAKEOFF case

    z_stall = (tko & ~z_ok & ~S["to_started"]
               & jnp.isfinite(S["alt_est"]) & (S["alt_est"] < _F32(0.10))
               & (t - S["to_sent_ms"] > 1200))
    enter(ST_LIFTOFF_ASSIST, z_stall)
    tko &= ~z_stall

    stall = tko & ~S["to_started"] & (t - S["to_sent_ms"] > bh.takeoff_stall_ms)
    enter(ST_LIFTOFF_ASSIST, stall)
    tko &= ~stall

    at_alt = (tko & jnp.isfinite(S["alt_est"])
              & (S["alt_est"] >= _F32(bh.takeoff_target_m) - _F32(bh.takeoff_exit_margin_m)))
    S["yaw_tv"] = W(at_alt, tm["have_att"], S["yaw_tv"])
    S["yaw_t"] = W(at_alt, W(tm["have_att"], tm["yaw_deg"], _F32(0.0)), S["yaw_t"])
    enter(ST_HOVER, at_alt)

    # LIFTOFF_ASSIST (uav_local_nav.c:1738-1789)
    ast = live & (st0 == ST_LIFTOFF_ASSIST)
    emit_mode(MODE_STABILIZE, ast & (t - S["as_start"] < 150))
    base_now = ast & ~S["as_base"] & servo_fresh_200
    S["as_mot0"] = W(base_now, tm["motor_avg"], S["as_mot0"])
    S["as_base"] = W(base_now, True, S["as_base"])
    as_send = ast & (t - S["as_last"] >= bh.assist_send_period_ms)
    S["as_last"] = W(as_send, t, S["as_last"])
    adt = (t - S["as_start"]).astype(jnp.float32)
    au = jnp.clip(W(adt >= bh.assist_total_ms, _F32(1.0),
                    adt / _F32(float(bh.assist_total_ms))), 0.0, 1.0)
    athr = jnp.round((_F32(1.0) - au) * _F32(float(bh.assist_thr_us_min))
                     + au * _F32(float(bh.assist_thr_us_max)))
    set_cmd(as_send, CMD_RC_OVERRIDE, 1500.0, 1500.0, athr, 1500.0)
    warn_now = (ast & ~S["as_warned"] & S["as_base"]
                & (t - S["as_start"] > bh.assist_override_effect_ms)
                & servo_fresh_200 & jnp.isfinite(S["as_mot0"])
                & (tm["motor_avg"] - S["as_mot0"] < _F32(bh.assist_motor_delta_min)))
    S["as_warned"] = W(warn_now, True, S["as_warned"])
    as_exit = ast & jnp.isfinite(S["alt_est"]) & (S["alt_est"] > _F32(bh.assist_exit_alt_m))
    O["rc_release"] = O["rc_release"] | as_exit
    emit_mode(MODE_GUIDED, as_exit)
    O["req_takeoff"] = W(as_exit, _F32(bh.takeoff_target_m), O["req_takeoff"])
    enter(ST_TAKEOFF, as_exit)
    as_abort = ast & ~as_exit & (t - S["as_start"] > bh.assist_abort_ms)
    O["rc_release"] = O["rc_release"] | as_abort
    enter(ST_DISARMING, as_abort)

    # HOVER (uav_local_nav.c:2175-2202)
    hov = live & (st0 == ST_HOVER)
    cap = hov & ~S["yaw_tv"] & tm["have_att"]
    S["yaw_tv"] = W(cap, True, S["yaw_tv"])
    S["yaw_t"] = W(cap, tm["yaw_deg"], S["yaw_t"])
    xy_stable_h = vel_xy_stable(hov)
    hold_cap = (hov & xy_stable_h & ~S["hover_valid"] & lpos_fresh
                & tm["have_att"] & jnp.isfinite(S["alt_est"]))
    S["hover_x"] = W(hold_cap, tm["lpos_x"], S["hover_x"])
    S["hover_y"] = W(hold_cap, tm["lpos_y"], S["hover_y"])
    S["hover_z"] = W(hold_cap, -S["alt_est"], S["hover_z"])
    S["hover_yaw"] = W(hold_cap,
                       W(S["yaw_tv"], S["yaw_t"], tm["yaw_deg"]),
                       S["hover_yaw"])
    S["hover_valid"] = W(hold_cap, True, S["hover_valid"])
    pos_hold = hov & xy_stable_h & S["hover_valid"] & lpos_fresh & tm["have_att"]
    set_cmd(pos_hold, CMD_POS_YAW, S["hover_x"], S["hover_y"], S["hover_z"],
            S["hover_yaw"])
    zero_hold = hov & ~pos_hold
    set_cmd(zero_hold, CMD_VEL_BODY, 0.0, 0.0, 0.0, yaw_hold_rate())
    minit = hov & ~tm["map_inited"] & xy_stable_h & S["hover_valid"]
    O["map_init"] = O["map_init"] | minit
    O["map_origin_x"] = W(minit, S["hover_x"], O["map_origin_x"])
    O["map_origin_y"] = W(minit, S["hover_y"], O["map_origin_y"])
    if bh.explore_enabled and not bh.hover_test_only:
        # HOVER_TEST_ONLY `break` lands before this gate
        # (uav_local_nav.c:2196-2199)
        enter(ST_EXPLORE, hov & xy_stable_h
              & (t - S["hover_enter"] > bh.hover_explore_delay_ms))

    # EXPLORE (uav_local_nav.c:2204-2257)
    exp = live & (st0 == ST_EXPLORE)
    xy_stable_e = vel_xy_stable(exp)
    exp_hold = exp & (~xy_stable_e | (t < S["ex_pause"]))
    set_cmd(exp_hold, CMD_VEL_BODY, 0.0, 0.0, 0.0, yaw_hold_rate())
    exp_go = exp & ~exp_hold
    ffilt = S["tof_filt"][..., D_FRONT]
    front_close = exp_go & jnp.isfinite(ffilt) & (ffilt < _F32(bh.front_stop_m))
    S["turn_forced"] = W(front_close, False, S["turn_forced"])
    enter(ST_TURNING, front_close)
    exp_go &= ~front_close
    fr_due = (exp_go & tm["map_inited"] & lpos_fresh & tm["have_att"]
              & (t - S["fr_eval"] > bh.frontier_eval_ms))
    S["fr_eval"] = W(fr_due, t, S["fr_eval"])
    sF, sR = tm["frontier_f"], tm["frontier_r"]
    sL, sB = tm["frontier_l"], tm["frontier_b"]
    best = jnp.maximum(jnp.maximum(sF, sR), jnp.maximum(sL, sB))
    best_dir = jnp.full(B, D_FRONT, jnp.int32)
    best_dir = W(sR > sF, D_RIGHT, best_dir)
    best_dir = W(sL > jnp.maximum(sF, sR), D_LEFT, best_dir)
    best_dir = W(sB > jnp.maximum(jnp.maximum(sF, sR), sL), D_BACK, best_dir)
    side_dist = jnp.take_along_axis(
        S["tof_filt"], best_dir[..., None], axis=-1)[..., 0]
    fr_turn = (fr_due & (best_dir != D_FRONT) & (best > sF + bh.frontier_side_margin)
               & jnp.isfinite(side_dist) & (side_dist > _F32(bh.side_safe_m)))
    S["turn_forced"] = W(fr_turn, True, S["turn_forced"])
    S["forced_dir"] = W(fr_turn, best_dir, S["forced_dir"])
    enter(ST_TURNING, fr_turn)
    exp_go &= ~fr_turn
    set_cmd(exp_go, CMD_VEL_BODY, _F32(bh.fwd_vel_mps), 0.0, 0.0, yaw_hold_rate())

    # TURNING (uav_local_nav.c:2259-2296)
    trn = live & (st0 == ST_TURNING)
    init_now = trn & ~S["turn_init"]
    # choose_turn_dir_frontier (uav_local_nav.c:1715-1736)
    tf = S["tof_filt"]
    rr = W(jnp.isnan(tf[..., D_RIGHT]), _F32(0.0), tf[..., D_RIGHT])
    ll = W(jnp.isnan(tf[..., D_LEFT]), _F32(0.0), tf[..., D_LEFT])
    bb = W(jnp.isnan(tf[..., D_BACK]), _F32(0.0), tf[..., D_BACK])
    fsR = tm["frontier_r"] + (rr * _F32(bh.frontier_tof_bias)).astype(jnp.int32)
    fsL = tm["frontier_l"] + (ll * _F32(bh.frontier_tof_bias)).astype(jnp.int32)
    fsB = tm["frontier_b"] + (bb * _F32(bh.frontier_tof_bias)).astype(jnp.int32)
    fdir = jnp.full(B, D_RIGHT, jnp.int32)
    fdir = W(fsL > fsR, D_LEFT, fdir)
    fdir = W(fsB > jnp.maximum(fsR, fsL), D_BACK, fdir)
    # open_side_dir fallback (uav_local_nav.c:1700-1713)
    ob, od = jnp.full(B, _F32(-1.0), jnp.float32), jnp.full(B, D_RIGHT, jnp.int32)
    for val, dd in ((tf[..., D_RIGHT], D_RIGHT), (tf[..., D_LEFT], D_LEFT),
                    (tf[..., D_BACK], D_BACK)):
        better = jnp.isfinite(val) & (val > ob)
        ob = W(better, val, ob)
        od = W(better, dd, od)
    use_frontier = tm["map_inited"] & lpos_fresh & tm["have_att"]
    chosen = W(use_frontier, fdir, od)
    new_dir = W(S["turn_forced"], S["forced_dir"], chosen)
    S["turn_dir"] = W(init_now, new_dir, S["turn_dir"])
    S["turn_forced"] = W(init_now & S["turn_forced"], False, S["turn_forced"])
    cur = W(tm["have_att"], tm["yaw_deg"], _F32(0.0))
    delta = W(S["turn_dir"] == D_RIGHT, _F32(90.0),
              W(S["turn_dir"] == D_LEFT, _F32(-90.0), _F32(180.0)))
    S["turn_target"] = W(init_now, _wrap_deg(cur + delta), S["turn_target"])
    S["turn_start"] = W(init_now, t, S["turn_start"])
    S["turn_init"] = W(init_now, True, S["turn_init"])
    err = _wrap_deg(S["turn_target"] - cur)
    yr = jnp.clip(err * _F32(bh.turn_gain), -_F32(bh.yaw_rate_dps),
                  _F32(bh.yaw_rate_dps))
    set_cmd(trn, CMD_VEL_BODY, 0.0, 0.0, 0.0, yr)
    turn_done = trn & ((jnp.abs(err) < _F32(bh.turn_exit_err_deg))
                       | (t - S["turn_start"] > bh.turn_timeout_ms))
    S["yaw_tv"] = W(turn_done, True, S["yaw_tv"])
    S["yaw_t"] = W(turn_done, S["turn_target"], S["yaw_t"])
    S["turn_init"] = W(turn_done, False, S["turn_init"])
    enter(ST_EXPLORE, turn_done)

    # LANDING (uav_local_nav.c:2298-2317)
    lnd = live & (st0 == ST_LANDING)
    first_land = lnd & ~S["land_sent"]
    emit_mode(MODE_LAND, first_land)
    S["land_sent"] = W(first_land, True, S["land_sent"])
    S["land_sent_ms"] = W(first_land, t, S["land_sent_ms"])
    re_land = lnd & ~first_land & (t - S["land_sent_ms"] > 2000)
    emit_mode(MODE_LAND, re_land)
    S["land_sent_ms"] = W(re_land, t, S["land_sent_ms"])
    set_cmd(lnd, CMD_VEL_NED, 0.0, 0.0, _F32(bh.landing_descent_mps), 0.0)
    near_gnd = jnp.isfinite(S["alt_est"]) & (S["alt_est"] < _F32(bh.landing_near_ground_m))
    enter(ST_DISARMING, lnd & (near_gnd | (tm["have_ext"]
                                           & (tm["landed_state"] == LANDED_ON_GROUND))))

    # DISARMING (uav_local_nav.c:2319-2327)
    dis = live & (st0 == ST_DISARMING)
    emit_disarm_force(dis & tm["fc_armed"])
    enter(ST_IDLE, dis & ~tm["fc_armed"])

    new_state = BehaviorState(**S)
    O["state"] = S["st"]
    O["kf_flags"] = S["kf"]
    O["alt_est"] = S["alt_est"]
    O["alt_src"] = S["alt_src"]
    O["ceiling"] = S["ceiling"]
    return new_state, O


def drain_kf(state: BehaviorState):
    """Keyframe flags are drained into the next scanrec
    (uav_local_nav.c:1573); returns (state, flags)."""
    return state._replace(kf=jnp.zeros_like(state.kf)), state.kf
