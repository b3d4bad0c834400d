"""Branchless CLEAN-revision flight state machine (clean_uav_fc_tof_nav.c)
— the 8-state hover-only twin of models/behavior.py, batchable and
jittable, fuzz-tested for exact trace equality against
golden/behavior_cl.py.

See that module's docstring for the semantic differences from the UL
machine (defensive altitude estimation with alt_max, enabled-bit-aware
health gates, prelock/lock hover with Z-only streaming, prearm readiness
gating, delayed attitude thrust ramp, immediate force-disarm on user
abort, stale-sensor hysteresis, log-only battery failsafe).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from micro_quad_slam_tpu.models.behavior import (
    ALT_GND,
    ALT_LPOS,
    ALT_NONE,
    ALT_RF,
    CMD_ATT_THRUST,
    CMD_POS_YAW,
    CMD_VEL_NED,
    LANDED_ON_GROUND,
    MODE_GUIDED,
    MODE_LAND,
    SENSOR_3D_GYRO,
    SENSOR_MOTOR_OUTPUTS,
    SENSOR_XY_POSITION_CONTROL,
    SENSOR_Z_ALTITUDE_CONTROL,
)
from micro_quad_slam_tpu.utils.config import CL_PROFILE, PipelineConfig

_F32 = np.float32

CL_WAIT_LINK, CL_IDLE, CL_ARMING, CL_TAKEOFF = 0, 1, 2, 3
CL_LIFTOFF_ASSIST, CL_HOVER, CL_LANDING, CL_DISARMING = 4, 5, 6, 7
CMD_Z_YAW = 6
CL_KF_TAKEOFF, CL_KF_LAND_START, CL_KF_LIFTOFF_AST = 1, 2, 4
CL_KF_BATT_LAND, CL_KF_BATT_EMERG = 8, 16

_FIELDS = [
    ("st", jnp.int32, 0), ("yaw_tv", bool, False), ("yaw_t", jnp.float32, 0.0),
    ("alt_max", jnp.float32, np.nan), ("alt_est", jnp.float32, np.nan),
    ("alt_src", jnp.int32, ALT_NONE), ("ceiling", bool, False),
    ("hv_locked", bool, False), ("hv_pre_valid", bool, False),
    ("hv_pre_x", jnp.float32, 0.0), ("hv_pre_y", jnp.float32, 0.0),
    ("hv_lock_x", jnp.float32, 0.0), ("hv_lock_y", jnp.float32, 0.0),
    ("prearm_since", jnp.int32, 0),
    ("to_sent", bool, False), ("to_sent_ms", jnp.int32, 0),
    ("to_started", bool, False), ("to_started_ms", jnp.int32, 0),
    ("to_alt0", jnp.float32, np.nan),
    ("ramp_active", bool, False), ("ramp_start", jnp.int32, 0),
    ("ramp_last", jnp.int32, 0),
    ("as_start", jnp.int32, 0), ("as_last", jnp.int32, 0),
    ("as_base", bool, False), ("as_mot0", jnp.float32, np.nan),
    ("as_warned", bool, False),
    ("land_sent", bool, False), ("land_sent_ms", jnp.int32, 0),
    ("b_low", jnp.int32, 0), ("b_emerg", jnp.int32, 0), ("b_warn", jnp.int32, 0),
    ("xy_since", jnp.int32, 0),
    ("lim_arm", jnp.int32, 0), ("lim_mode", jnp.int32, 0),
    ("lim_disarm", jnp.int32, 0),
    ("lpos_stale", jnp.int32, 0), ("rf_stale", jnp.int32, 0),
    ("alt_stale", jnp.int32, 0),
    ("armed_prev", bool, False), ("kf", jnp.int32, 0),
    ("hb_last", jnp.int32, 0), ("snap_last", jnp.int32, 0),
]


class BehaviorClState(NamedTuple):
    st: jnp.ndarray
    yaw_tv: jnp.ndarray
    yaw_t: jnp.ndarray
    alt_max: jnp.ndarray
    alt_est: jnp.ndarray
    alt_src: jnp.ndarray
    ceiling: jnp.ndarray
    hv_locked: jnp.ndarray
    hv_pre_valid: jnp.ndarray
    hv_pre_x: jnp.ndarray
    hv_pre_y: jnp.ndarray
    hv_lock_x: jnp.ndarray
    hv_lock_y: jnp.ndarray
    prearm_since: jnp.ndarray
    to_sent: jnp.ndarray
    to_sent_ms: jnp.ndarray
    to_started: jnp.ndarray
    to_started_ms: jnp.ndarray
    to_alt0: jnp.ndarray
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
    lpos_stale: jnp.ndarray
    rf_stale: jnp.ndarray
    alt_stale: jnp.ndarray
    armed_prev: jnp.ndarray
    kf: jnp.ndarray
    hb_last: jnp.ndarray
    snap_last: jnp.ndarray
    tof_filt: jnp.ndarray


def behavior_cl_init(batch: int = 1) -> BehaviorClState:
    vals = {}
    for name, dt, dv in _FIELDS:
        vals[name] = (jnp.full((batch,), dv, bool) if dt is bool
                      else jnp.full((batch,), dv, dt))
    vals["tof_filt"] = jnp.full((batch, 4), jnp.nan, jnp.float32)
    return BehaviorClState(**vals)


def behavior_step_cl(state: BehaviorClState, tm: dict,
                     cfg: PipelineConfig = CL_PROFILE):
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

    sys_fresh = tm["have_sys"] & (t - tm["sys_last_ms"] < 1000)

    def bit_ok(bit):
        return (~sys_fresh) | ((tm["sys_health"] & bit) != 0)

    def bit_ok_enabled(bit):
        en = (tm["sys_enabled"] & bit) != 0
        return (~sys_fresh) | (~en) | bit_ok(bit)

    hard_nogo = sys_fresh & (
        ~bit_ok(SENSOR_3D_GYRO)
        | (((tm["sys_enabled"] & SENSOR_MOTOR_OUTPUTS) != 0)
           & ~bit_ok(SENSOR_MOTOR_OUTPUTS)))
    z_ok = bit_ok_enabled(SENSOR_Z_ALTITUDE_CONTROL)
    xy_ok = bit_ok_enabled(SENSOR_XY_POSITION_CONTROL)
    of_fresh = tm["have_of"] & (t - tm["of_last_ms"] < 400)
    lpos_fresh = tm["have_lpos"] & (t - tm["lpos_last_ms"] < 400)
    rf_fresh = tm["have_rf"] & (t - tm["rf_last_ms"] < 400)
    bt = cfg.battery
    # the intake validity LATCH (clean:158,1291-1294): maintained by the
    # telemetry adapter/mock exactly like handle_battery_status — the CL
    # tick gates on the flag alone, no per-tick freshness re-check
    batt_valid = tm["batt_valid"]
    servo_fresh_250 = tm["have_servo"] & (t - tm["servo_last_ms"] < 250)
    servo_fresh_200 = tm["have_servo"] & (t - tm["servo_last_ms"] < 200)

    def enter(ns, cond):
        """enter_state (clean:1957-2031) under a predicate."""
        c = cond & (S["st"] != ns)
        hv_reset = c & ((S["st"] == CL_HOVER) | (ns == CL_HOVER))
        for k in ("hv_locked", "hv_pre_valid"):
            S[k] = W(hv_reset, False, S[k])
        for k in ("hv_pre_x", "hv_pre_y", "hv_lock_x", "hv_lock_y"):
            S[k] = W(hv_reset, 0.0, S[k])
        if ns == CL_TAKEOFF:
            S["to_sent"] = W(c, False, S["to_sent"])
            S["to_sent_ms"] = W(c, 0, S["to_sent_ms"])
            O["clear_takeoff_ack"] = O["clear_takeoff_ack"] | c
            S["to_started"] = W(c, False, S["to_started"])
            S["to_started_ms"] = W(c, 0, S["to_started_ms"])
            S["ramp_active"] = W(c, False, S["ramp_active"])
            S["ramp_start"] = W(c, 0, S["ramp_start"])
            S["to_alt0"] = W(c, S["alt_max"], S["to_alt0"])
            S["kf"] = W(c, S["kf"] | CL_KF_TAKEOFF, S["kf"])
        if ns == CL_LIFTOFF_ASSIST:
            S["as_start"] = W(c, t, S["as_start"])
            S["as_last"] = W(c, 0, S["as_last"])
            S["as_base"] = W(c, False, S["as_base"])
            S["as_mot0"] = W(c, jnp.nan, S["as_mot0"])
            S["as_warned"] = W(c, False, S["as_warned"])
            S["kf"] = W(c, S["kf"] | CL_KF_LIFTOFF_AST, S["kf"])
        if ns == CL_LANDING:
            S["land_sent"] = W(c, False, S["land_sent"])
            S["land_sent_ms"] = W(c, 0, S["land_sent_ms"])
            S["kf"] = W(c, S["kf"] | CL_KF_LAND_START, S["kf"])
        S["st"] = W(c, ns, S["st"])

    def emit_mode(mode, cond):
        # clean set_mode_custom: same-mode suppression BEFORE the rate
        # limit (clean:607-608); the UL variant lacks it
        can = (cond & tm["have_fc"] & (tm["hb_custom_mode"] != mode)
               & (t - S["lim_mode"] >= 800))
        S["lim_mode"] = W(can, t, S["lim_mode"])
        O["req_mode"] = W(can, mode, O["req_mode"])

    def emit_arm(cond):
        can = cond & tm["have_fc"] & (t - S["lim_arm"] >= 800)
        S["lim_arm"] = W(can, t, S["lim_arm"])
        O["req_arm"] = W(can, 1, O["req_arm"])

    def emit_disarm_force(cond, bypass=None):
        if bypass is not None:
            S["lim_disarm"] = W(bypass, 0, S["lim_disarm"])
        can = cond & tm["have_fc"] & (t - S["lim_disarm"] >= 800)
        S["lim_disarm"] = W(can, t, S["lim_disarm"])
        O["req_arm"] = W(can, 0, O["req_arm"])

    def set_cmd(cond, kind, a=0.0, b=0.0, c_=0.0, d=0.0):
        O["cmd_kind"] = W(cond, kind, O["cmd_kind"])
        vec = jnp.stack([jnp.broadcast_to(jnp.asarray(v, jnp.float32), B)
                         for v in (a, b, c_, d)], axis=-1)
        O["cmd"] = W(cond[..., None], vec, O["cmd"])

    def vel_xy_stable(callc):
        allowed = xy_ok & tm["have_att"] & lpos_fresh
        allowed &= ~(of_fresh & (tm["of_q"] < cfg.gates.of_min_quality))
        allowed &= ~(jnp.isfinite(S["alt_max"])
                     & (S["alt_max"] < _F32(cfg.gates.xy_min_alt_m)))
        set0 = callc & allowed & (S["xy_since"] == 0)
        S["xy_since"] = W(set0, t, S["xy_since"])
        S["xy_since"] = W(callc & ~allowed, 0, S["xy_since"])
        return (allowed & (S["xy_since"] != 0)
                & (t - S["xy_since"] >= cfg.gates.xy_stable_hold_ms))

    # ---------------- tick body (golden CL step order) ----------------
    hb_due = t - S["hb_last"] >= 1000
    S["hb_last"] = W(hb_due, t, S["hb_last"])

    # defensive altitude estimation (clean:1710-1782)
    near_ground = tm["have_ext"] & (tm["landed_state"] == LANDED_ON_GROUND)
    lp_ok = lpos_fresh & jnp.isfinite(tm["lpos_alt_filt"])
    a_lp = jnp.clip(tm["lpos_alt_filt"], -1.0, 50.0)
    rf_ok0 = rf_fresh & jnp.isfinite(tm["rf_m"])
    a_rf = jnp.clip(tm["rf_m"], 0.0, 10.0)
    mx_ = jnp.full(B, jnp.nan, jnp.float32)
    mx_ = W(lp_ok, a_lp, mx_)
    mx_ = W(rf_ok0, W(jnp.isnan(mx_), a_rf, jnp.maximum(mx_, a_rf)), mx_)
    mx_ = W(near_ground, W(jnp.isnan(mx_), 0.0, jnp.maximum(mx_, 0.0)), mx_)
    S["alt_max"] = mx_

    airborne_hint = ((tm["have_ext"] & (tm["landed_state"] != LANDED_ON_GROUND))
                     | (lp_ok & (tm["lpos_alt_filt"] > _F32(0.20))))
    rf_sane = rf_ok0 & ~(airborne_hint & (a_rf < _F32(0.05))) \
        & ~(lp_ok & (jnp.abs(a_rf - tm["lpos_alt_filt"]) > _F32(0.80)))
    alt = jnp.full(B, jnp.nan, jnp.float32)
    src = jnp.full(B, ALT_NONE, jnp.int32)
    alt = W(near_ground, _F32(0.0), alt)
    src = W(near_ground, ALT_GND, src)
    alt = W(lp_ok, a_lp, alt)
    src = W(lp_ok, ALT_LPOS, src)
    alt = W(rf_sane, a_rf, alt)
    src = W(rf_sane, ALT_RF, src)
    S["alt_est"] = alt
    S["alt_src"] = src
    ceilv = _F32(cfg.gates.ceil_m)
    S["ceiling"] = W(jnp.isfinite(mx_) & (mx_ >= ceilv), True, S["ceiling"])
    S["ceiling"] = W(jnp.isfinite(mx_)
                     & (mx_ <= ceilv - _F32(cfg.gates.ceil_release_margin_m)),
                     False, S["ceiling"])

    # tof EMA
    mins = tm["tof_min"]
    a_ = _F32(cfg.tof.filt_alpha)
    blended = (_F32(1.0) - a_) * S["tof_filt"] + a_ * mins
    upd = jnp.where(jnp.isnan(S["tof_filt"]), mins, blended)
    S["tof_filt"] = jnp.where(jnp.isnan(mins), S["tof_filt"], upd)

    # battery failsafe — flags only (clean:2127-2175)
    vpc = tm["batt_vpc"]
    on_gnd = batt_valid & ~tm["fc_armed"]
    warn = on_gnd & tm["want_arm"] & (vpc < _F32(bt.arm_min_vpc)) \
        & (t - S["b_warn"] > bt.low_hold_ms)
    S["b_warn"] = W(warn, t, S["b_warn"])
    S["b_low"] = W(on_gnd, 0, S["b_low"])
    S["b_emerg"] = W(on_gnd, 0, S["b_emerg"])
    in_air_b = batt_valid & tm["fc_armed"]
    emergv = in_air_b & (vpc < _F32(bt.emerg_vpc))
    S["b_emerg"] = W(emergv & (S["b_emerg"] == 0), t, S["b_emerg"])
    S["kf"] = W(emergv & (S["b_emerg"] != 0)
                & (t - S["b_emerg"] > bt.low_hold_ms),
                S["kf"] | CL_KF_BATT_EMERG, S["kf"])
    S["b_emerg"] = W(in_air_b & ~emergv, 0, S["b_emerg"])
    lowv = in_air_b & (vpc < _F32(bt.land_vpc))
    S["b_low"] = W(lowv & (S["b_low"] == 0), t, S["b_low"])
    S["kf"] = W(lowv & (S["b_low"] != 0) & (t - S["b_low"] > bt.low_hold_ms),
                S["kf"] | CL_KF_BATT_LAND, S["kf"])
    S["b_low"] = W(in_air_b & ~lowv, 0, S["b_low"])

    # 10 Hz snapshot timer (parity; observability hook)
    snap_due = t - S["snap_last"] >= 100
    S["snap_last"] = W(snap_due, t, S["snap_last"])

    # ---- guards ----
    no_fc = ~tm["have_fc"]
    enter(CL_WAIT_LINK, no_fc)
    done = no_fc

    ng = ~done & hard_nogo
    enter(CL_DISARMING, ng & tm["fc_armed"])
    enter(CL_IDLE, ng & ~tm["fc_armed"])
    done |= ng
    live = ~done

    unexp = (live & S["armed_prev"] & ~tm["fc_armed"] & tm["want_arm"]
             & (S["st"] != CL_LANDING) & (S["st"] != CL_DISARMING)
             & (S["st"] != CL_IDLE))
    enter(CL_IDLE, unexp)
    S["armed_prev"] = W(live, tm["fc_armed"], S["armed_prev"])

    # user abort: force disarm NOW, bypass rate limit, return
    abort = live & ~tm["want_arm"] & tm["fc_armed"]
    emit_disarm_force(abort, bypass=abort)
    enter(CL_DISARMING, abort)
    done |= abort
    live = ~done

    # helper values used by ceiling/hover/takeoff
    def hover_target_z_down():
        z_up = _F32(bh.hover_target_m)
        max_up = jnp.maximum(ceilv - _F32(0.05), _F32(0.10))
        return -jnp.minimum(z_up, max_up)

    # ceiling override (clean:2403-2419)
    ceil_ov = live & S["ceiling"] & tm["fc_armed"]
    cap0 = ceil_ov & ~S["yaw_tv"] & tm["have_att"]
    S["yaw_tv"] = W(cap0, True, S["yaw_tv"])
    S["yaw_t"] = W(cap0, tm["yaw_deg"], S["yaw_t"])
    cyaw = W(S["yaw_tv"], S["yaw_t"], W(tm["have_att"], tm["yaw_deg"], _F32(0.0)))
    safe_z = hover_target_z_down()
    ceil_pos = ceil_ov & S["hv_locked"] & tm["have_att"]
    set_cmd(ceil_pos, CMD_POS_YAW, S["hv_lock_x"], S["hv_lock_y"], safe_z, cyaw)
    set_cmd(ceil_ov & ~ceil_pos, CMD_Z_YAW, safe_z, cyaw, 0.0, 0.0)
    done |= ceil_ov
    live = ~done

    # hover stale-sensor hysteresis (clean:2421-2442)
    in_hover = live & tm["fc_armed"] & (S["st"] == CL_HOVER)
    lpos_ok_h = lpos_fresh
    alt_ok_h = jnp.isfinite(S["alt_max"])
    rf_ok_h = rf_fresh & jnp.isfinite(tm["rf_m"])
    S["lpos_stale"] = W(in_hover, W(lpos_ok_h, 0, S["lpos_stale"] + 1), 0)
    S["alt_stale"] = W(in_hover, W(alt_ok_h, 0, S["alt_stale"] + 1), 0)
    S["rf_stale"] = W(in_hover, W(rf_ok_h, 0, S["rf_stale"] + 1), 0)
    stale_fail = in_hover & ((S["lpos_stale"] > bh.stale_fail_ticks)
                             | (S["alt_stale"] > bh.stale_fail_ticks)
                             | (S["rf_stale"] > bh.stale_fail_ticks))
    enter(CL_LANDING, stale_fail)

    # prearm readiness (clean:999-1036)
    of_ok30 = of_fresh & (tm["of_q"] >= cfg.gates.of_min_quality)
    ready_now = (tm["have_att"] & lpos_fresh & xy_ok & z_ok
                 & (rf_fresh & jnp.isfinite(tm["rf_m"]))
                 & (of_ok30 | ~tm["fc_armed"])
                 & jnp.isfinite(S["alt_max"]))
    # timer mutation happens only when IDLE/ARMING actually consult it
    st0 = S["st"]

    def hover_ready_stable(callc):
        set0 = callc & ready_now & (S["prearm_since"] == 0)
        S["prearm_since"] = W(set0, t, S["prearm_since"])
        S["prearm_since"] = W(callc & ~ready_now, 0, S["prearm_since"])
        return (ready_now & (S["prearm_since"] != 0)
                & (t - S["prearm_since"] >= bh.prearm_stable_ms))

    def init_hover_targets(cond):
        for k in ("hv_locked", "hv_pre_valid"):
            S[k] = W(cond, False, S[k])
        for k in ("hv_pre_x", "hv_pre_y", "hv_lock_x", "hv_lock_y"):
            S[k] = W(cond, 0.0, S[k])
        capy = cond & tm["have_att"]
        S["yaw_tv"] = W(capy, True, S["yaw_tv"])
        S["yaw_t"] = W(capy, tm["yaw_deg"], S["yaw_t"])

    enter(CL_IDLE, live & (st0 == CL_WAIT_LINK))

    batt_ok_arm = (~batt_valid) | (vpc >= _F32(bt.arm_min_vpc))

    # IDLE (clean:2449-2468)
    idle = live & (st0 == CL_IDLE)
    idle_go = idle & ~(tm["want_arm"] & ~batt_ok_arm)
    want_arm_idle = idle_go & tm["want_arm"] & ~tm["fc_armed"]
    ready_idle = hover_ready_stable(want_arm_idle)
    emit_mode(MODE_GUIDED, want_arm_idle & ~ready_idle)
    go_arm = want_arm_idle & ready_idle
    capy = go_arm & ~S["yaw_tv"] & tm["have_att"]
    S["yaw_tv"] = W(capy, True, S["yaw_tv"])
    S["yaw_t"] = W(capy, tm["yaw_deg"], S["yaw_t"])
    init_hover_targets(go_arm)
    enter(CL_ARMING, go_arm)
    enter(CL_DISARMING, idle_go & ~tm["want_arm"] & tm["fc_armed"])
    enter(CL_TAKEOFF, idle_go & tm["want_arm"] & tm["fc_armed"])

    # ARMING (clean:2470-2489)
    arming = live & (st0 == CL_ARMING)
    enter(CL_IDLE, arming & ~batt_ok_arm)
    arming2 = arming & batt_ok_arm
    ready_arm = hover_ready_stable(arming2)
    emit_mode(MODE_GUIDED, arming2 & ~ready_arm)
    arming3 = arming2 & ready_arm
    init_hover_targets(arming3)
    arm_do = arming3 & ~tm["fc_armed"]
    emit_mode(MODE_GUIDED, arm_do)
    emit_arm(arm_do)
    enter(CL_TAKEOFF, arming3 & tm["fc_armed"])

    # TAKEOFF (clean:2491-2593)
    tko = live & (st0 == CL_TAKEOFF)
    emit_mode(MODE_GUIDED, tko & (tm["hb_custom_mode"] != MODE_GUIDED))

    def prelock_capture(cond):
        cap = (cond & ~S["hv_pre_valid"] & lpos_fresh
               & jnp.isfinite(tm["lpos_x"]) & jnp.isfinite(tm["lpos_y"])
               & jnp.isfinite(S["alt_max"])
               & (S["alt_max"] > _F32(bh.hover_capture_min_alt_m)))
        S["hv_pre_x"] = W(cap, tm["lpos_x"], S["hv_pre_x"])
        S["hv_pre_y"] = W(cap, tm["lpos_y"], S["hv_pre_y"])
        S["hv_pre_valid"] = S["hv_pre_valid"] | cap

    prelock_capture(tko)

    first_send = tko & ~S["to_sent"]
    O["req_takeoff"] = W(first_send, _F32(bh.takeoff_target_m), O["req_takeoff"])
    S["to_sent"] = W(first_send, True, S["to_sent"])
    S["to_sent_ms"] = W(first_send, t, S["to_sent_ms"])
    S["to_alt0"] = W(first_send & jnp.isnan(S["to_alt0"]),
                     W(jnp.isfinite(S["alt_max"]), S["alt_max"], S["alt_est"]),
                     S["to_alt0"])

    mot_avg = W(servo_fresh_250, tm["motor_avg"], jnp.nan)
    mot_started = servo_fresh_250 & (mot_avg > _F32(bh.takeoff_mot_start_us))
    off_ground = (
        (tm["have_ext"] & (tm["landed_state"] != LANDED_ON_GROUND))
        | (rf_fresh & jnp.isfinite(tm["rf_m"]) & (tm["rf_m"] > _F32(0.05)))
        | (jnp.isfinite(S["alt_max"]) & (S["alt_max"] > _F32(0.05))))
    alt_rising = (jnp.isfinite(S["to_alt0"]) & jnp.isfinite(S["alt_max"])
                  & (S["alt_max"] - S["to_alt0"] > _F32(0.05)))

    ramp_trig = (tko & ~S["to_started"] & ~S["ramp_active"] & S["to_sent"]
                 & (t - S["to_sent_ms"] > 700)
                 & ~mot_started & ~alt_rising & ~off_ground)
    S["ramp_active"] = W(ramp_trig, True, S["ramp_active"])
    S["ramp_start"] = W(ramp_trig, t, S["ramp_start"])

    allow_stream = (tko & S["to_sent"]
                    & (t - S["to_sent_ms"] >= bh.takeoff_no_vel_ms)
                    & ~S["ramp_active"])
    tyaw = W(S["yaw_tv"], S["yaw_t"], W(tm["have_att"], tm["yaw_deg"], _F32(0.0)))
    z_down = hover_target_z_down()
    stream_pos = allow_stream & S["hv_locked"]
    set_cmd(stream_pos, CMD_POS_YAW, S["hv_lock_x"], S["hv_lock_y"], z_down, tyaw)
    set_cmd(allow_stream & ~S["hv_locked"], CMD_Z_YAW, z_down, tyaw, 0.0, 0.0)

    # attitude thrust ramp tick (clean:2098-2119)
    ramping = tko & S["ramp_active"]
    S["ramp_start"] = W(ramping & (S["ramp_start"] == 0), t, S["ramp_start"])
    ramp_send = ramping & (t - S["ramp_last"] >= 40)
    S["ramp_last"] = W(ramp_send, t, S["ramp_last"])
    rdt = (t - S["ramp_start"]).astype(jnp.float32)
    u = jnp.maximum(W(rdt >= bh.ramp_total_ms, _F32(1.0),
                      rdt / _F32(float(bh.ramp_total_ms))), _F32(0.0))
    thr = (_F32(1.0) - u) * _F32(bh.ramp_thr_min) + u * _F32(bh.ramp_thr_max)
    set_cmd(ramp_send, CMD_ATT_THRUST,
            jnp.clip(thr, 0.0, _F32(bh.thrust_clamp)), tyaw, 0.0, 0.0)
    ramp_end = ramping & (off_ground | ((t - S["ramp_start"]) > 1400))
    S["ramp_active"] = W(ramp_end, False, S["ramp_active"])

    # post-ramp inference (clean:2544-2564)
    post = tko & ~S["to_started"] & ~S["ramp_active"]
    inferred_air = (
        (tm["have_ext"] & (tm["landed_state"] != LANDED_ON_GROUND))
        | (jnp.isfinite(S["alt_max"]) & (S["alt_max"] > _F32(0.05)))
        | (servo_fresh_250 & (mot_avg > _F32(bh.takeoff_mot_start_us) + 150)))
    started_inf = post & inferred_air
    S["to_started"] = W(started_inf, True, S["to_started"])
    S["to_started_ms"] = W(started_inf, t, S["to_started_ms"])
    capy2 = started_inf & tm["have_att"]
    S["yaw_tv"] = W(capy2, True, S["yaw_tv"])
    S["yaw_t"] = W(capy2, tm["yaw_deg"], S["yaw_t"])
    ramp_fail = post & ~inferred_air
    enter(CL_LIFTOFF_ASSIST, ramp_fail)
    tko &= ~ramp_fail

    start2 = tko & ~S["to_started"] & (mot_started | off_ground)
    S["to_started"] = W(start2, True, S["to_started"])
    S["to_started_ms"] = W(start2, t, S["to_started_ms"])
    capy3 = start2 & tm["have_att"]
    S["yaw_tv"] = W(capy3, True, S["yaw_tv"])
    S["yaw_t"] = W(capy3, tm["yaw_deg"], S["yaw_t"])

    stall = tko & ~S["to_started"] & (t - S["to_sent_ms"] > bh.takeoff_stall_ms)
    enter(CL_LIFTOFF_ASSIST, stall)
    tko &= ~stall

    at_alt = (tko & jnp.isfinite(S["alt_max"])
              & (S["alt_max"] >= _F32(bh.takeoff_target_m)
                 - _F32(bh.takeoff_exit_margin_m)))
    capy4 = at_alt & ~S["yaw_tv"] & tm["have_att"]
    S["yaw_tv"] = W(capy4, True, S["yaw_tv"])
    S["yaw_t"] = W(capy4, tm["yaw_deg"], S["yaw_t"])
    enter(CL_HOVER, at_alt)

    # LIFTOFF_ASSIST (clean:2038-2095)
    ast = live & (st0 == CL_LIFTOFF_ASSIST)
    emit_mode(MODE_GUIDED, ast & (t - S["as_start"] < 150))
    base_now = ast & ~S["as_base"] & servo_fresh_200
    S["as_mot0"] = W(base_now, tm["motor_avg"], S["as_mot0"])
    S["as_base"] = W(base_now, True, S["as_base"])
    as_send = ast & (t - S["as_last"] >= bh.assist_send_period_ms)
    S["as_last"] = W(as_send, t, S["as_last"])
    adt = (t - S["as_start"]).astype(jnp.float32)
    au = jnp.clip(W(adt >= bh.assist_total_ms, _F32(1.0),
                    adt / _F32(float(bh.assist_total_ms))), 0.0, 1.0)
    ue = jnp.sqrt(au)
    athr = (_F32(1.0) - ue) * _F32(float(bh.assist_thr_us_min)) \
        + ue * _F32(float(bh.assist_thr_us_max))
    thr_norm = jnp.clip((athr - _F32(1000.0)) / _F32(1000.0), 0.0, 1.0)
    ayaw = W(tm["have_att"], tm["yaw_deg"], _F32(0.0))
    set_cmd(as_send, CMD_ATT_THRUST,
            jnp.minimum(thr_norm, _F32(bh.thrust_clamp)), ayaw, 0.0, 0.0)
    warn_now = (ast & ~S["as_warned"] & S["as_base"]
                & (t - S["as_start"] > bh.assist_override_effect_ms)
                & servo_fresh_200 & jnp.isfinite(S["as_mot0"])
                & (tm["motor_avg"] - S["as_mot0"]
                   < _F32(bh.assist_motor_delta_min)))
    S["as_warned"] = W(warn_now, True, S["as_warned"])
    as_exit = ast & off_ground
    emit_mode(MODE_GUIDED, as_exit)
    O["req_takeoff"] = W(as_exit, _F32(bh.takeoff_target_m), O["req_takeoff"])
    enter(CL_TAKEOFF, as_exit)
    as_abort = ast & ~as_exit & (t - S["as_start"] > bh.assist_abort_ms)
    enter(CL_DISARMING, as_abort)

    # HOVER (clean:2599-2607 + hover_hold_tick 1065-1103)
    hov = live & (st0 == CL_HOVER)
    capy5 = hov & ~S["yaw_tv"] & tm["have_att"]
    S["yaw_tv"] = W(capy5, True, S["yaw_tv"])
    S["yaw_t"] = W(capy5, tm["yaw_deg"], S["yaw_t"])
    hov_att = hov & tm["have_att"]
    prelock_capture(hov_att)
    # C short-circuit (clean:1081): once locked, vel_xy_stable is never
    # called again — its timer state freezes and survives sensor dropouts.
    xy_stable_h = vel_xy_stable(hov_att & ~S["hv_locked"])
    lock_now = hov_att & ~S["hv_locked"] & xy_stable_h
    use_pre = lock_now & S["hv_pre_valid"]
    use_cur = (lock_now & ~S["hv_pre_valid"] & lpos_fresh
               & jnp.isfinite(tm["lpos_x"]) & jnp.isfinite(tm["lpos_y"]))
    S["hv_lock_x"] = W(use_pre, S["hv_pre_x"],
                       W(use_cur, tm["lpos_x"], S["hv_lock_x"]))
    S["hv_lock_y"] = W(use_pre, S["hv_pre_y"],
                       W(use_cur, tm["lpos_y"], S["hv_lock_y"]))
    S["hv_locked"] = S["hv_locked"] | lock_now
    hyaw = W(S["yaw_tv"], S["yaw_t"], tm["yaw_deg"])
    hz = hover_target_z_down()
    pos_hold = hov_att & S["hv_locked"] & lpos_fresh
    set_cmd(pos_hold, CMD_POS_YAW, S["hv_lock_x"], S["hv_lock_y"], hz, hyaw)
    set_cmd(hov_att & ~pos_hold, CMD_Z_YAW, hz, hyaw, 0.0, 0.0)

    # LANDING (clean:2609-2628)
    lnd = live & (st0 == CL_LANDING)
    first_land = lnd & ~S["land_sent"]
    emit_mode(MODE_LAND, first_land)
    S["land_sent"] = W(first_land, True, S["land_sent"])
    S["land_sent_ms"] = W(first_land, t, S["land_sent_ms"])
    re_land = lnd & ~first_land & (t - S["land_sent_ms"] > 2000)
    emit_mode(MODE_LAND, re_land)
    S["land_sent_ms"] = W(re_land, t, S["land_sent_ms"])
    set_cmd(lnd, CMD_VEL_NED, 0.0, 0.0, _F32(bh.landing_descent_mps), 0.0)
    near_gnd = jnp.isfinite(S["alt_max"]) & (S["alt_max"] < _F32(0.10))
    enter(CL_DISARMING, lnd & (near_gnd | (tm["have_ext"]
                                           & (tm["landed_state"]
                                              == LANDED_ON_GROUND))))

    # DISARMING (clean:2630-2638)
    dis = live & (st0 == CL_DISARMING)
    emit_disarm_force(dis & tm["fc_armed"])
    enter(CL_IDLE, dis & ~tm["fc_armed"])

    new_state = BehaviorClState(**S)
    O["state"] = S["st"]
    O["kf_flags"] = S["kf"]
    O["alt_est"] = S["alt_est"]
    O["alt_max"] = S["alt_max"]
    O["alt_src"] = S["alt_src"]
    O["ceiling"] = S["ceiling"]
    return new_state, O
