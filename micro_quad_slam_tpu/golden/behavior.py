"""Golden flight-behavior model: a faithful, stateful re-expression of the
reference's ~50 Hz control_tick (uav_local_nav.c:1866-2333) and its
supporting estimators/gates/failsafes (C2-C11 in SURVEY.md §2C).

This is the oracle the branchless JAX state machine is fuzz-tested
against.  Inputs are a per-tick telemetry snapshot (exactly the C globals
a tick would observe); outputs are the commands the tick would emit.
Command rate limiters are modeled in C call order, because a suppressed
SET_MODE inside one tick is observable (e.g. the LIFTOFF_ASSIST exit path
calls set_mode_stabilize then set_mode_guided in the same tick and the
800 ms limiter drops the second, uav_local_nav.c:699-730,1738-1779).

The FC side (arming, acks, landed state, motor spool) is NOT modeled here:
it arrives in the telemetry snapshot, provided by the log adapter or the
closed-loop simulator.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
import numpy as np

F32 = np.float32

# States (uav_local_nav.c:484-496)
ST_WAIT_LINK, ST_IDLE, ST_ARMING, ST_TAKEOFF, ST_LIFTOFF_ASSIST = 0, 1, 2, 3, 4
ST_HOVER, ST_EXPLORE, ST_TURNING, ST_LANDING, ST_DISARMING = 5, 6, 7, 8, 9

# Directions (uav_local_nav.c:102)
D_FRONT, D_RIGHT, D_BACK, D_LEFT = 0, 1, 2, 3

# MAV_LANDED_STATE
LANDED_UNDEFINED, LANDED_ON_GROUND, LANDED_IN_AIR = 0, 1, 2
LANDED_TAKEOFF, LANDED_LANDING = 3, 4

# MAV_RESULT
RES_ACCEPTED, RES_TEMP_REJECTED, RES_DENIED = 0, 1, 2

# sensor health bits
SENSOR_3D_GYRO = 0x01
SENSOR_Z_ALTITUDE_CONTROL = 0x2000
SENSOR_XY_POSITION_CONTROL = 0x4000
SENSOR_MOTOR_OUTPUTS = 0x400000

# alt sources (uav_local_nav.c:541-548)
ALT_NONE, ALT_LPOS, ALT_RF, ALT_GND = 0, 1, 2, 3

# command kinds emitted per tick
CMD_NONE, CMD_VEL_BODY, CMD_VEL_NED, CMD_POS_YAW, CMD_ATT_THRUST, CMD_RC_OVERRIDE = (
    0, 1, 2, 3, 4, 5,
)

# mode numbers (ArduPilot Copter custom modes)
MODE_STABILIZE, MODE_GUIDED, MODE_LAND = 0, 4, 9

# keyframe flags (uav_local_nav.c:218-229)
KF_TAKEOFF = 1 << 0
KF_TURN_START = 1 << 1
KF_TURN_END = 1 << 2
KF_LAND_START = 1 << 3
KF_LIFTOFF_AST = 1 << 4
KF_MAP_RECENTER = 1 << 5
KF_BATT_LAND = 1 << 6
KF_BATT_EMERG = 1 << 7


@dataclass
class Telemetry:
    """Per-tick snapshot of the C globals a control_tick observes."""

    t_ms: int = 0
    have_fc: bool = False
    fc_armed: bool = False
    hb_custom_mode: int = 0
    have_ext: bool = False
    landed_state: int = LANDED_UNDEFINED
    have_sys: bool = False
    sys_last_ms: int = 0
    sys_health: int = 0
    sys_enabled: int = 0xFFFFFFFF  # CL gates are enabled-bit aware (clean:906-933)
    have_servo: bool = False
    servo_last_ms: int = 0
    motor_avg: float = 0.0
    batt_vpc: float = float("nan")
    batt_cells: int = 0
    batt_last_ms: int = 0
    # clean-only: the intake validity LATCH (clean:158,1291-1294) — the
    # CL battery tick gates on this flag, not on a per-tick freshness
    # re-check; maintained by the telemetry adapter / mock
    batt_valid: bool = False
    have_lpos: bool = False
    lpos_last_ms: int = 0
    lpos_x: float = float("nan")
    lpos_y: float = float("nan")
    lpos_alt_filt: float = float("nan")   # EMA'd at message rate by the adapter
    have_att: bool = False
    yaw_deg: float = float("nan")         # wrapped heading
    have_of: bool = False
    of_last_ms: int = 0
    of_q: int = 0
    have_rf: bool = False
    rf_last_ms: int = 0
    rf_m: float = float("nan")
    want_arm: bool = False
    have_takeoff_ack: bool = False
    takeoff_ack_res: int = 0
    takeoff_ack_ms: int = 0
    takeoff_accept_ms: int = 0            # set when ack ACCEPTED (handler)
    tof_min: tuple = (float("nan"),) * 4  # per-dir minima from latest scan
    # map queries (computed by the mapping layer from its grid)
    map_inited: bool = False
    frontier_f: int = 0
    frontier_r: int = 0
    frontier_l: int = 0
    frontier_b: int = 0


def wrap_deg(d: float) -> float:
    d = F32(d)
    while d >= F32(180.0):
        d = F32(d - F32(360.0))
    while d < F32(-180.0):
        d = F32(d + F32(360.0))
    return float(d)


@dataclass
class Outputs:
    state: int = ST_WAIT_LINK
    cmd_kind: int = CMD_NONE
    cmd: tuple = (0.0, 0.0, 0.0, 0.0)   # meaning depends on kind
    req_mode: int = -1                   # emitted SET_MODE (post rate-limit)
    req_arm: int = -1                    # 1 arm, 0 disarm(force 21196)
    req_takeoff: float = float("nan")    # NAV_TAKEOFF altitude
    rc_release: bool = False
    clear_takeoff_ack: bool = False   # enter_state(TAKEOFF) resets the ack latch
    kf_flags: int = 0
    map_init: bool = False
    map_origin: tuple = (float("nan"), float("nan"))
    alt_est: float = float("nan")
    alt_src: int = ALT_NONE
    ceiling: bool = False


@dataclass
class GoldenBehavior:
    """UL-profile behavior machine (uav_local_nav.c).  One instance per
    virtual quad; step(telem) mutates state and returns Outputs."""

    # tunables (reference constants; see utils/config.py for citations)
    takeoff_target_m: float = 0.50
    ceil_m: float = 0.70
    front_stop_m: float = 0.60
    side_safe_m: float = 0.80
    fwd_vel: float = 0.35
    yaw_rate_dps: float = 20.0
    explore_enabled: bool = True
    # HOVER_TEST_ONLY (uav_local_nav.c:522,2196): park in HOVER — the
    # `break` lands after hover hold/map init, before the EXPLORE gate.
    hover_test_only: bool = False

    # ---- state ----
    st: int = ST_WAIT_LINK
    yaw_target_valid: bool = False
    yaw_target_deg: float = 0.0
    # hover
    hover_valid: bool = False
    hover_x: float = float("nan")
    hover_y: float = float("nan")
    hover_z_ned: float = float("nan")
    hover_yaw: float = float("nan")
    hover_enter_ms: int = 0
    # turning
    turning_init: bool = False
    turning_dir: int = D_RIGHT
    turn_target_deg: float = 0.0
    turn_start_ms: int = 0
    turning_dir_forced: bool = False
    forced_turn_dir: int = D_RIGHT
    # ceiling / alt
    ceiling_active: bool = False
    alt_est_m: float = float("nan")
    alt_src: int = ALT_NONE
    # takeoff
    takeoff_sent: bool = False
    takeoff_sent_ms: int = 0
    takeoff_no_vel_until_ms: int = 0
    takeoff_started: bool = False
    takeoff_started_ms: int = 0
    takeoff_not_started_printed: bool = False
    ramp_active: bool = False
    ramp_start_ms: int = 0
    ramp_last_send_ms: int = 0
    # liftoff assist
    assist_start_ms: int = 0
    assist_last_send_ms: int = 0
    assist_baseline_set: bool = False
    assist_motor_avg0: float = float("nan")
    assist_warned: bool = False
    # landing
    land_mode_sent: bool = False
    land_mode_sent_ms: int = 0
    # battery
    batt_low_since_ms: int = 0
    batt_emerg_since_ms: int = 0
    batt_last_warn_ms: int = 0
    # stability gate
    xy_ok_since_ms: int = 0
    # rate limits
    last_arm_cmd_ms: int = 0
    last_mode_cmd_ms: int = 0
    last_disarm_cmd_ms: int = 0
    # exploration
    last_frontier_eval_ms: int = 0
    explore_pause_until_ms: int = 0
    # misc
    fc_armed_prev: bool = False
    pending_kf: int = 0
    own_hb_last_ms: int = 0
    print_last_ms: int = 0
    # tof EMA filter (B8)
    tof_filt: list = field(default_factory=lambda: [float("nan")] * 4)

    # ---------------- helpers mirroring the C ----------------
    def _sys_fresh(self, tm: Telemetry) -> bool:
        return tm.have_sys and (tm.t_ms - tm.sys_last_ms) < 1000

    def _bit_ok(self, tm: Telemetry, bit: int) -> bool:
        if not self._sys_fresh(tm):
            return True
        return (tm.sys_health & bit) != 0

    def _hard_nogo(self, tm: Telemetry) -> bool:
        if not self._sys_fresh(tm):
            return False
        if not self._bit_ok(tm, SENSOR_3D_GYRO):
            return True
        if not self._bit_ok(tm, SENSOR_MOTOR_OUTPUTS):
            return True
        return False

    def _z_ok(self, tm): return self._bit_ok(tm, SENSOR_Z_ALTITUDE_CONTROL)

    def _xy_ok(self, tm): return self._bit_ok(tm, SENSOR_XY_POSITION_CONTROL)

    def _of_fresh(self, tm: Telemetry) -> bool:
        return tm.have_of and (tm.t_ms - tm.of_last_ms) < 400

    def _lpos_fresh(self, tm: Telemetry) -> bool:
        return tm.have_lpos and (tm.t_ms - tm.lpos_last_ms) < 400

    def _rf_fresh(self, tm: Telemetry) -> bool:
        return tm.have_rf and (tm.t_ms - tm.rf_last_ms) < 400

    def _batt_fresh(self, tm: Telemetry) -> bool:
        return (tm.batt_last_ms != 0 and (tm.t_ms - tm.batt_last_ms) < 2000
                and not math.isnan(tm.batt_vpc) and tm.batt_cells > 0)

    def _vel_xy_allowed(self, tm: Telemetry) -> bool:
        # (uav_local_nav.c:959-974)
        if not self._xy_ok(tm):
            return False
        if not tm.have_att:
            return False
        if not self._lpos_fresh(tm):
            return False
        if self._of_fresh(tm) and tm.of_q < 50:
            return False
        if not math.isnan(self.alt_est_m) and F32(self.alt_est_m) < F32(0.12):
            return False
        return True

    def _vel_xy_stable(self, tm: Telemetry) -> bool:
        # (uav_local_nav.c:976-986)
        if self._vel_xy_allowed(tm):
            if self.xy_ok_since_ms == 0:
                self.xy_ok_since_ms = tm.t_ms
            return (tm.t_ms - self.xy_ok_since_ms) >= 1000
        self.xy_ok_since_ms = 0
        return False

    def _yaw_hold_rate(self, tm: Telemetry) -> float:
        # (uav_local_nav.c:861-868)
        if not self.yaw_target_valid or not tm.have_att:
            return 0.0
        err = wrap_deg(F32(self.yaw_target_deg) - F32(tm.yaw_deg))
        yr = F32(err) * F32(1.2)
        return float(min(max(yr, -self.yaw_rate_dps), self.yaw_rate_dps))

    # rate-limited emitters (return emitted?)
    def _emit_mode(self, tm: Telemetry, out: Outputs, mode: int) -> bool:
        # set_mode_custom (uav_local_nav.c:699-715)
        if not tm.have_fc:
            return False
        if tm.t_ms - self.last_mode_cmd_ms < 800:
            return False
        self.last_mode_cmd_ms = tm.t_ms
        out.req_mode = mode
        return True

    def _emit_arm(self, tm: Telemetry, out: Outputs) -> bool:
        if not tm.have_fc:
            return False
        if tm.t_ms - self.last_arm_cmd_ms < 800:
            return False
        self.last_arm_cmd_ms = tm.t_ms
        out.req_arm = 1
        return True

    def _emit_disarm_force(self, tm: Telemetry, out: Outputs) -> bool:
        if not tm.have_fc:
            return False
        if tm.t_ms - self.last_disarm_cmd_ms < 800:
            return False
        self.last_disarm_cmd_ms = tm.t_ms
        out.req_arm = 0
        return True

    def _enter(self, tm: Telemetry, ns: int) -> None:
        # enter_state (uav_local_nav.c:1642-1698)
        if self.st == ns:
            return
        if self.st == ST_LIFTOFF_ASSIST and ns != ST_LIFTOFF_ASSIST:
            self._pending_rc_release = True
        if ns == ST_TAKEOFF:
            self.takeoff_sent = False
            self.takeoff_sent_ms = 0
            self._clear_takeoff_ack = True
            self.takeoff_no_vel_until_ms = 0
            self.takeoff_started = False
            self.takeoff_started_ms = 0
            self.takeoff_not_started_printed = False
            self.ramp_active = False
            self.ramp_start_ms = 0
            self.ramp_last_send_ms = 0
            self.pending_kf |= KF_TAKEOFF
        if ns == ST_LIFTOFF_ASSIST:
            self.assist_start_ms = tm.t_ms
            self.assist_last_send_ms = 0
            self.assist_baseline_set = False
            self.assist_motor_avg0 = float("nan")
            self.assist_warned = False
            self.pending_kf |= KF_LIFTOFF_AST
        if ns == ST_HOVER:
            self.hover_enter_ms = tm.t_ms
            self.hover_valid = False
        if ns == ST_LANDING:
            self.land_mode_sent = False
            self.land_mode_sent_ms = 0
            self.pending_kf |= KF_LAND_START
        if ns == ST_TURNING:
            self.pending_kf |= KF_TURN_START
        if self.st == ST_TURNING and ns != ST_TURNING:
            self.turning_init = False
            self.pending_kf |= KF_TURN_END
            self.explore_pause_until_ms = tm.t_ms + 450
        self.st = ns

    def _update_alt(self, tm: Telemetry) -> None:
        # update_alt_estimate (uav_local_nav.c:1440-1470)
        lpos_fresh = self._lpos_fresh(tm)
        rf_fresh = self._rf_fresh(tm)
        near_ground = tm.have_ext and tm.landed_state == LANDED_ON_GROUND
        if rf_fresh and not math.isnan(tm.rf_m):
            a = min(max(tm.rf_m, 0.0), 10.0)
            self.alt_est_m = a
            self.alt_src = ALT_RF
        elif lpos_fresh:
            a = min(max(tm.lpos_alt_filt, 0.0), 10.0)
            self.alt_est_m = a
            self.alt_src = ALT_LPOS
        elif near_ground:
            self.alt_est_m = 0.0
            self.alt_src = ALT_GND
        else:
            self.alt_src = ALT_NONE
        if not math.isnan(self.alt_est_m) and F32(self.alt_est_m) >= F32(self.ceil_m):
            self.ceiling_active = True
        if (not math.isnan(self.alt_est_m)
                and F32(self.alt_est_m) <= F32(self.ceil_m) - F32(0.10)):
            self.ceiling_active = False

    def _tof_filter(self, tm: Telemetry) -> None:
        # (uav_local_nav.c:1430-1438)
        for d in range(4):
            v = tm.tof_min[d]
            if math.isnan(v):
                continue
            if math.isnan(self.tof_filt[d]):
                self.tof_filt[d] = float(F32(v))
            else:
                self.tof_filt[d] = float(
                    (F32(1.0) - F32(0.2)) * F32(self.tof_filt[d]) + F32(0.2) * F32(v)
                )

    def _battery_tick(self, tm: Telemetry) -> None:
        # battery_failsafe_tick (uav_local_nav.c:1797-1837)
        if not self._batt_fresh(tm):
            return
        if not tm.fc_armed:
            if tm.want_arm and F32(tm.batt_vpc) < F32(3.70):
                if tm.t_ms - self.batt_last_warn_ms > 1200:
                    self.batt_last_warn_ms = tm.t_ms
            self.batt_low_since_ms = 0
            self.batt_emerg_since_ms = 0
            return
        if F32(tm.batt_vpc) < F32(3.35):
            if self.batt_emerg_since_ms == 0:
                self.batt_emerg_since_ms = tm.t_ms
            if (tm.t_ms - self.batt_emerg_since_ms) > 1200:
                self.pending_kf |= KF_BATT_EMERG
                if self.st not in (ST_LANDING, ST_DISARMING):
                    self._enter(tm, ST_LANDING)
        else:
            self.batt_emerg_since_ms = 0
        if F32(tm.batt_vpc) < F32(3.55):
            if self.batt_low_since_ms == 0:
                self.batt_low_since_ms = tm.t_ms
            if (tm.t_ms - self.batt_low_since_ms) > 1200:
                self.pending_kf |= KF_BATT_LAND
                if self.st not in (ST_LANDING, ST_DISARMING):
                    self._enter(tm, ST_LANDING)
        else:
            self.batt_low_since_ms = 0

    def _arm_allowed_by_battery(self, tm: Telemetry) -> bool:
        if not self._batt_fresh(tm):
            return True
        return F32(tm.batt_vpc) >= F32(3.70)

    def _takeoff_off_ground(self, tm: Telemetry) -> bool:
        # (uav_local_nav.c:1839-1845)
        rf_fresh = self._rf_fresh(tm)
        if tm.have_ext and tm.landed_state != LANDED_ON_GROUND:
            return True
        if rf_fresh and not math.isnan(tm.rf_m) and F32(tm.rf_m) > F32(0.15):
            return True
        if not math.isnan(self.alt_est_m) and F32(self.alt_est_m) > F32(0.15):
            return True
        return False

    def _open_side_dir(self) -> int:
        # (uav_local_nav.c:1700-1713)
        best, best_dir = -1.0, D_RIGHT
        for val, d in ((self.tof_filt[D_RIGHT], D_RIGHT),
                       (self.tof_filt[D_LEFT], D_LEFT),
                       (self.tof_filt[D_BACK], D_BACK)):
            if not math.isnan(val) and val > best:
                best, best_dir = val, d
        return best_dir

    def _choose_turn_dir(self, tm: Telemetry) -> int:
        # choose_turn_dir_frontier (uav_local_nav.c:1715-1736)
        have_xy = self._lpos_fresh(tm)
        if not tm.map_inited or not have_xy or not tm.have_att:
            return self._open_side_dir()
        r = 0.0 if math.isnan(self.tof_filt[D_RIGHT]) else self.tof_filt[D_RIGHT]
        l = 0.0 if math.isnan(self.tof_filt[D_LEFT]) else self.tof_filt[D_LEFT]
        b = 0.0 if math.isnan(self.tof_filt[D_BACK]) else self.tof_filt[D_BACK]
        sR = tm.frontier_r + int(F32(r) * F32(5.0))
        sL = tm.frontier_l + int(F32(l) * F32(5.0))
        sB = tm.frontier_b + int(F32(b) * F32(5.0))
        best_dir, best = D_RIGHT, sR
        if sL > best:
            best, best_dir = sL, D_LEFT
        if sB > best:
            best, best_dir = sB, D_BACK
        return best_dir

    # ---------------- the tick ----------------
    def step(self, tm: Telemetry) -> Outputs:
        out = Outputs()
        self._pending_rc_release = False
        self._clear_takeoff_ack = False
        t = tm.t_ms

        # own heartbeat (1 Hz) — bookkeeping only
        if t - self.own_hb_last_ms >= 1000:
            self.own_hb_last_ms = t

        self._update_alt(tm)
        self._tof_filter(tm)
        self._battery_tick(tm)

        # the 2 Hz console status line calls vel_xy_stable (mutating the
        # stability timer) in EVERY state (uav_local_nav.c:1886-1889) —
        # semantically observable through earlier/later stability latching.
        if t - self.print_last_ms >= 500:
            self.print_last_ms = t
            self._vel_xy_stable(tm)

        if not tm.have_fc:
            if self.st != ST_WAIT_LINK:
                self._enter(tm, ST_WAIT_LINK)
            return self._finish(tm, out)

        if self._hard_nogo(tm):
            if tm.fc_armed:
                self._enter(tm, ST_DISARMING)
            else:
                self._enter(tm, ST_IDLE)
            return self._finish(tm, out)

        # unexpected disarm (uav_local_nav.c:1989-2005)
        if (self.fc_armed_prev and not tm.fc_armed and tm.want_arm
                and self.st not in (ST_LANDING, ST_DISARMING, ST_IDLE)):
            self._enter(tm, ST_IDLE)
        self.fc_armed_prev = tm.fc_armed

        if not tm.want_arm and tm.fc_armed:
            self._enter(tm, ST_DISARMING)

        # ceiling override (uav_local_nav.c:2025-2028)
        if self.ceiling_active and tm.fc_armed:
            out.cmd_kind = CMD_VEL_NED
            out.cmd = (0.0, 0.0, 0.30, 0.0)
            return self._finish(tm, out)

        st = self.st
        if st == ST_WAIT_LINK:
            self._enter(tm, ST_IDLE)

        elif st == ST_IDLE:
            if tm.want_arm and not self._arm_allowed_by_battery(tm):
                pass
            elif tm.want_arm and not tm.fc_armed:
                self._enter(tm, ST_ARMING)
            elif not tm.want_arm and tm.fc_armed:
                self._enter(tm, ST_DISARMING)
            elif tm.want_arm and tm.fc_armed:
                self._enter(tm, ST_TAKEOFF)

        elif st == ST_ARMING:
            if not self._arm_allowed_by_battery(tm):
                self._enter(tm, ST_IDLE)
            elif not tm.fc_armed:
                self._emit_mode(tm, out, MODE_GUIDED)
                self._emit_arm(tm, out)
            else:
                self._enter(tm, ST_TAKEOFF)

        elif st == ST_TAKEOFF:
            self._takeoff_tick(tm, out)

        elif st == ST_LIFTOFF_ASSIST:
            self._assist_tick(tm, out)

        elif st == ST_HOVER:
            self._hover_tick(tm, out)

        elif st == ST_EXPLORE:
            self._explore_tick(tm, out)

        elif st == ST_TURNING:
            self._turning_tick(tm, out)

        elif st == ST_LANDING:
            # (uav_local_nav.c:2298-2317)
            if not self.land_mode_sent:
                if self._emit_mode(tm, out, MODE_LAND):
                    pass
                self.land_mode_sent = True
                self.land_mode_sent_ms = t
            elif (t - self.land_mode_sent_ms) > 2000:
                self._emit_mode(tm, out, MODE_LAND)
                self.land_mode_sent_ms = t
            out.cmd_kind = CMD_VEL_NED
            out.cmd = (0.0, 0.0, 0.15, 0.0)
            near_ground = (not math.isnan(self.alt_est_m)
                           and F32(self.alt_est_m) < F32(0.10))
            if near_ground or (tm.have_ext
                               and tm.landed_state == LANDED_ON_GROUND):
                self._enter(tm, ST_DISARMING)

        elif st == ST_DISARMING:
            if tm.fc_armed:
                self._emit_disarm_force(tm, out)
            else:
                self._enter(tm, ST_IDLE)

        else:
            self._enter(tm, ST_IDLE)

        return self._finish(tm, out)

    def _finish(self, tm: Telemetry, out: Outputs) -> Outputs:
        out.state = self.st
        out.kf_flags = self.pending_kf
        out.rc_release = out.rc_release or self._pending_rc_release
        out.clear_takeoff_ack = self._clear_takeoff_ack
        out.alt_est = self.alt_est_m
        out.alt_src = self.alt_src
        out.ceiling = self.ceiling_active
        return out

    # ---------------- per-state ticks ----------------
    def _takeoff_tick(self, tm: Telemetry, out: Outputs) -> None:
        # (uav_local_nav.c:2057-2169)
        t = tm.t_ms
        if tm.hb_custom_mode != MODE_GUIDED:
            self._emit_mode(tm, out, MODE_GUIDED)

        if (tm.have_takeoff_ack and (t - tm.takeoff_ack_ms) < 2000
                and tm.takeoff_ack_res in (RES_DENIED, RES_TEMP_REJECTED)):
            self._enter(tm, ST_LIFTOFF_ASSIST)
            return

        if not self.takeoff_sent:
            out.req_takeoff = self.takeoff_target_m
            self.takeoff_sent = True
            self.takeoff_sent_ms = t
            self.takeoff_no_vel_until_ms = t + 2000
        elif not self.takeoff_started and (t - self.takeoff_sent_ms) > 3000:
            out.req_takeoff = self.takeoff_target_m
            self.takeoff_sent_ms = t
            self.takeoff_no_vel_until_ms = t + 2000

        servo_fresh = tm.have_servo and (t - tm.servo_last_ms) < 250
        mot_avg = tm.motor_avg if servo_fresh else float("nan")
        mot_started = servo_fresh and mot_avg > 1150.0
        off_ground = self._takeoff_off_ground(tm)

        if not self.takeoff_started and (mot_started or off_ground):
            self.takeoff_started = True
            self.takeoff_started_ms = t

        if (not self.takeoff_started and tm.have_takeoff_ack
                and tm.takeoff_ack_res == RES_ACCEPTED):
            ref = tm.takeoff_accept_ms or tm.takeoff_ack_ms
            if (not self.ramp_active and not self.takeoff_not_started_printed
                    and ref != 0 and (t - ref) >= 1500):
                if servo_fresh and mot_avg <= 1150.0:
                    self.takeoff_not_started_printed = True
                    self.ramp_active = True
                    self.ramp_start_ms = t
                    self.ramp_last_send_ms = 0

        if self.ramp_active:
            if not self.yaw_target_valid and tm.have_att:
                self.yaw_target_valid = True
                self.yaw_target_deg = tm.yaw_deg
            # takeoff_thrust_ramp_tick (uav_local_nav.c:1847-1864)
            if self.ramp_start_ms == 0:
                self.ramp_start_ms = t
            if (t - self.ramp_last_send_ms) >= 50:
                self.ramp_last_send_ms = t
                dt = t - self.ramp_start_ms
                u = F32(1.0) if dt >= 1800 else F32(dt) / F32(1800.0)
                u = min(max(u, F32(0.0)), F32(1.0))
                thr = float((F32(1.0) - u) * F32(0.15) + u * F32(0.60))
                yaw = (self.yaw_target_deg if self.yaw_target_valid
                       else (tm.yaw_deg if tm.have_att else 0.0))
                out.cmd_kind = CMD_ATT_THRUST
                out.cmd = (min(thr, 0.75), yaw, 0.0, 0.0)
            if off_ground or (servo_fresh and mot_avg > 1150.0):
                self.ramp_active = False
                self.takeoff_started = True
                self.takeoff_started_ms = t
                out.req_takeoff = self.takeoff_target_m
                self.takeoff_no_vel_until_ms = t + 2000
            elif (t - self.ramp_start_ms) > 2600:
                self.ramp_active = False
                self._enter(tm, ST_LIFTOFF_ASSIST)
            return

        if (not self._z_ok(tm) and not self.takeoff_started
                and not math.isnan(self.alt_est_m)
                and F32(self.alt_est_m) < F32(0.10)
                and (t - self.takeoff_sent_ms) > 1200):
            self._enter(tm, ST_LIFTOFF_ASSIST)
            return

        if not self.takeoff_started and (t - self.takeoff_sent_ms) > 4500:
            self._enter(tm, ST_LIFTOFF_ASSIST)
            return

        if (not math.isnan(self.alt_est_m)
                and F32(self.alt_est_m)
                >= F32(self.takeoff_target_m) - F32(0.05)):
            self.yaw_target_valid = tm.have_att
            self.yaw_target_deg = tm.yaw_deg if tm.have_att else 0.0
            self._enter(tm, ST_HOVER)

    def _assist_tick(self, tm: Telemetry, out: Outputs) -> None:
        # liftoff_assist_tick (uav_local_nav.c:1738-1789)
        t = tm.t_ms
        if t - self.assist_start_ms < 150:
            self._emit_mode(tm, out, MODE_STABILIZE)

        servo_fresh = tm.have_servo and (t - tm.servo_last_ms) < 200
        if not self.assist_baseline_set and servo_fresh:
            self.assist_motor_avg0 = tm.motor_avg
            self.assist_baseline_set = True

        if t - self.assist_last_send_ms >= 50:
            self.assist_last_send_ms = t
            dt = t - self.assist_start_ms
            u = F32(1.0) if dt >= 1800 else F32(dt) / F32(1800.0)
            u = min(max(u, F32(0.0)), F32(1.0))
            thr = int(np.rint((F32(1.0) - u) * F32(1300.0) + u * F32(1600.0)))
            out.cmd_kind = CMD_RC_OVERRIDE
            out.cmd = (1500.0, 1500.0, float(thr), 1500.0)

        if (not self.assist_warned and self.assist_baseline_set
                and (t - self.assist_start_ms) > 400 and servo_fresh):
            if (not math.isnan(self.assist_motor_avg0)
                    and F32(tm.motor_avg) - F32(self.assist_motor_avg0) < F32(40.0)):
                self.assist_warned = True

        if not math.isnan(self.alt_est_m) and F32(self.alt_est_m) > F32(0.28):
            out.rc_release = True
            self._emit_mode(tm, out, MODE_GUIDED)
            out.req_takeoff = self.takeoff_target_m
            self._enter(tm, ST_TAKEOFF)
            return

        if (t - self.assist_start_ms) > 2600:
            out.rc_release = True
            self._enter(tm, ST_DISARMING)

    def _hover_tick(self, tm: Telemetry, out: Outputs) -> None:
        # (uav_local_nav.c:2175-2202) + hover_hold_tick (:989-1013)
        t = tm.t_ms
        if not self.yaw_target_valid and tm.have_att:
            self.yaw_target_valid = True
            self.yaw_target_deg = tm.yaw_deg

        xy_stable = self._vel_xy_stable(tm)
        lpos_fresh = self._lpos_fresh(tm)
        yaw_ok = tm.have_att

        if not xy_stable:
            out.cmd_kind = CMD_VEL_BODY
            out.cmd = (0.0, 0.0, 0.0, self._yaw_hold_rate(tm))
        else:
            if (not self.hover_valid and lpos_fresh and yaw_ok
                    and not math.isnan(self.alt_est_m)):
                self.hover_x = tm.lpos_x
                self.hover_y = tm.lpos_y
                self.hover_z_ned = -self.alt_est_m
                self.hover_yaw = (self.yaw_target_deg if self.yaw_target_valid
                                  else tm.yaw_deg)
                self.hover_valid = True
            if self.hover_valid and lpos_fresh and yaw_ok:
                out.cmd_kind = CMD_POS_YAW
                out.cmd = (self.hover_x, self.hover_y, self.hover_z_ned,
                           self.hover_yaw)
            else:
                out.cmd_kind = CMD_VEL_BODY
                out.cmd = (0.0, 0.0, 0.0, self._yaw_hold_rate(tm))

        if not tm.map_inited and xy_stable and self.hover_valid:
            out.map_init = True
            out.map_origin = (self.hover_x, self.hover_y)

        if (self.explore_enabled and not self.hover_test_only
                and xy_stable and (t - self.hover_enter_ms) > 1200):
            self._enter(tm, ST_EXPLORE)

    def _explore_tick(self, tm: Telemetry, out: Outputs) -> None:
        # (uav_local_nav.c:2204-2257)
        t = tm.t_ms
        if not self._vel_xy_stable(tm):
            out.cmd_kind = CMD_VEL_BODY
            out.cmd = (0.0, 0.0, 0.0, self._yaw_hold_rate(tm))
            return
        if t < self.explore_pause_until_ms:
            out.cmd_kind = CMD_VEL_BODY
            out.cmd = (0.0, 0.0, 0.0, self._yaw_hold_rate(tm))
            return
        f = self.tof_filt[D_FRONT]
        if not math.isnan(f) and F32(f) < F32(self.front_stop_m):
            self.turning_dir_forced = False
            self._enter(tm, ST_TURNING)
            return
        have_xy = self._lpos_fresh(tm)
        if (tm.map_inited and have_xy and tm.have_att
                and (t - self.last_frontier_eval_ms) > 1200):
            self.last_frontier_eval_ms = t
            sF, sR = tm.frontier_f, tm.frontier_r
            sL, sB = tm.frontier_l, tm.frontier_b
            best, best_dir = sF, D_FRONT
            if sR > best:
                best, best_dir = sR, D_RIGHT
            if sL > best:
                best, best_dir = sL, D_LEFT
            if sB > best:
                best, best_dir = sB, D_BACK
            if best_dir != D_FRONT and best > (sF + 35):
                dist_ok = self.tof_filt[best_dir]
                if not math.isnan(dist_ok) and F32(dist_ok) > F32(self.side_safe_m):
                    self.turning_dir_forced = True
                    self.forced_turn_dir = best_dir
                    self._enter(tm, ST_TURNING)
                    return
        out.cmd_kind = CMD_VEL_BODY
        out.cmd = (self.fwd_vel, 0.0, 0.0, self._yaw_hold_rate(tm))

    def _turning_tick(self, tm: Telemetry, out: Outputs) -> None:
        # (uav_local_nav.c:2259-2296)
        t = tm.t_ms
        if not self.turning_init:
            if self.turning_dir_forced:
                self.turning_dir = self.forced_turn_dir
                self.turning_dir_forced = False
            else:
                self.turning_dir = self._choose_turn_dir(tm)
            cur = tm.yaw_deg if tm.have_att else 0.0
            delta = {D_RIGHT: 90.0, D_LEFT: -90.0}.get(self.turning_dir, 180.0)
            self.turn_target_deg = wrap_deg(F32(cur) + F32(delta))
            self.turn_start_ms = t
            self.turning_init = True

        cur = tm.yaw_deg if tm.have_att else 0.0
        err = wrap_deg(F32(self.turn_target_deg) - F32(cur))
        yr = float(F32(err) * F32(0.8))
        yr = min(max(yr, -self.yaw_rate_dps), self.yaw_rate_dps)
        out.cmd_kind = CMD_VEL_BODY
        out.cmd = (0.0, 0.0, 0.0, yr)

        if abs(err) < 6.0 or (t - self.turn_start_ms) > 6000:
            self.yaw_target_valid = True
            self.yaw_target_deg = self.turn_target_deg
            self.turning_init = False
            self._enter(tm, ST_EXPLORE)

    def drain_kf(self) -> int:
        """Keyframe flags drained into the next scanrec (uav_local_nav.c:1573)."""
        kf = self.pending_kf
        self.pending_kf = 0
        return kf
