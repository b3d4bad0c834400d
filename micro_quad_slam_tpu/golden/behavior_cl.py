"""Golden model of the CLEAN-revision behavior machine
(clean_uav_fc_tof_nav.c — the later stability/demo companion binary,
SURVEY.md §2C "CL" column).

8 states (no EXPLORE/TURNING, clean:325-335).  Differences from the UL
machine, all reproduced here:

  * defensive altitude estimation: alt_max = MAX of sources for ceiling
    safety, RF sanity rejection, lpos clamp [-1, 50] (clean:1710-1782)
  * enabled-bit-aware health gates (clean:906-933), flow quality >= 30
  * hover: prelock XY snapshot once airborne > 0.15 m, lock on
    stability, ALWAYS stream Z+yaw when unlocked (clean:998-1103)
  * prearm readiness gating in IDLE/ARMING (hover_ready_stable,
    clean:999-1036, 2449-2489)
  * takeoff: single NAV_TAKEOFF, delayed attitude thrust ramp
    (sqrt-free 0.5->0.95 over 700 ms @25 Hz), setpoint streaming after
    the no-vel window, inferred-liftoff detection, 8 s timeout
    (clean:2491-2593, 2097-2119)
  * liftoff assist via GUIDED attitude+thrust with sqrt ease-out
    (clean:2038-2095)
  * want_arm drop -> force disarm IMMEDIATELY bypassing the rate limit,
    then return (clean:2395-2401)
  * ceiling override holds position if XY locked, else Z-only
    (clean:2403-2419)
  * hover stale-sensor hysteresis -> LANDING (clean:2421-2442)
  * battery failsafe LOGS ONLY — landing actions suppressed
    (clean:2146-2175); validity fail-open (clean:2122-2131)
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from micro_quad_slam_tpu.golden.behavior import (
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
    GoldenBehavior,
    Outputs,
    Telemetry,
)

F32 = np.float32

# CL state enum (clean:325-335) — LANDING/DISARMING shift down two
CL_WAIT_LINK, CL_IDLE, CL_ARMING, CL_TAKEOFF = 0, 1, 2, 3
CL_LIFTOFF_ASSIST, CL_HOVER, CL_LANDING, CL_DISARMING = 4, 5, 6, 7

# Z-only setpoint (send_z_yaw_ned, clean:747-779)
CMD_Z_YAW = 6

# CL keyframe-flag layout (subset, clean:162-169) — DIFFERENT from UL
CL_KF_TAKEOFF = 1 << 0
CL_KF_LAND_START = 1 << 1
CL_KF_LIFTOFF_AST = 1 << 2
CL_KF_BATT_LAND = 1 << 3
CL_KF_BATT_EMERG = 1 << 4


@dataclass
class GoldenBehaviorCL(GoldenBehavior):
    takeoff_target_m: float = 0.35   # clean:103
    hover_target_m: float = 0.45     # clean:102
    ceil_m: float = 0.90             # clean:104
    explore_enabled: bool = False

    # CL-only state
    alt_max_m: float = float("nan")
    hover_xy_locked: bool = False
    hover_prelock_valid: bool = False
    hover_prelock_x: float = 0.0
    hover_prelock_y: float = 0.0
    hover_lock_x: float = 0.0
    hover_lock_y: float = 0.0
    hover_yaw_deg_cl: float = 0.0
    prearm_ok_since_ms: int = 0
    takeoff_alt0: float = float("nan")
    att_ramp_active: bool = False
    att_ramp_start_ms: int = 0
    att_ramp_last_send_ms: int = 0
    lpos_stale: int = 0
    rf_stale: int = 0
    alt_stale: int = 0
    snap_last_ms: int = 0

    # -------- enabled-bit-aware gates (clean:906-933) --------
    def _hard_nogo(self, tm: Telemetry) -> bool:
        if not self._sys_fresh(tm):
            return False
        if not self._bit_ok(tm, SENSOR_3D_GYRO):
            return True
        mot_en = (tm.sys_enabled & SENSOR_MOTOR_OUTPUTS) != 0
        if mot_en and not self._bit_ok(tm, SENSOR_MOTOR_OUTPUTS):
            return True
        return False

    def _z_ok(self, tm):
        if not self._sys_fresh(tm):
            return True
        en = (tm.sys_enabled & SENSOR_Z_ALTITUDE_CONTROL) != 0
        return self._bit_ok(tm, SENSOR_Z_ALTITUDE_CONTROL) if en else True

    def _xy_ok(self, tm):
        if not self._sys_fresh(tm):
            return True
        en = (tm.sys_enabled & SENSOR_XY_POSITION_CONTROL) != 0
        return self._bit_ok(tm, SENSOR_XY_POSITION_CONTROL) if en else True

    # -------- mode requests (clean:606-629) --------
    def _emit_mode(self, tm: Telemetry, out, mode: int) -> bool:
        # The CLEAN set_mode_custom SUPPRESSES a request for the mode the
        # FC already reports, BEFORE the rate limit (clean:607-608) — the
        # UL variant has no such check (uav_local_nav.c:699-704).  Found
        # by the round-5 compiled-C control_tick machine-check.
        if not tm.have_fc:
            return False
        if tm.hb_custom_mode == mode:
            return False
        if tm.t_ms - self.last_mode_cmd_ms < 800:
            return False
        self.last_mode_cmd_ms = tm.t_ms
        out.req_mode = mode
        return True

    # -------- defensive altitude estimation (clean:1710-1782) --------
    def _update_alt(self, tm: Telemetry) -> None:
        lpos_fresh = self._lpos_fresh(tm)
        rf_fresh = self._rf_fresh(tm)
        near_ground = tm.have_ext and tm.landed_state == LANDED_ON_GROUND

        max_alt = float("nan")
        if lpos_fresh and not math.isnan(tm.lpos_alt_filt):
            a = min(max(tm.lpos_alt_filt, -1.0), 50.0)
            max_alt = a
        if rf_fresh and not math.isnan(tm.rf_m):
            rf = min(max(tm.rf_m, 0.0), 10.0)
            max_alt = rf if math.isnan(max_alt) else max(max_alt, rf)
        if near_ground:
            max_alt = 0.0 if math.isnan(max_alt) else max(max_alt, 0.0)
        self.alt_max_m = max_alt

        new_alt, new_src = float("nan"), ALT_NONE
        if rf_fresh and not math.isnan(tm.rf_m):
            rf = min(max(tm.rf_m, 0.0), 10.0)
            rf_ok = True
            airborne_hint = (tm.have_ext
                             and tm.landed_state != LANDED_ON_GROUND)
            if (lpos_fresh and not math.isnan(tm.lpos_alt_filt)
                    and F32(tm.lpos_alt_filt) > F32(0.20)):
                airborne_hint = True
            if airborne_hint and F32(rf) < F32(0.05):
                rf_ok = False
            if (lpos_fresh and not math.isnan(tm.lpos_alt_filt)
                    and abs(F32(rf) - F32(tm.lpos_alt_filt)) > F32(0.80)):
                rf_ok = False
            if rf_ok:
                new_alt, new_src = rf, ALT_RF
        if new_src == ALT_NONE and lpos_fresh and not math.isnan(tm.lpos_alt_filt):
            new_alt = min(max(tm.lpos_alt_filt, -1.0), 50.0)
            new_src = ALT_LPOS
        if new_src == ALT_NONE and near_ground:
            new_alt, new_src = 0.0, ALT_GND
        self.alt_est_m = new_alt
        self.alt_src = new_src

        if not math.isnan(self.alt_max_m) and F32(self.alt_max_m) >= F32(self.ceil_m):
            self.ceiling_active = True
        if (not math.isnan(self.alt_max_m)
                and F32(self.alt_max_m) <= F32(self.ceil_m) - F32(0.10)):
            self.ceiling_active = False

    # -------- gates (clean:972-996) --------
    def _vel_xy_allowed(self, tm: Telemetry) -> bool:
        if not self._xy_ok(tm):
            return False
        if not tm.have_att:
            return False
        if not self._lpos_fresh(tm):
            return False
        if self._of_fresh(tm) and tm.of_q < 30:
            return False
        if not math.isnan(self.alt_max_m) and F32(self.alt_max_m) < F32(0.12):
            return False
        return True

    def _batt_valid(self, tm: Telemetry) -> bool:
        # the intake validity LATCH (clean:158,1291-1294), maintained by
        # the telemetry adapter / mock exactly like handle_battery_status:
        # the CL tick gates on the flag alone — NO per-tick freshness
        # re-check (the C keeps acting on the last valid vpc; an invalid
        # reading clears the latch until the next valid one).  The
        # previous fresh+window re-derivation here diverged on exactly
        # those corners — caught by the compiled-C fuzz-diff
        # (tests/test_golden_vs_c_cl.py).
        return tm.batt_valid

    def _arm_allowed_by_battery(self, tm: Telemetry) -> bool:
        if not self._batt_valid(tm):
            return True  # fail-open (clean:2122-2125)
        return F32(tm.batt_vpc) >= F32(3.70)

    def _battery_tick(self, tm: Telemetry) -> None:
        # clean:2127-2175 — flags only, LANDING suppressed
        if not self._batt_valid(tm):
            return
        vpc = tm.batt_vpc
        if not tm.fc_armed:
            if F32(vpc) < F32(3.70) and tm.want_arm:
                if tm.t_ms - self.batt_last_warn_ms > 1200:
                    self.batt_last_warn_ms = tm.t_ms
            self.batt_low_since_ms = 0
            self.batt_emerg_since_ms = 0
            return
        if F32(vpc) < F32(3.35):
            if self.batt_emerg_since_ms == 0:
                self.batt_emerg_since_ms = tm.t_ms
            if (tm.t_ms - self.batt_emerg_since_ms) > 1200:
                self.pending_kf |= CL_KF_BATT_EMERG
        else:
            self.batt_emerg_since_ms = 0
        if F32(vpc) < F32(3.55):
            if self.batt_low_since_ms == 0:
                self.batt_low_since_ms = tm.t_ms
            if (tm.t_ms - self.batt_low_since_ms) > 1200:
                self.pending_kf |= CL_KF_BATT_LAND
        else:
            self.batt_low_since_ms = 0

    # -------- prearm readiness (clean:999-1036) --------
    def _hover_ready_now(self, tm: Telemetry) -> bool:
        lpos_fresh = self._lpos_fresh(tm)
        rf_ok = self._rf_fresh(tm) and not math.isnan(tm.rf_m)
        of_ok = self._of_fresh(tm) and tm.of_q >= 30
        if not tm.have_att:
            return False
        if not lpos_fresh:
            return False
        if not self._xy_ok(tm) or not self._z_ok(tm):
            return False
        if not rf_ok:                      # REQUIRE_RANGEFINDER_FOR_HOVER
            return False
        if not of_ok and tm.fc_armed:      # REQUIRE_OPTICAL_FLOW_FOR_HOVER
            return False
        if math.isnan(self.alt_max_m):
            return False
        return True

    def _hover_ready_stable(self, tm: Telemetry) -> bool:
        if self._hover_ready_now(tm):
            if self.prearm_ok_since_ms == 0:
                self.prearm_ok_since_ms = tm.t_ms
            return (tm.t_ms - self.prearm_ok_since_ms) >= 400
        self.prearm_ok_since_ms = 0
        return False

    def _hover_target_z_down(self) -> float:
        z_up = F32(self.hover_target_m)
        max_up = F32(self.ceil_m) - F32(0.05)
        if max_up < F32(0.10):
            max_up = F32(0.10)
        return float(-min(z_up, max_up))

    def _init_hover_targets_on_ground(self, tm: Telemetry) -> None:
        self.hover_xy_locked = False
        self.hover_prelock_valid = False
        self.hover_lock_x = self.hover_lock_y = 0.0
        self.hover_prelock_x = self.hover_prelock_y = 0.0
        if tm.have_att:
            self.hover_yaw_deg_cl = tm.yaw_deg
            self.yaw_target_valid = True
            self.yaw_target_deg = tm.yaw_deg
        else:
            self.hover_yaw_deg_cl = 0.0

    def _takeoff_off_ground(self, tm: Telemetry) -> bool:
        # clean:2178-2184 (thresholds 0.05 on RF and alt_max)
        if tm.have_ext and tm.landed_state != LANDED_ON_GROUND:
            return True
        if (self._rf_fresh(tm) and not math.isnan(tm.rf_m)
                and F32(tm.rf_m) > F32(0.05)):
            return True
        if not math.isnan(self.alt_max_m) and F32(self.alt_max_m) > F32(0.05):
            return True
        return False

    # -------- enter_state (clean:1957-2031) --------
    def _enter(self, tm: Telemetry, ns: int) -> None:
        if self.st == ns:
            return
        leaving_hover = self.st == CL_HOVER and ns != CL_HOVER
        if leaving_hover or ns == CL_HOVER:
            self.hover_xy_locked = False
            self.hover_prelock_valid = False
            self.hover_lock_x = self.hover_lock_y = 0.0
            self.hover_prelock_x = self.hover_prelock_y = 0.0
        if ns == CL_TAKEOFF:
            self.takeoff_sent = False
            self.takeoff_sent_ms = 0
            self._clear_takeoff_ack = True
            self.takeoff_started = False
            self.takeoff_started_ms = 0
            self.att_ramp_active = False
            self.att_ramp_start_ms = 0
            self.takeoff_alt0 = self.alt_max_m
            self.pending_kf |= CL_KF_TAKEOFF
        if ns == CL_LIFTOFF_ASSIST:
            self.assist_start_ms = tm.t_ms
            self.assist_last_send_ms = 0
            self.assist_baseline_set = False
            self.assist_motor_avg0 = float("nan")
            self.assist_warned = False
            self.pending_kf |= CL_KF_LIFTOFF_AST
        if ns == CL_LANDING:
            self.land_mode_sent = False
            self.land_mode_sent_ms = 0
            self.pending_kf |= CL_KF_LAND_START
        self.st = ns

    # -------- the tick (clean:2339-2660) --------
    def step(self, tm: Telemetry) -> Outputs:
        out = Outputs()
        self._pending_rc_release = False
        self._clear_takeoff_ack = False
        t = tm.t_ms

        if t - self.own_hb_last_ms >= 1000:
            self.own_hb_last_ms = t

        self._update_alt(tm)
        self._tof_filter(tm)
        self._battery_tick(tm)

        # 10 Hz snapshot tick (observability hook; timer kept for parity)
        if t - self.snap_last_ms >= 100:
            self.snap_last_ms = t

        if not tm.have_fc:
            if self.st != CL_WAIT_LINK:
                self._enter(tm, CL_WAIT_LINK)
            return self._finish(tm, out)

        if self._hard_nogo(tm):
            if tm.fc_armed:
                self._enter(tm, CL_DISARMING)
            else:
                self._enter(tm, CL_IDLE)
            return self._finish(tm, out)

        if (self.fc_armed_prev and not tm.fc_armed and tm.want_arm
                and self.st not in (CL_LANDING, CL_DISARMING, CL_IDLE)):
            self._enter(tm, CL_IDLE)
        self.fc_armed_prev = tm.fc_armed

        # want_arm drop: force disarm NOW, bypassing the rate limit
        # (clean:2395-2401), and return.
        if not tm.want_arm and tm.fc_armed:
            self.last_disarm_cmd_ms = 0
            self._emit_disarm_force(tm, out)
            self._enter(tm, CL_DISARMING)
            return self._finish(tm, out)

        # ceiling override (clean:2403-2419)
        if self.ceiling_active and tm.fc_armed:
            if not self.yaw_target_valid and tm.have_att:
                self.yaw_target_valid = True
                self.yaw_target_deg = tm.yaw_deg
            yaw = (self.yaw_target_deg if self.yaw_target_valid
                   else (tm.yaw_deg if tm.have_att else 0.0))
            safe_z = self._hover_target_z_down()
            if self.hover_xy_locked and tm.have_att:
                out.cmd_kind = CMD_POS_YAW
                out.cmd = (self.hover_lock_x, self.hover_lock_y, safe_z, yaw)
            else:
                out.cmd_kind = CMD_Z_YAW
                out.cmd = (safe_z, yaw, 0.0, 0.0)
            return self._finish(tm, out)

        # hover stale-sensor hysteresis (clean:2421-2442)
        if tm.fc_armed and self.st == CL_HOVER:
            lpos_ok = self._lpos_fresh(tm)
            alt_ok = not math.isnan(self.alt_max_m)
            rf_ok = self._rf_fresh(tm) and not math.isnan(tm.rf_m)
            self.lpos_stale = 0 if lpos_ok else self.lpos_stale + 1
            self.alt_stale = 0 if alt_ok else self.alt_stale + 1
            self.rf_stale = 0 if rf_ok else self.rf_stale + 1
            if (self.lpos_stale > 40 or self.alt_stale > 40
                    or self.rf_stale > 40):
                self._enter(tm, CL_LANDING)
        else:
            self.lpos_stale = self.rf_stale = self.alt_stale = 0

        st = self.st
        if st == CL_WAIT_LINK:
            self._enter(tm, CL_IDLE)

        elif st == CL_IDLE:
            if tm.want_arm and not self._arm_allowed_by_battery(tm):
                pass
            elif tm.want_arm and not tm.fc_armed:
                if not self._hover_ready_stable(tm):
                    self._emit_mode(tm, out, MODE_GUIDED)
                else:
                    if not self.yaw_target_valid and tm.have_att:
                        self.yaw_target_valid = True
                        self.yaw_target_deg = tm.yaw_deg
                    self._init_hover_targets_on_ground(tm)
                    self._enter(tm, CL_ARMING)
            elif not tm.want_arm and tm.fc_armed:
                self._enter(tm, CL_DISARMING)
            elif tm.want_arm and tm.fc_armed:
                self._enter(tm, CL_TAKEOFF)

        elif st == CL_ARMING:
            if not self._arm_allowed_by_battery(tm):
                self._enter(tm, CL_IDLE)
            elif not self._hover_ready_stable(tm):
                self._emit_mode(tm, out, MODE_GUIDED)
            else:
                self._init_hover_targets_on_ground(tm)
                if not tm.fc_armed:
                    self._emit_mode(tm, out, MODE_GUIDED)
                    self._emit_arm(tm, out)
                else:
                    self._enter(tm, CL_TAKEOFF)

        elif st == CL_TAKEOFF:
            self._takeoff_tick_cl(tm, out)

        elif st == CL_LIFTOFF_ASSIST:
            self._assist_tick_cl(tm, out)

        elif st == CL_HOVER:
            if not self.yaw_target_valid and tm.have_att:
                self.yaw_target_valid = True
                self.yaw_target_deg = tm.yaw_deg
            self._hover_hold_tick_cl(tm, out)

        elif st == CL_LANDING:
            if not self.land_mode_sent:
                self._emit_mode(tm, out, MODE_LAND)
                self.land_mode_sent = True
                self.land_mode_sent_ms = t
            elif (t - self.land_mode_sent_ms) > 2000:
                self._emit_mode(tm, out, MODE_LAND)
                self.land_mode_sent_ms = t
            out.cmd_kind = CMD_VEL_NED
            out.cmd = (0.0, 0.0, 0.15, 0.0)
            near_ground = (not math.isnan(self.alt_max_m)
                           and F32(self.alt_max_m) < F32(0.10))
            if near_ground or (tm.have_ext
                               and tm.landed_state == LANDED_ON_GROUND):
                self._enter(tm, CL_DISARMING)

        elif st == CL_DISARMING:
            if tm.fc_armed:
                self._emit_disarm_force(tm, out)
            else:
                self._enter(tm, CL_IDLE)

        else:
            self._enter(tm, CL_IDLE)

        return self._finish(tm, out)

    # -------- per-state CL ticks --------
    def _prelock_capture(self, tm: Telemetry) -> None:
        if (not self.hover_prelock_valid and self._lpos_fresh(tm)
                and math.isfinite(tm.lpos_x) and math.isfinite(tm.lpos_y)
                and not math.isnan(self.alt_max_m)
                and F32(self.alt_max_m) > F32(0.15)):
            self.hover_prelock_x = tm.lpos_x
            self.hover_prelock_y = tm.lpos_y
            self.hover_prelock_valid = True

    def _takeoff_tick_cl(self, tm: Telemetry, out: Outputs) -> None:
        t = tm.t_ms
        if tm.hb_custom_mode != MODE_GUIDED:
            self._emit_mode(tm, out, MODE_GUIDED)

        self._prelock_capture(tm)

        if not self.takeoff_sent:
            out.req_takeoff = self.takeoff_target_m
            self.takeoff_sent = True
            self.takeoff_sent_ms = t
            if math.isnan(self.takeoff_alt0):
                self.takeoff_alt0 = (self.alt_max_m
                                     if not math.isnan(self.alt_max_m)
                                     else self.alt_est_m)

        servo_fresh = tm.have_servo and (t - tm.servo_last_ms) < 250
        mot_avg = tm.motor_avg if servo_fresh else float("nan")
        mot_started = servo_fresh and mot_avg > 1150.0
        off_ground = self._takeoff_off_ground(tm)
        alt_rising = (not math.isnan(self.takeoff_alt0)
                      and not math.isnan(self.alt_max_m)
                      and F32(self.alt_max_m) - F32(self.takeoff_alt0) > F32(0.05))

        if (not self.takeoff_started and not self.att_ramp_active
                and self.takeoff_sent and (t - self.takeoff_sent_ms) > 700
                and not mot_started and not alt_rising and not off_ground):
            self.att_ramp_active = True
            self.att_ramp_start_ms = t

        allow_stream = (self.takeoff_sent
                        and (t - self.takeoff_sent_ms) >= 900
                        and not self.att_ramp_active)
        if allow_stream:
            yaw = (self.yaw_target_deg if self.yaw_target_valid
                   else (tm.yaw_deg if tm.have_att else 0.0))
            z_down = self._hover_target_z_down()
            if self.hover_xy_locked:
                out.cmd_kind = CMD_POS_YAW
                out.cmd = (self.hover_lock_x, self.hover_lock_y, z_down, yaw)
            else:
                out.cmd_kind = CMD_Z_YAW
                out.cmd = (z_down, yaw, 0.0, 0.0)

        # attitude thrust ramp tick (clean:2098-2119)
        if self.att_ramp_active:
            if self.att_ramp_start_ms == 0:
                self.att_ramp_start_ms = t
            if t - self.att_ramp_last_send_ms >= 40:
                self.att_ramp_last_send_ms = t
                dt = t - self.att_ramp_start_ms
                u = F32(1.0) if dt >= 700 else F32(dt) / F32(700.0)
                u = max(u, F32(0.0))
                thr = float((F32(1.0) - u) * F32(0.50) + u * F32(0.95))
                yaw = (self.yaw_target_deg if self.yaw_target_valid
                       else (tm.yaw_deg if tm.have_att else 0.0))
                out.cmd_kind = CMD_ATT_THRUST
                out.cmd = (min(max(thr, 0.0), 0.90), yaw, 0.0, 0.0)
            dt = t - self.att_ramp_start_ms
            if self._takeoff_off_ground(tm) or dt > 1400:
                self.att_ramp_active = False

        if not self.takeoff_started and not self.att_ramp_active:
            inferred_air = (
                (tm.have_ext and tm.landed_state != LANDED_ON_GROUND)
                or (not math.isnan(self.alt_max_m) and F32(self.alt_max_m) > F32(0.05))
                or (servo_fresh and mot_avg > 1300.0))
            if inferred_air:
                self.takeoff_started = True
                self.takeoff_started_ms = t
                if tm.have_att:
                    self.yaw_target_valid = True
                    self.yaw_target_deg = tm.yaw_deg
            else:
                self._enter(tm, CL_LIFTOFF_ASSIST)
                return

        if not self.takeoff_started and (mot_started or off_ground):
            self.takeoff_started = True
            self.takeoff_started_ms = t
            if tm.have_att:
                self.yaw_target_valid = True
                self.yaw_target_deg = tm.yaw_deg

        if not self.takeoff_started and (t - self.takeoff_sent_ms) > 8000:
            self._enter(tm, CL_LIFTOFF_ASSIST)
            return

        if (not math.isnan(self.alt_max_m)
                and F32(self.alt_max_m)
                >= F32(self.takeoff_target_m) - F32(0.05)):
            if not self.yaw_target_valid and tm.have_att:
                self.yaw_target_valid = True
                self.yaw_target_deg = tm.yaw_deg
            self._enter(tm, CL_HOVER)

    def _assist_tick_cl(self, tm: Telemetry, out: Outputs) -> None:
        # clean:2038-2095: GUIDED attitude+thrust, sqrt ease-out
        t = tm.t_ms
        if t - self.assist_start_ms < 150:
            self._emit_mode(tm, out, MODE_GUIDED)

        servo_fresh = tm.have_servo and (t - tm.servo_last_ms) < 200
        if not self.assist_baseline_set and servo_fresh:
            self.assist_motor_avg0 = tm.motor_avg
            self.assist_baseline_set = True

        if t - self.assist_last_send_ms >= 40:
            self.assist_last_send_ms = t
            dt = t - self.assist_start_ms
            u = F32(1.0) if dt >= 800 else F32(dt) / F32(800.0)
            u = min(max(u, F32(0.0)), F32(1.0))
            ue = F32(math.sqrt(float(u)))
            thr = (F32(1.0) - ue) * F32(1550.0) + ue * F32(1850.0)
            thr_norm = float(min(max((thr - F32(1000.0)) / F32(1000.0),
                                     F32(0.0)), F32(1.0)))
            yaw = tm.yaw_deg if tm.have_att else 0.0
            out.cmd_kind = CMD_ATT_THRUST
            out.cmd = (min(thr_norm, 0.90), yaw, 0.0, 0.0)

        if (not self.assist_warned and self.assist_baseline_set
                and (t - self.assist_start_ms) > 250 and servo_fresh
                and not math.isnan(self.assist_motor_avg0)
                and F32(tm.motor_avg) - F32(self.assist_motor_avg0) < F32(15.0)):
            self.assist_warned = True

        if self._takeoff_off_ground(tm):
            self._emit_mode(tm, out, MODE_GUIDED)
            out.req_takeoff = self.takeoff_target_m
            self._enter(tm, CL_TAKEOFF)
            return
        if (t - self.assist_start_ms) > 2000:
            self._enter(tm, CL_DISARMING)

    def _hover_hold_tick_cl(self, tm: Telemetry, out: Outputs) -> None:
        # clean:1065-1103
        if not tm.have_att:
            return
        t = tm.t_ms
        lpos_recent = self._lpos_fresh(tm)

        self._prelock_capture(tm)

        if not self.hover_xy_locked and self._vel_xy_stable(tm):
            if self.hover_prelock_valid:
                self.hover_lock_x = self.hover_prelock_x
                self.hover_lock_y = self.hover_prelock_y
            elif (lpos_recent and math.isfinite(tm.lpos_x)
                  and math.isfinite(tm.lpos_y)):
                self.hover_lock_x = tm.lpos_x
                self.hover_lock_y = tm.lpos_y
            self.hover_xy_locked = True

        yaw = (self.yaw_target_deg if self.yaw_target_valid else tm.yaw_deg)
        z_down = self._hover_target_z_down()
        if not self.hover_xy_locked or not lpos_recent:
            out.cmd_kind = CMD_Z_YAW
            out.cmd = (z_down, yaw, 0.0, 0.0)
        else:
            out.cmd_kind = CMD_POS_YAW
            out.cmd = (self.hover_lock_x, self.hover_lock_y, z_down, yaw)
