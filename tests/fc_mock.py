"""Minimal flight-controller + world mock for behavior-machine tests.

Plays the role of ArduPilot + sensors: reacts to the behavior machine's
emitted commands (arm/disarm, mode, NAV_TAKEOFF, setpoints) with simple
first-order dynamics, and produces the per-tick Telemetry snapshot.
Anomaly knobs (per scenario) steer coverage into the failure-handling
paths: takeoff-ack rejection, motor-spool failure (thrust-ramp +
liftoff-assist ladders), battery sag, flow-quality dropouts, sys-health
glitches, link loss, unexpected disarm.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from micro_quad_slam_tpu.golden.behavior import (
    CMD_ATT_THRUST,
    CMD_RC_OVERRIDE,
    CMD_VEL_BODY,
    CMD_VEL_NED,
    LANDED_IN_AIR,
    LANDED_ON_GROUND,
    MODE_GUIDED,
    MODE_LAND,
    RES_ACCEPTED,
    RES_DENIED,
    Telemetry,
)

HEALTH_ALL = 0x01 | 0x2000 | 0x4000 | 0x400000


@dataclasses.dataclass
class Scenario:
    seed: int = 0
    arm_at_ms: int = 1000
    disarm_at_ms: int = 10 ** 9
    reject_takeoff: bool = False     # DENY the first NAV_TAKEOFF
    no_spool: bool = False           # motors never pass 1150 us on NAV_TAKEOFF
    ramp_works: bool = True          # thrust ramp/assist actually lifts off
    batt_v0: float = 8.0             # 2S pack voltage
    batt_sag: float = 0.0            # volts/second sag once armed
    flow_dropout_ms: tuple = ()      # (start, end) of of_q collapse
    sys_glitch_ms: tuple = ()        # (start, end) with gyro bit cleared
    link_loss_ms: tuple = ()         # (start, end) with no FC heartbeat
    lpos_dropout_ms: tuple = ()      # (start, end) with stale LOCAL_POSITION
    rf_dropout_ms: tuple = ()        # (start, end) with stale rangefinder
    kill_at_ms: int = 10 ** 9        # FC-side unexpected disarm
    front_wall_m: float = 3.0        # initial front clearance
    tick_ms: int = 20
    # FC overshoots the takeoff/hold target by this much (m) while
    # t < overshoot_until_ms: drives the quad past the ceiling latch
    # (UL 0.70 m / CL 0.90 m) so the ceiling-override branches fire
    # (uav_local_nav.c:2025-2028, clean:2404-2419), then decays so the
    # release hysteresis (-0.10 m) is exercised too — without it no
    # scenario ever reaches either branch
    alt_overshoot_m: float = 0.0
    overshoot_until_ms: int = 10 ** 9


class FcMock:
    def __init__(self, sc: Scenario):
        self.sc = sc
        self.rng = np.random.default_rng(sc.seed)
        self.armed = False
        self.mode = 0
        self.alt = 0.0
        self.climb = 0.0
        self.yaw = float(self.rng.uniform(-180, 180))
        self.motor = 1000.0
        self.takeoff_active = False
        self.takeoff_target = 0.0
        self.have_ack = False
        self.ack_res = 0
        self.ack_ms = 0
        self.accept_ms = 0
        self.rejected_once = False
        self.batt_v = sc.batt_v0
        self.rc_override_thr = None
        self.z_target = None
        self.want_arm = False
        self.killed = False
        # world: distances per direction (front shrinks while exploring)
        self.front = sc.front_wall_m
        self.yaw_rate_cmd = 0.0
        self.fwd_cmd = 0.0

    def _in(self, t, win):
        return bool(win) and win[0] <= t < win[1]

    def apply_outputs(self, t: int, out) -> None:
        sc = self.sc
        if out.req_mode >= 0:
            self.mode = out.req_mode
        if out.req_arm == 1 and not self.killed:
            self.armed = True
        if out.req_arm == 0:
            self.armed = False
        if not math.isnan(out.req_takeoff):
            if sc.reject_takeoff and not self.rejected_once:
                self.rejected_once = True
                self.have_ack = True
                self.ack_res = RES_DENIED
                self.ack_ms = t
            else:
                self.have_ack = True
                self.ack_res = RES_ACCEPTED
                self.ack_ms = t
                self.accept_ms = t
                self.takeoff_active = True
                self.takeoff_target = out.req_takeoff
        if out.clear_takeoff_ack:
            self.have_ack = False
            self.ack_res = 0
            self.ack_ms = 0
            self.accept_ms = 0
        self.yaw_rate_cmd = 0.0
        self.fwd_cmd = 0.0
        self.z_target = None
        if out.cmd_kind == CMD_VEL_BODY:
            self.fwd_cmd = out.cmd[0]
            self.yaw_rate_cmd = out.cmd[3]
        elif out.cmd_kind == CMD_VEL_NED:
            self.climb = -out.cmd[2]  # +down commanded
        elif out.cmd_kind == 3:  # CMD_POS_YAW carries a z_down target
            self.z_target = -out.cmd[2]
        elif out.cmd_kind == 6:  # CMD_Z_YAW (clean Z-only setpoint)
            self.z_target = -out.cmd[0]
        elif out.cmd_kind == CMD_ATT_THRUST:
            if self.sc.ramp_works and self.armed:
                self.motor = max(self.motor, 1000 + out.cmd[0] * 600)
        elif out.cmd_kind == CMD_RC_OVERRIDE:
            if self.sc.ramp_works and self.armed:
                self.rc_override_thr = out.cmd[2]
        if out.rc_release:
            self.rc_override_thr = None

    def tick(self, t: int) -> None:
        sc = self.sc
        dt = sc.tick_ms * 1e-3
        if t >= sc.kill_at_ms:
            self.killed = True
            self.armed = False
        # motor dynamics
        if self.armed:
            if self.takeoff_active and not sc.no_spool:
                self.motor = min(1600.0, self.motor + 600.0 * dt)
            if self.rc_override_thr is not None:
                self.motor = max(self.motor, self.rc_override_thr)
        else:
            self.motor = 1000.0
        # altitude dynamics
        if self.armed and self.motor > 1150.0:
            if self.mode == MODE_LAND:
                self.alt = max(0.0, self.alt - 0.35 * dt)
            elif self.takeoff_active:
                over = (sc.alt_overshoot_m if t < sc.overshoot_until_ms
                        else 0.0)
                cap = self.takeoff_target + 0.02 + over
                if self.alt < cap:
                    self.alt = min(cap, self.alt + 0.45 * dt)
                else:   # overshoot expired: sink back toward the target
                    self.alt = max(cap, self.alt - 0.25 * dt)
            elif self.climb:
                self.alt = max(0.0, self.alt + self.climb * dt)
            elif self.z_target is not None:
                rate = max(-0.3, min(0.3, (self.z_target - self.alt) * 1.5))
                self.alt = max(0.0, self.alt + rate * dt)
        elif not self.armed:
            self.alt = max(0.0, self.alt - 1.0 * dt)
        self.climb = 0.0
        # yaw + exploration world
        self.yaw += self.yaw_rate_cmd * dt
        while self.yaw >= 180.0:
            self.yaw -= 360.0
        while self.yaw < -180.0:
            self.yaw += 360.0
        if self.fwd_cmd:
            self.front = max(0.25, self.front - self.fwd_cmd * dt)
        elif abs(self.yaw_rate_cmd) > 1.0:
            # turning resets the wall ahead
            self.front = min(self.sc.front_wall_m,
                             self.front + 2.0 * abs(self.yaw_rate_cmd) * dt / 45.0)
        # battery
        if self.armed:
            self.batt_v = max(5.0, self.batt_v - sc.batt_sag * dt)

    def telemetry(self, t: int) -> Telemetry:
        sc = self.sc
        self.want_arm = sc.arm_at_ms <= t < sc.disarm_at_ms
        link = not self._in(t, sc.link_loss_ms)
        health = HEALTH_ALL
        if self._in(t, sc.sys_glitch_ms):
            health &= ~0x01
        of_q = 5 if self._in(t, sc.flow_dropout_ms) else 85
        airborne = self.alt > 0.05
        lpos_ok = not self._in(t, sc.lpos_dropout_ms)
        rf_ok = not self._in(t, sc.rf_dropout_ms)
        noise = float(self.rng.normal(0, 0.003))
        sides = (self.front, 2.0, 2.5, 1.5)
        return Telemetry(
            t_ms=t,
            have_fc=link,
            fc_armed=self.armed if link else False,
            hb_custom_mode=self.mode,
            have_ext=True,
            landed_state=LANDED_IN_AIR if airborne else LANDED_ON_GROUND,
            have_sys=True,
            sys_last_ms=t,
            sys_health=health,
            have_servo=True,
            servo_last_ms=t,
            motor_avg=self.motor,
            batt_vpc=self.batt_v / 2.0,
            batt_cells=2,
            batt_last_ms=t,
            # intake latch as handle_battery_status would set it for a
            # 2-cell reading (clean:1286-1294)
            batt_valid=(3.0 <= self.batt_v <= 30.0
                        and 2.5 <= self.batt_v / 2.0 <= 4.8),
            have_lpos=True,
            lpos_last_ms=t if lpos_ok else max(0, t - 5000),
            lpos_x=0.1 + noise,
            lpos_y=-0.2 + noise,
            lpos_alt_filt=self.alt + noise,
            have_att=True,
            yaw_deg=self.yaw,
            have_of=True,
            of_last_ms=t,
            of_q=of_q,
            have_rf=True,
            rf_last_ms=t if rf_ok else max(0, t - 5000),
            rf_m=self.alt + 0.03 + noise,
            want_arm=self.want_arm,
            have_takeoff_ack=self.have_ack,
            takeoff_ack_res=self.ack_res,
            takeoff_ack_ms=self.ack_ms,
            takeoff_accept_ms=self.accept_ms,
            tof_min=tuple(s + noise for s in sides),
            map_inited=t > 6000,  # the mapping layer flips this in reality
            frontier_f=int(self.rng.integers(0, 110)),
            frontier_r=int(self.rng.integers(0, 110)),
            frontier_l=int(self.rng.integers(0, 110)),
            frontier_b=int(self.rng.integers(0, 110)),
        )


def run_scenario(sc: Scenario, n_ticks: int = 1200, machine=None):
    """Run the golden machine closed-loop against the mock; return the
    recorded telemetry list + outputs list (the jax machine replays the
    same telemetry open-loop and must match)."""
    from micro_quad_slam_tpu.golden.behavior import GoldenBehavior

    m = machine or GoldenBehavior()
    fc = FcMock(sc)
    telems, outs = [], []
    for k in range(n_ticks):
        t = k * sc.tick_ms
        tm = fc.telemetry(t)
        telems.append(tm)
        out = m.step(tm)
        outs.append(out)
        fc.apply_outputs(t, out)
        fc.tick(t)
    return telems, outs


def random_scenario(seed: int) -> Scenario:
    """Randomized anomaly schedule for trace-equality fuzzing: every knob
    of the mock FC (takeoff rejection, spool failure, battery sag, sensor
    dropouts, health glitches, link loss, mid-flight kill) drawn from a
    seeded RNG so hundreds of schedules exercise timer/gate interactions
    the hand-built scenarios miss."""
    rng = np.random.default_rng(1_000_003 * seed + 17)
    kw = {"seed": seed, "arm_at_ms": int(rng.integers(400, 3000)),
          "batt_v0": float(rng.uniform(7.4, 8.4)),
          "front_wall_m": float(rng.uniform(0.7, 4.0))}
    if rng.random() < 0.30:
        kw["disarm_at_ms"] = int(rng.integers(5000, 16000))
    if rng.random() < 0.25:
        kw["reject_takeoff"] = True
    if rng.random() < 0.25:
        kw["no_spool"] = True
        kw["ramp_works"] = bool(rng.random() < 0.5)
    if rng.random() < 0.30:
        kw["batt_sag"] = float(rng.uniform(0.01, 0.10))
    for name in ("flow_dropout_ms", "sys_glitch_ms", "link_loss_ms",
                 "lpos_dropout_ms", "rf_dropout_ms"):
        if rng.random() < 0.30:
            start = int(rng.integers(3000, 13000))
            kw[name] = (start, start + int(rng.integers(200, 3500)))
    if rng.random() < 0.20:
        kw["kill_at_ms"] = int(rng.integers(4000, 14000))
    if rng.random() < 0.25:
        # transient FC altitude overshoot: exercises the ceiling latch /
        # override / release ladder (round 5) under random interleaving
        # with the other anomalies
        kw["alt_overshoot_m"] = float(rng.uniform(0.2, 0.7))
        kw["overshoot_until_ms"] = int(rng.integers(5000, 12000))
    return Scenario(**kw)
