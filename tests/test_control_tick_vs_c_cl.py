"""Machine-checked CLEAN control_tick: replay the SAME telemetry streams
through the golden CL behavior machine (golden/behavior_cl.py) and
through the clean binary's REAL control_tick (clean_uav_fc_tof_nav.c:
2339-2660 + enter_state :1957-2031 + the prearm hover_ready_stable gate
:1025-1036/:2452-2462 + the hover stale-sensor failsafe :2422-2442 +
the 10 Hz snapshot tick :2350-2357 + senders, compiled verbatim by
tools/refshim_ct_cl.py with the mavlink sends recorded), and assert the
(state, pending-kf, mode/arm/takeoff requests, setpoint kind + values,
alt estimate/max/source, ceiling, hover lock) traces agree
tick-for-tick.

Closes VERDICT round-4 missing 3 (the clean control_tick was verified
golden<->JAX only).  First dividend: the machine-check exposed that the
clean set_mode_custom SUPPRESSES same-mode requests before its rate
limit (clean:607-608) — the UL variant does not — which both the golden
and JAX CL twins had missed; fixed in this round and locked here.

Scenario coverage: 12 scripted anomaly scenarios + 96 randomized
anomaly schedules; a coverage floor asserts the C trace itself visits
all 8 CL states.  Mutation-sensitivity verified at build time: removing
the same-mode suppression is caught by seed 54/61, perturbing the
prearm hold (400->380 ms) by seed 51, and shifting the off-ground
threshold (0.05->0.06) by seed 55.
"""

import ctypes
import math

import numpy as np
import pytest

from micro_quad_slam_tpu.golden.behavior import (
    CMD_ATT_THRUST,
    CMD_NONE,
    CMD_POS_YAW,
    CMD_VEL_BODY,
    CMD_VEL_NED,
)
from micro_quad_slam_tpu.golden.behavior_cl import CMD_Z_YAW, GoldenBehaviorCL

from fc_mock import Scenario, random_scenario, run_scenario

refshim_ct_cl = pytest.importorskip("tools.refshim_ct_cl")

FRAME_BODY, FRAME_NED = 7, 1
B_IGN_X, B_IGN_VX = 1 << 0, 1 << 3


@pytest.fixture(scope="module")
def clct_so(tmp_path_factory):
    so = refshim_ct_cl.build_shim_ct_cl(
        str(tmp_path_factory.mktemp("refshim_clct")))
    if so is None:
        pytest.skip("reference tree or gcc unavailable")
    return so


def _telem_arrays(tm):
    I = (ctypes.c_int64 * 32)(
        int(tm.have_fc), int(tm.fc_armed), int(tm.hb_custom_mode),
        int(tm.have_ext), int(tm.landed_state), int(tm.have_sys),
        int(tm.sys_last_ms), int(tm.sys_health), int(tm.sys_enabled),
        int(tm.have_servo), int(tm.servo_last_ms), int(tm.motor_avg),
        int(tm.batt_cells), int(tm.batt_last_ms), int(tm.batt_valid),
        int(tm.have_lpos), int(tm.lpos_last_ms), int(tm.have_att),
        int(tm.have_of), int(tm.of_last_ms), int(tm.of_q),
        int(tm.have_rf), int(tm.rf_last_ms), int(tm.want_arm),
        int(tm.have_takeoff_ack), 0)
    F = (ctypes.c_float * 16)(
        np.float32(tm.batt_vpc),
        np.float32(tm.batt_vpc * tm.batt_cells if tm.batt_cells else np.nan),
        np.float32(tm.lpos_x), np.float32(tm.lpos_y),
        np.float32(tm.lpos_alt_filt), np.float32(tm.yaw_deg),
        np.float32(tm.rf_m), np.float32(tm.tof_min[0]),
        np.float32(tm.tof_min[1]), np.float32(tm.tof_min[2]),
        np.float32(tm.tof_min[3]), 0, 0, 0, 0, 0)
    return I, F


def _parse_recs(recs, n):
    """Recorded C commands -> golden-Outputs-shaped observables.  CL
    setpoint discrimination is by type_mask: ignore-x + ignore-vx =>
    Z-only (send_z_yaw_ned, clean:747); ignore-x alone => velocity;
    else position (clean:664,712)."""
    out = {"req_mode": -1, "req_arm": -1, "req_takeoff": float("nan"),
           "cmd_kind": CMD_NONE, "cmd": None, "rc_release": False,
           "n_setpoints": 0, "do_set_modes": []}
    for i in range(n):
        r = [recs[i * 13 + j] for j in range(13)]
        kind = int(r[0])
        if kind == 1:
            cmd = int(r[1])
            if cmd == 400:
                out["req_arm"] = 1 if r[2] == 1.0 else 0
                if out["req_arm"] == 0:
                    assert r[3] == 21196.0, "disarm must carry force code"
            elif cmd == 22:
                out["req_takeoff"] = r[8]
            elif cmd == 176:
                out["do_set_modes"].append(int(r[3]))
        elif kind == 3:
            out["req_mode"] = int(r[2])
        elif kind == 4:
            out["n_setpoints"] += 1
            frame, mask = int(r[1]), int(r[2])
            if (mask & B_IGN_X) and (mask & B_IGN_VX):
                out["cmd_kind"] = CMD_Z_YAW
                out["cmd"] = (r[5], math.degrees(r[9]), 0.0, 0.0)
            elif mask & B_IGN_X:
                out["cmd_kind"] = (CMD_VEL_BODY if frame == FRAME_BODY
                                   else CMD_VEL_NED)
                out["cmd"] = (r[6], r[7], r[8], math.degrees(r[10]))
            else:
                out["cmd_kind"] = CMD_POS_YAW
                out["cmd"] = (r[3], r[4], r[5], math.degrees(r[9]))
        elif kind == 5:
            out["n_setpoints"] += 1
            out["cmd_kind"] = CMD_ATT_THRUST
            yaw = math.degrees(2.0 * math.atan2(r[5], r[2]))
            out["cmd"] = (r[1], yaw, 0.0, 0.0)
        elif kind == 6:
            if all(v == 65535.0 for v in r[1:5]):
                out["rc_release"] = True
        # kind 2 (heartbeat) / 8 (rcmap param read): cadence-only
    return out


def _wrap180(d):
    return (d + 180.0) % 360.0 - 180.0


def _run_and_compare(clct_so, sc, n_ticks, tag):
    telems, _ = run_scenario(sc, n_ticks=n_ticks,
                             machine=GoldenBehaviorCL())
    for tm in telems:   # the C averages uint16 servo outputs
        tm.motor_avg = float(int(round(tm.motor_avg)))
    gb = GoldenBehaviorCL()
    lib = refshim_ct_cl.load_shim_ct_cl(clct_so, fresh=True)
    oi = (ctypes.c_int64 * 8)()
    of = (ctypes.c_float * 8)()
    recs = (ctypes.c_float * (64 * 13))()
    nrec = ctypes.c_int64()
    seen = set()
    for k, tm in enumerate(telems):
        out = gb.step(tm)
        I, F = _telem_arrays(tm)
        lib.clct_set_telem(I, F)
        lib.clct_tick(tm.t_ms, oi, of, recs, ctypes.byref(nrec))
        c = _parse_recs(recs, int(nrec.value))
        seen.add(int(oi[0]))
        msg = f"{tag} tick {k} t={tm.t_ms}"
        # discrete observables: exact
        assert int(oi[0]) == out.state, (msg, int(oi[0]), out.state)
        assert int(oi[1]) == out.kf_flags, (msg, int(oi[1]), out.kf_flags)
        assert int(oi[2]) == int(gb.hover_xy_locked), msg
        assert int(oi[3]) == out.alt_src, msg
        assert bool(oi[4]) == out.ceiling, msg
        assert bool(oi[5]) == gb.yaw_target_valid, msg
        assert bool(oi[6]) == (tm.have_takeoff_ack
                               and not out.clear_takeoff_ack), msg
        assert bool(oi[7]) == gb.hover_prelock_valid, msg
        assert c["req_mode"] == out.req_mode, (msg, c, out)
        assert c["do_set_modes"] == (
            [out.req_mode] if out.req_mode >= 0 else []), msg
        assert c["req_arm"] == out.req_arm, (msg, c, out)
        g_to, c_to = out.req_takeoff, c["req_takeoff"]
        assert math.isnan(g_to) == math.isnan(c_to), (msg, c, out)
        if not math.isnan(g_to):
            assert abs(g_to - c_to) < 1e-5, msg
        assert not c["rc_release"], msg   # CL never RC-overrides
        assert c["n_setpoints"] <= 1, msg
        assert c["cmd_kind"] == out.cmd_kind, (msg, c, out)
        if c["cmd"] is not None:
            g = out.cmd
            if c["cmd_kind"] in (CMD_VEL_BODY, CMD_VEL_NED):
                for j in range(3):
                    assert abs(c["cmd"][j] - g[j]) < 1e-5, (msg, c, g)
                assert abs(_wrap180(c["cmd"][3] - g[3])) < 2e-3, (msg, c, g)
            elif c["cmd_kind"] == CMD_POS_YAW:
                for j in range(3):
                    assert abs(c["cmd"][j] - g[j]) < 1e-5, (msg, c, g)
                assert abs(_wrap180(c["cmd"][3] - g[3])) < 2e-3, (msg, c, g)
            elif c["cmd_kind"] == CMD_Z_YAW:
                assert abs(c["cmd"][0] - g[0]) < 1e-6, (msg, c, g)
                assert abs(_wrap180(c["cmd"][1] - g[1])) < 2e-3, (msg, c, g)
            elif c["cmd_kind"] == CMD_ATT_THRUST:
                assert abs(c["cmd"][0] - g[0]) < 1e-5, (msg, c, g)
                assert abs(_wrap180(c["cmd"][1] - g[1])) < 2e-2, (msg, c, g)
        # alt estimate / max: identical f32 inputs -> exact (NaN-aware)
        for gv, cv in ((out.alt_est, of[0]), (gb.alt_max_m, of[1])):
            ge, ce = np.float32(gv), np.float32(cv)
            assert (np.isnan(ge) and np.isnan(ce)) or ge == ce, msg
        if gb.yaw_target_valid:
            assert abs(_wrap180(of[2] - gb.yaw_target_deg)) < 2e-3, msg
        if gb.hover_xy_locked:
            assert abs(of[3] - gb.hover_lock_x) < 1e-5, msg
            assert abs(of[4] - gb.hover_lock_y) < 1e-5, msg
    return seen


CLCT_SCENARIOS = [
    Scenario(seed=51),
    Scenario(seed=52, disarm_at_ms=14000),
    Scenario(seed=53, reject_takeoff=True),   # CL ignores acks: still flies
    Scenario(seed=54, no_spool=True, ramp_works=False),
    Scenario(seed=55, no_spool=True, ramp_works=True),
    Scenario(seed=56, batt_v0=7.8, batt_sag=0.06),   # log-only failsafe
    Scenario(seed=57, flow_dropout_ms=(7000, 9500)),
    Scenario(seed=58, sys_glitch_ms=(8000, 8600)),
    Scenario(seed=59, link_loss_ms=(5000, 6000)),
    Scenario(seed=60, kill_at_ms=11000),
    Scenario(seed=61, lpos_dropout_ms=(9000, 14000)),  # stale -> LANDING
    # FC overshoots past the 0.90 m ceiling then sinks: the CL ceiling
    # override (pos-hold-if-locked / Z-only clamp, clean:2404-2419) and
    # the alt_max-based release (<= 0.80 m) fire — no other scenario
    # reaches them (round-5 coverage fix)
    Scenario(seed=62, alt_overshoot_m=0.60, overshoot_until_ms=9000),
]


def test_clean_control_tick_ceiling_branch_fires(clct_so):
    """Coverage guard: the overshoot scenario must latch AND release the
    ceiling in the C trace (oi[4])."""
    sc = CLCT_SCENARIOS[-1]
    telems, _ = run_scenario(sc, n_ticks=1100,
                             machine=GoldenBehaviorCL())
    for tm in telems:
        tm.motor_avg = float(int(round(tm.motor_avg)))
    lib = refshim_ct_cl.load_shim_ct_cl(clct_so, fresh=True)
    oi = (ctypes.c_int64 * 8)()
    of = (ctypes.c_float * 8)()
    recs = (ctypes.c_float * (64 * 13))()
    nrec = ctypes.c_int64()
    ceil_trace = []
    for tm in telems:
        I, F = _telem_arrays(tm)
        lib.clct_set_telem(I, F)
        lib.clct_tick(tm.t_ms, oi, of, recs, ctypes.byref(nrec))
        ceil_trace.append(bool(oi[4]))
    assert any(ceil_trace), "ceiling never latched"
    assert not ceil_trace[-1], "ceiling never released"


@pytest.mark.parametrize("sc", CLCT_SCENARIOS, ids=lambda s: f"seed{s.seed}")
def test_clean_control_tick_matches_c_scripted(clct_so, sc):
    _run_and_compare(clct_so, sc, 1100, f"scripted{sc.seed}")


def test_clean_control_tick_matches_c_fuzzed(clct_so):
    """96 randomized anomaly schedules through the compiled clean
    control_tick — the C twin of the golden<->JAX CL fuzz
    (test_behavior_cl.py); schedules include transient ceiling
    overshoots since round 5."""
    for s in range(96):
        _run_and_compare(clct_so, random_scenario(s), 700, f"fuzz{s}")


def test_clean_control_tick_c_reaches_all_cl_states(clct_so):
    """Coverage floor: across the scripted scenarios the C trace itself
    visits all 8 CL states (WAIT_LINK..DISARMING)."""
    seen = set()
    for sc in CLCT_SCENARIOS:
        seen |= _run_and_compare(clct_so, sc, 1100, f"cov{sc.seed}")
    assert seen == set(range(8)), sorted(seen)
