"""Behavior state machine: golden closed-loop scenarios + exact trace
equality between the golden model and the branchless JAX machine.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from micro_quad_slam_tpu.golden.behavior import (
    CMD_POS_YAW,
    CMD_RC_OVERRIDE,
    CMD_VEL_BODY,
    MODE_GUIDED,
    MODE_LAND,
    ST_ARMING,
    ST_DISARMING,
    ST_EXPLORE,
    ST_HOVER,
    ST_IDLE,
    ST_LANDING,
    ST_LIFTOFF_ASSIST,
    ST_TAKEOFF,
    ST_TURNING,
    ST_WAIT_LINK,
    GoldenBehavior,
    Telemetry,
)
from micro_quad_slam_tpu.models.behavior import behavior_init, behavior_step
from micro_quad_slam_tpu.utils.config import UL_PROFILE

from fc_mock import FcMock, Scenario, run_scenario


# ------------------------- golden scenario behavior -----------------------

def states_of(outs):
    return [o.state for o in outs]


def test_nominal_mission_reaches_explore():
    telems, outs = run_scenario(Scenario(seed=1), n_ticks=1500)
    st = states_of(outs)
    for s in (ST_IDLE, ST_ARMING, ST_TAKEOFF, ST_HOVER, ST_EXPLORE):
        assert s in st, f"state {s} never reached"
    # hover must emit position-hold commands once stable
    assert any(o.cmd_kind == CMD_POS_YAW for o in outs)
    # map init requested exactly once from hover
    assert sum(1 for o in outs if o.map_init) >= 1


def test_hover_test_only_parks_in_hover():
    """HOVER_TEST_ONLY (uav_local_nav.c:522,2196) — the one behavior-
    affecting compile-time toggle: HOVER's break lands after hover hold
    and map init, before the EXPLORE gate.  The nominal mission reaches
    HOVER, holds position, inits the map, and never leaves; golden and
    JAX twins agree on the full trace."""
    gb = GoldenBehavior(hover_test_only=True)
    telems, gouts = run_scenario(Scenario(seed=1), n_ticks=1500, machine=gb)
    st = states_of(gouts)
    assert ST_HOVER in st
    assert ST_EXPLORE not in st and ST_TURNING not in st
    assert st[-1] == ST_HOVER
    assert any(o.cmd_kind == CMD_POS_YAW for o in gouts)   # still holds
    assert sum(1 for o in gouts if o.map_init) >= 1        # still inits map

    cfg = UL_PROFILE.replace(behavior=dataclasses.replace(
        UL_PROFILE.behavior, hover_test_only=True))
    jouts = run_jax_trace(telems, cfg)
    np.testing.assert_array_equal(jouts["state"], np.asarray(st))
    np.testing.assert_array_equal(
        jouts["cmd_kind"], np.asarray([o.cmd_kind for o in gouts]))


def test_disarm_command_lands_disarms():
    telems, outs = run_scenario(
        Scenario(seed=2, disarm_at_ms=12000), n_ticks=1200)
    st = states_of(outs)
    assert ST_DISARMING in st
    assert st[-1] in (ST_IDLE, ST_DISARMING)


def test_takeoff_rejection_falls_back_to_assist():
    telems, outs = run_scenario(Scenario(seed=3, reject_takeoff=True),
                                n_ticks=1200)
    st = states_of(outs)
    assert ST_LIFTOFF_ASSIST in st
    assert any(o.cmd_kind == CMD_RC_OVERRIDE for o in outs)
    # assist works -> should still reach hover
    assert ST_HOVER in st


def test_no_spool_triggers_ramp_then_assist():
    telems, outs = run_scenario(
        Scenario(seed=4, no_spool=True, ramp_works=False), n_ticks=1500)
    st = states_of(outs)
    assert ST_LIFTOFF_ASSIST in st
    # assist fails too (ramp_works False) -> abort to DISARMING
    assert ST_DISARMING in st


def test_battery_sag_forces_landing():
    telems, outs = run_scenario(
        Scenario(seed=5, batt_v0=7.8, batt_sag=0.06), n_ticks=2000)
    st = states_of(outs)
    assert ST_LANDING in st
    assert any(o.req_mode == MODE_LAND for o in outs)


def test_link_loss_goes_wait_link():
    telems, outs = run_scenario(
        Scenario(seed=6, link_loss_ms=(8000, 9000)), n_ticks=800)
    st = states_of(outs)
    assert ST_WAIT_LINK in st[400:450]


def test_unexpected_disarm_goes_idle():
    telems, outs = run_scenario(Scenario(seed=7, kill_at_ms=9000),
                                n_ticks=700)
    st = states_of(outs)
    k = 9000 // 20
    # the unexpected-disarm guard enters IDLE mid-tick; the same tick's
    # switch then runs the IDLE case and (want_arm still set) re-enters
    # ARMING, so the logged state is ARMING — same as the C trace.
    assert st[k - 1] not in (ST_IDLE, ST_ARMING)
    assert ST_ARMING in st[k:k + 60]


# ------------------------- golden vs jax trace equality -------------------

_TM_KEYS = [
    ("t_ms", np.int32), ("have_fc", bool), ("fc_armed", bool),
    ("hb_custom_mode", np.int32), ("have_ext", bool),
    ("landed_state", np.int32), ("have_sys", bool), ("sys_last_ms", np.int32),
    ("sys_health", np.uint32), ("sys_enabled", np.uint32), ("have_servo", bool),
    ("servo_last_ms", np.int32), ("motor_avg", np.float32),
    ("batt_vpc", np.float32), ("batt_cells", np.int32),
    ("batt_last_ms", np.int32), ("batt_valid", bool), ("have_lpos", bool),
    ("lpos_last_ms", np.int32), ("lpos_x", np.float32),
    ("lpos_y", np.float32), ("lpos_alt_filt", np.float32),
    ("have_att", bool), ("yaw_deg", np.float32), ("have_of", bool),
    ("of_last_ms", np.int32), ("of_q", np.int32), ("have_rf", bool),
    ("rf_last_ms", np.int32), ("rf_m", np.float32), ("want_arm", bool),
    ("have_takeoff_ack", bool), ("takeoff_ack_res", np.int32),
    ("takeoff_ack_ms", np.int32), ("takeoff_accept_ms", np.int32),
    ("map_inited", bool), ("frontier_f", np.int32), ("frontier_r", np.int32),
    ("frontier_l", np.int32), ("frontier_b", np.int32),
]


def telems_to_arrays(telems):
    """List[Telemetry] -> dict of [T(,B=1)] arrays for the jax machine."""
    d = {}
    for k, dt in _TM_KEYS:
        d[k] = np.asarray([getattr(tm, k) for tm in telems], dtype=dt)
    d["tof_min"] = np.asarray([tm.tof_min for tm in telems], np.float32)
    return d


def run_jax_trace(telems, cfg=UL_PROFILE):
    arrs = telems_to_arrays(telems)
    T = arrs["t_ms"].shape[0]
    seq = {k: jnp.asarray(v)[:, None] if v.ndim == 1 else jnp.asarray(v)[:, None, :]
           for k, v in arrs.items()}

    step = jax.jit(lambda s, f: behavior_step(s, f, cfg))

    def scan_fn(state, fr):
        st, out = behavior_step(state, fr, cfg)
        return st, out

    state = behavior_init(1)
    final, outs = jax.jit(
        lambda s0, sq: jax.lax.scan(scan_fn, s0, sq)
    )(state, seq)
    return {k: np.asarray(v[:, 0] if v.ndim >= 2 else v) for k, v in outs.items()}


SCENARIOS = [
    Scenario(seed=11),
    Scenario(seed=12, disarm_at_ms=14000),
    Scenario(seed=13, reject_takeoff=True),
    Scenario(seed=14, no_spool=True, ramp_works=False),
    Scenario(seed=15, no_spool=True, ramp_works=True),
    Scenario(seed=16, batt_v0=7.8, batt_sag=0.06),
    Scenario(seed=17, flow_dropout_ms=(7000, 9500)),
    Scenario(seed=18, sys_glitch_ms=(8000, 8600)),
    Scenario(seed=19, link_loss_ms=(5000, 6000)),
    Scenario(seed=20, kill_at_ms=11000),
    # ceiling latch/descend-override/release (uav:2025-2028; round 5)
    Scenario(seed=21, alt_overshoot_m=0.25, overshoot_until_ms=9000),
]


# default run keeps the nominal + the two ladder-heavy scenarios; the
# rest (plus the fuzz and batched-lane suites) run under --runslow —
# the golden side itself is machine-checked against the compiled
# reference C every default run (test_control_tick_vs_c.py)
@pytest.mark.parametrize(
    "sc", [(s if s.seed in (11, 14, 15, 21) else
            pytest.param(s, marks=pytest.mark.slow)) for s in SCENARIOS],
    ids=lambda s: f"seed{getattr(s, 'seed', s)}")
def test_jax_matches_golden_trace(sc):
    telems, gouts = run_scenario(sc, n_ticks=1100)
    jouts = run_jax_trace(telems)

    g_state = np.asarray([o.state for o in gouts])
    np.testing.assert_array_equal(jouts["state"], g_state)

    np.testing.assert_array_equal(
        jouts["cmd_kind"], np.asarray([o.cmd_kind for o in gouts]))
    np.testing.assert_allclose(
        jouts["cmd"], np.asarray([o.cmd for o in gouts], np.float32),
        rtol=0, atol=2e-5)
    np.testing.assert_array_equal(
        jouts["req_mode"], np.asarray([o.req_mode for o in gouts]))
    np.testing.assert_array_equal(
        jouts["req_arm"], np.asarray([o.req_arm for o in gouts]))
    g_to = np.asarray([o.req_takeoff for o in gouts], np.float32)
    np.testing.assert_array_equal(np.isnan(jouts["req_takeoff"]), np.isnan(g_to))
    np.testing.assert_array_equal(
        jouts["rc_release"], np.asarray([o.rc_release for o in gouts]))
    np.testing.assert_array_equal(
        jouts["kf_flags"], np.asarray([o.kf_flags for o in gouts]))
    np.testing.assert_array_equal(
        jouts["map_init"], np.asarray([o.map_init for o in gouts]))
    np.testing.assert_array_equal(
        jouts["ceiling"], np.asarray([o.ceiling for o in gouts]))
    np.testing.assert_array_equal(
        jouts["alt_src"], np.asarray([o.alt_src for o in gouts]))


@pytest.mark.slow
def test_jax_batched_scenarios_match_lanewise():
    """All scenarios in ONE batched run: lane b must equal scenario b's
    single-lane trace (the vmap-consistency property for the machine)."""
    all_telems = [run_scenario(sc, n_ticks=600)[0] for sc in SCENARIOS[:4]]
    arrs = [telems_to_arrays(t) for t in all_telems]
    batched = {k: jnp.asarray(np.stack([a[k] for a in arrs], axis=1))
               for k in arrs[0]}

    def scan_fn(state, fr):
        return behavior_step(state, fr, UL_PROFILE)

    final, outs = jax.jit(
        lambda s0, sq: jax.lax.scan(scan_fn, s0, sq)
    )(behavior_init(4), batched)

    for b in range(4):
        single = run_jax_trace(all_telems[b])
        np.testing.assert_array_equal(np.asarray(outs["state"][:, b]),
                                      single["state"])
        np.testing.assert_array_equal(np.asarray(outs["cmd_kind"][:, b]),
                                      single["cmd_kind"])


@pytest.mark.slow
def test_jax_matches_golden_fuzzed_schedules():
    """Randomized anomaly-schedule fuzz: 256 seeded scenarios run through
    the golden machine, then all 256 lanes replayed in ONE batched jax
    scan — every lane's state/command trace must match its golden trace
    exactly.  Catches timer/gate interactions the scripted scenarios
    miss (VERDICT round-1 weak item 4)."""
    from fc_mock import random_scenario

    N_SEEDS, T = 256, 700
    runs = [run_scenario(random_scenario(s), n_ticks=T)
            for s in range(N_SEEDS)]
    arrs = [telems_to_arrays(telems) for telems, _ in runs]
    batched = {k: jnp.asarray(np.stack([a[k] for a in arrs], axis=1))
               for k in arrs[0]}

    def scan_fn(state, fr):
        return behavior_step(state, fr, UL_PROFILE)

    _, outs = jax.jit(
        lambda s0, sq: jax.lax.scan(scan_fn, s0, sq)
    )(behavior_init(N_SEEDS), batched)

    j_state = np.asarray(outs["state"])
    j_kind = np.asarray(outs["cmd_kind"])
    j_cmd = np.asarray(outs["cmd"])
    j_kf = np.asarray(outs["kf_flags"])
    j_src = np.asarray(outs["alt_src"])
    for b, (_, gouts) in enumerate(runs):
        msg = f"fuzz seed {b}"
        np.testing.assert_array_equal(
            j_state[:, b], [o.state for o in gouts], err_msg=msg)
        np.testing.assert_array_equal(
            j_kind[:, b], [o.cmd_kind for o in gouts], err_msg=msg)
        np.testing.assert_allclose(
            j_cmd[:, b], np.asarray([o.cmd for o in gouts], np.float32),
            rtol=0, atol=2e-5, err_msg=msg)
        np.testing.assert_array_equal(
            j_kf[:, b], [o.kf_flags for o in gouts], err_msg=msg)
        np.testing.assert_array_equal(
            j_src[:, b], [o.alt_src for o in gouts], err_msg=msg)
