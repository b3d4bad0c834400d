"""Clean-revision (CL) behavior machine: golden scenario tests + jax twin
trace equality.
"""

import numpy as np
import pytest

from micro_quad_slam_tpu.golden.behavior import (
    CMD_ATT_THRUST,
    CMD_POS_YAW,
    MODE_GUIDED,
    MODE_LAND,
)
from micro_quad_slam_tpu.golden.behavior_cl import (
    CL_ARMING,
    CL_DISARMING,
    CL_HOVER,
    CL_IDLE,
    CL_LANDING,
    CL_LIFTOFF_ASSIST,
    CL_TAKEOFF,
    CMD_Z_YAW,
    GoldenBehaviorCL,
)

from fc_mock import Scenario, run_scenario


def run_cl(sc, n_ticks=1200):
    return run_scenario(sc, n_ticks=n_ticks, machine=GoldenBehaviorCL())


def states_of(outs):
    return [o.state for o in outs]


def test_cl_nominal_reaches_hover_and_stays():
    telems, outs = run_cl(Scenario(seed=31), n_ticks=1500)
    st = states_of(outs)
    for s in (CL_IDLE, CL_ARMING, CL_TAKEOFF, CL_HOVER):
        assert s in st, f"state {s} never reached"
    # CL never explores: after reaching hover it stays there
    k = st.index(CL_HOVER)
    assert all(s == CL_HOVER for s in st[k + 50:]), set(st[k + 50:])
    # hover streams Z-only until XY locks, then position hold
    kinds = [o.cmd_kind for o in outs]
    assert CMD_Z_YAW in kinds
    assert CMD_POS_YAW in kinds


def test_cl_prearm_gating_blocks_arming_without_flow():
    # flow quality bad on the ground: prearm requires flow only when armed,
    # so arming proceeds; but drop the RANGEFINDER and arming must stall in
    # IDLE with GUIDED requested (hover_ready_stable false)
    telems, outs = run_cl(
        Scenario(seed=32, rf_dropout_ms=(0, 30000)), n_ticks=1000)
    st = states_of(outs)
    assert CL_ARMING not in st
    assert any(o.req_mode == MODE_GUIDED for o in outs)
    assert st[-1] == CL_IDLE


def test_cl_no_spool_ramp_then_assist_then_disarm():
    telems, outs = run_cl(
        Scenario(seed=33, no_spool=True, ramp_works=False), n_ticks=1500)
    st = states_of(outs)
    assert CL_LIFTOFF_ASSIST in st
    assert CL_DISARMING in st
    # both the takeoff ramp and the assist use attitude-thrust in CL
    assert any(o.cmd_kind == CMD_ATT_THRUST for o in outs)


def test_cl_battery_sag_logs_but_never_lands():
    telems, outs = run_cl(
        Scenario(seed=34, batt_v0=7.8, batt_sag=0.08), n_ticks=2500)
    st = states_of(outs)
    assert CL_HOVER in st
    assert CL_LANDING not in st          # actions suppressed (clean:2162-2171)
    assert any(o.kf_flags & 8 for o in outs)  # KF_BATT_LAND flag still set


def test_cl_stale_lpos_in_hover_forces_landing():
    telems, outs = run_cl(
        Scenario(seed=35, lpos_dropout_ms=(12000, 20000)), n_ticks=1500)
    st = states_of(outs)
    assert CL_HOVER in st
    assert CL_LANDING in st
    assert any(o.req_mode == MODE_LAND for o in outs)


def test_cl_user_abort_force_disarms_immediately():
    telems, outs = run_cl(Scenario(seed=36, disarm_at_ms=15000), n_ticks=1000)
    k = 15000 // 20
    # the force-disarm is emitted the very tick want_arm drops
    assert outs[k].req_arm == 0
    assert outs[k].state == CL_DISARMING


# ----------------- jax twin equality (if the CL jax machine exists) -------

def _jax_cl_available():
    try:
        from micro_quad_slam_tpu.models.behavior_cl import behavior_step_cl  # noqa
        return True
    except ImportError:
        return False


CL_SCENARIOS = [
    Scenario(seed=41),
    Scenario(seed=42, disarm_at_ms=14000),
    Scenario(seed=43, no_spool=True, ramp_works=True),
    Scenario(seed=44, no_spool=True, ramp_works=False),
    Scenario(seed=45, batt_v0=7.8, batt_sag=0.08),
    Scenario(seed=46, lpos_dropout_ms=(12000, 19000)),
    Scenario(seed=47, rf_dropout_ms=(9000, 10000)),
    Scenario(seed=48, kill_at_ms=11000),
    # ceiling latch/override/release (clean:2404-2419; round 5)
    Scenario(seed=49, alt_overshoot_m=0.60, overshoot_until_ms=9000),
]


@pytest.mark.skipif(not _jax_cl_available(), reason="jax CL machine not built")
@pytest.mark.parametrize("sc", CL_SCENARIOS, ids=lambda s: f"seed{s.seed}")
def test_jax_cl_matches_golden(sc):
    import jax
    import jax.numpy as jnp
    from micro_quad_slam_tpu.models.behavior_cl import (
        behavior_cl_init,
        behavior_step_cl,
    )
    from micro_quad_slam_tpu.utils.config import CL_PROFILE
    from test_behavior import telems_to_arrays

    telems, gouts = run_cl(sc, n_ticks=1100)
    arrs = telems_to_arrays(telems)
    seq = {k: jnp.asarray(v)[:, None] if v.ndim == 1
           else jnp.asarray(v)[:, None, :] for k, v in arrs.items()}

    def scan_fn(state, fr):
        return behavior_step_cl(state, fr, CL_PROFILE)

    final, outs = jax.jit(
        lambda s0, sq: jax.lax.scan(scan_fn, s0, sq)
    )(behavior_cl_init(1), seq)
    j = {k: np.asarray(v[:, 0] if v.ndim >= 2 else v) for k, v in outs.items()}

    np.testing.assert_array_equal(j["state"], [o.state for o in gouts])
    np.testing.assert_array_equal(j["cmd_kind"], [o.cmd_kind for o in gouts])
    np.testing.assert_allclose(
        j["cmd"], np.asarray([o.cmd for o in gouts], np.float32),
        rtol=0, atol=3e-5)
    np.testing.assert_array_equal(j["req_mode"], [o.req_mode for o in gouts])
    np.testing.assert_array_equal(j["req_arm"], [o.req_arm for o in gouts])
    np.testing.assert_array_equal(j["kf_flags"], [o.kf_flags for o in gouts])
    g_to = np.asarray([o.req_takeoff for o in gouts], np.float32)
    np.testing.assert_array_equal(np.isnan(j["req_takeoff"]), np.isnan(g_to))

@pytest.mark.skipif(not _jax_cl_available(), reason="jax CL machine not built")
def test_jax_cl_matches_golden_fuzzed_schedules():
    """Randomized anomaly-schedule fuzz for the CL machine: 256 seeded
    scenarios, golden traces vs ONE batched jax scan, exact per-lane
    equality (VERDICT round-1 weak item 4)."""
    import jax
    import jax.numpy as jnp
    from micro_quad_slam_tpu.models.behavior_cl import (
        behavior_cl_init,
        behavior_step_cl,
    )
    from micro_quad_slam_tpu.utils.config import CL_PROFILE
    from fc_mock import random_scenario
    from test_behavior import telems_to_arrays

    N_SEEDS, T = 256, 700
    runs = [run_cl(random_scenario(10_000 + s), n_ticks=T)
            for s in range(N_SEEDS)]
    arrs = [telems_to_arrays(telems) for telems, _ in runs]
    batched = {k: jnp.asarray(np.stack([a[k] for a in arrs], axis=1))
               for k in arrs[0]}

    def scan_fn(state, fr):
        return behavior_step_cl(state, fr, CL_PROFILE)

    _, outs = jax.jit(
        lambda s0, sq: jax.lax.scan(scan_fn, s0, sq)
    )(behavior_cl_init(N_SEEDS), batched)

    j_state = np.asarray(outs["state"])
    j_kind = np.asarray(outs["cmd_kind"])
    j_cmd = np.asarray(outs["cmd"])
    j_kf = np.asarray(outs["kf_flags"])
    for b, (_, gouts) in enumerate(runs):
        msg = f"cl fuzz seed {b}"
        np.testing.assert_array_equal(
            j_state[:, b], [o.state for o in gouts], err_msg=msg)
        np.testing.assert_array_equal(
            j_kind[:, b], [o.cmd_kind for o in gouts], err_msg=msg)
        np.testing.assert_allclose(
            j_cmd[:, b], np.asarray([o.cmd for o in gouts], np.float32),
            rtol=0, atol=3e-5, err_msg=msg)
        np.testing.assert_array_equal(
            j_kf[:, b], [o.kf_flags for o in gouts], err_msg=msg)
