"""Machine-checked oracle fidelity for the CLEAN binary: fuzz-diff the
clean-revision twins against the REAL reference C, compiled straight out
of /root/reference/clean_uav_fc_tof_nav.c (tools/refshim.build_shim_cl
extracts the verbatim function text at build time — nothing is vendored).

The UL shim (tests/test_golden_vs_c.py) machine-checks uav_local_nav.c;
every CL-specific semantic previously rested on hand transliteration plus
golden<->JAX agreement, which cannot catch a shared misreading of the C
(VERDICT round 3, missing 1).  Covered here, mirroring the UL suite:

  * update_alt_estimate: alt_max, RF sanity rejection, the [-1, 50] lpos
    clamp, the alt_max-driven ceiling hysteresis       (clean:1710-1782)
  * vel_xy_allowed/stable (q>=30, alt_max gate), hover_ready_now/stable,
    hard_nogo/z_ctrl_ok/xy_ctrl_ok (enabled-bit aware) (clean:891-1036)
  * handle_battery_status: f32 voltage accumulation, lrintf cell
    inference clamped [2, 6], the three-gate validity LATCH
    (clean:1247-1301) + the SYS_STATUS voltage sideband (clean:1177-1203)
  * accept_ctrl_frame DISARM streak debounce           (clean:1605-1654)
  * tof_filter_tick EMA                                (clean:1700-1708)
  * hover_target_z_down ceiling clamp                  (clean:1038-1045)

Skipped when the reference tree or gcc is unavailable.
"""

import ctypes
import math

import numpy as np
import pytest

from micro_quad_slam_tpu.golden.behavior import Telemetry
from micro_quad_slam_tpu.golden.behavior_cl import GoldenBehaviorCL

refshim = pytest.importorskip("tools.refshim")

_P_F = ctypes.POINTER(ctypes.c_float)
_P_I = ctypes.POINTER(ctypes.c_int)
_P_U16 = ctypes.POINTER(ctypes.c_uint16)
_P_U64 = ctypes.POINTER(ctypes.c_uint64)
F32 = np.float32

HEALTH_BITS = [0x01, 0x2000, 0x4000, 0x400000]


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    so = refshim.build_shim_cl(str(tmp_path_factory.mktemp("refshim_cl")))
    if so is None:
        pytest.skip("reference tree or gcc unavailable")
    return refshim.load_shim_cl(so)


def _eq_f32(a, b) -> bool:
    a, b = np.float32(a), np.float32(b)
    return bool((np.isnan(a) and np.isnan(b)) or a == b)


def _rand_telem(rng, now):
    """One randomized telemetry snapshot hitting the CL gate branches."""
    lpos_ms = now - int(rng.integers(0, 800))
    rf_ms = now - int(rng.integers(0, 800))
    of_ms = now - int(rng.integers(0, 800))
    sys_ms = now - int(rng.integers(0, 1500))
    rf_val = float(np.float32(rng.choice(
        [rng.uniform(-1, 11), np.nan, 0.04, 0.05, 0.89, 0.90, 0.80, 0.79])))
    lpos_alt = float(np.float32(rng.choice(
        [rng.uniform(-2, 52), np.nan, 0.19, 0.20, 0.21])))
    health = 0
    enabled = 0
    for b in HEALTH_BITS:
        if rng.random() < 0.8:
            health |= b
        if rng.random() < 0.8:
            enabled |= b
    return dict(
        now=now, hv_sys=int(rng.integers(0, 2)), sys_ms=sys_ms,
        health=health, enabled=enabled,
        hv_att=int(rng.random() < 0.8), hv_of=int(rng.random() < 0.8),
        of_ms=of_ms, ofq=int(rng.choice([0, 10, 29, 30, 31, 80])),
        hv_lpos=int(rng.random() < 0.8), lpos_ms=lpos_ms,
        lpos_alt=lpos_alt, hv_rf=int(rng.random() < 0.8), rf_ms=rf_ms,
        rf=rf_val, hv_ext=int(rng.integers(0, 2)),
        landed=int(rng.integers(0, 3)), armed=int(rng.integers(0, 2)),
    )


def _to_tm(d) -> Telemetry:
    return Telemetry(
        t_ms=d["now"], have_sys=bool(d["hv_sys"]), sys_last_ms=d["sys_ms"],
        sys_health=d["health"], sys_enabled=d["enabled"],
        have_att=bool(d["hv_att"]), have_of=bool(d["hv_of"]),
        of_last_ms=d["of_ms"], of_q=d["ofq"],
        have_lpos=bool(d["hv_lpos"]), lpos_last_ms=d["lpos_ms"],
        lpos_alt_filt=d["lpos_alt"], have_rf=bool(d["hv_rf"]),
        rf_last_ms=d["rf_ms"], rf_m=d["rf"], have_ext=bool(d["hv_ext"]),
        landed_state=d["landed"], fc_armed=bool(d["armed"]),
    )


def _set_telem(ref, d) -> None:
    ref.cl_set_telem(
        d["now"], d["hv_sys"], d["sys_ms"], d["health"], d["enabled"],
        d["hv_att"], d["hv_of"], d["of_ms"], d["ofq"], d["hv_lpos"],
        d["lpos_ms"], np.float32(d["lpos_alt"]), d["hv_rf"], d["rf_ms"],
        np.float32(d["rf"]), d["hv_ext"], d["landed"], d["armed"])


def test_cl_alt_estimate_matches_c(ref):
    """CL update_alt_estimate: 20,000 sequential snapshots — alt_max MAX
    composition, RF sanity rejection (airborne-hint < 0.05 m, |RF-LPOS| >
    0.8 m), [-1, 50] lpos clamp, alt_max-driven ceiling hysteresis
    (clean:1710-1782).  Sequential so the ceiling latch carries state on
    both sides."""
    rng = np.random.default_rng(11)
    ref.cl_reset()
    gm = GoldenBehaviorCL()
    alt = ctypes.c_float()
    amax = ctypes.c_float()
    src = ctypes.c_int()
    ceil_ = ctypes.c_int()
    hxy = ctypes.c_int()
    now = 1000
    for k in range(20000):
        now += int(rng.integers(10, 120))
        d = _rand_telem(rng, now)
        _set_telem(ref, d)
        ref.cl_alt_tick(ctypes.byref(alt), ctypes.byref(amax),
                        ctypes.byref(src), ctypes.byref(ceil_),
                        ctypes.byref(hxy))
        tm = _to_tm(d)
        gm._update_alt(tm)
        assert _eq_f32(alt.value, gm.alt_est_m), (k, d)
        assert _eq_f32(amax.value, gm.alt_max_m), (k, d)
        # enum orders match: NONE=0, LPOS=1, RF=2, GND=3
        assert src.value == gm.alt_src, (k, d)
        assert bool(ceil_.value) == gm.ceiling_active, (k, d)
        assert bool(hxy.value) == gm._lpos_fresh(tm), (k, d)


def test_cl_gates_match_c(ref):
    """CL gating stack: 20,000 sequential snapshots through
    vel_xy_allowed/stable (q>=30, alt_max>=0.12 m), hover_ready_now/
    stable (REQUIRE_RANGEFINDER/OPTICAL_FLOW, prearm 400 ms hold),
    hard_nogo / z_ctrl_ok / xy_ctrl_ok (enabled-bit aware)
    (clean:891-1036).  Sequential so the xy_ok_since / prearm_ok_since
    hold timers carry state on both sides."""
    rng = np.random.default_rng(12)
    ref.cl_reset()
    gm = GoldenBehaviorCL()
    g7 = (ctypes.c_int * 7)()
    alt = ctypes.c_float()
    amax = ctypes.c_float()
    src = ctypes.c_int()
    ceil_ = ctypes.c_int()
    hxy = ctypes.c_int()
    now = 1000
    for k in range(20000):
        now += int(rng.integers(10, 400))
        d = _rand_telem(rng, now)
        _set_telem(ref, d)
        ref.cl_alt_tick(ctypes.byref(alt), ctypes.byref(amax),
                        ctypes.byref(src), ctypes.byref(ceil_),
                        ctypes.byref(hxy))
        ref.cl_gates(g7)
        tm = _to_tm(d)
        gm._update_alt(tm)
        want = [gm._vel_xy_allowed(tm), gm._vel_xy_stable(tm),
                gm._hover_ready_now(tm), gm._hover_ready_stable(tm),
                gm._hard_nogo(tm), gm._z_ok(tm), gm._xy_ok(tm)]
        assert [bool(v) for v in g7] == want, (k, d, list(g7), want)


def test_cl_battery_intake_matches_c(ref):
    """handle_battery_status + the SYS_STATUS voltage sideband: 8,000
    interleaved events vs the telemetry adapter's clean intake — f32
    voltage accumulation, lrintf(pack/4) cell inference clamped [2, 6],
    the v/c/vpc validity gates, the batt_valid LATCH, and the
    log-cadence-coupled sideband invalidation (clean:1177-1301).
    Round 4 found the previous adapter hardcoded 4 inferred cells and
    skipped the validity gates — exactly the shared-misreading class
    this machine check exists for."""
    from micro_quad_slam_tpu.replay.telemetry import TelemetryAdapter

    rng = np.random.default_rng(13)
    ref.cl_reset()
    ad = TelemetryAdapter(clean_battery=True)
    vpc = ctypes.c_float()
    cells = ctypes.c_int()
    vtot = ctypes.c_float()
    valid = ctypes.c_int()
    last = ctypes.c_uint64()
    v_sys = ctypes.c_float()
    now = 1000
    for k in range(8000):
        now += int(rng.integers(10, 1500))
        if rng.random() < 0.5:
            # BATTERY_STATUS with adversarial voltage vectors
            volts = np.zeros(10, np.uint16)
            kind = rng.integers(0, 5)
            if kind == 0:      # normal 2S per-cell readings
                nc = int(rng.integers(1, 5))
                volts[:nc] = rng.integers(2300, 4900, nc)
            elif kind == 1:    # single pack reading (cell inference)
                volts[0] = rng.integers(5500, 20000)
            elif kind == 2:    # dead / sentinel cells mixed in
                volts[:] = rng.choice(
                    np.array([0, 65535, 20000, 19999, 3800], np.uint16), 10)
            elif kind == 3:    # boundary sums around the 3 V / 30 V gates
                volts[0] = rng.choice(
                    np.array([2999, 3000, 3001, 29999, 30000], np.uint16))
            else:              # fully random
                volts[:] = rng.integers(0, 65536, 10)
            buf = (ctypes.c_uint16 * 10)(*volts.tolist())
            ref.cl_batt_status(buf, now, ctypes.byref(vpc),
                               ctypes.byref(cells), ctypes.byref(vtot),
                               ctypes.byref(valid), ctypes.byref(last))
            ad._handle("BATTERY_STATUS",
                       {f"voltage{i}": int(volts[i]) for i in range(10)},
                       now)
        else:
            vb = int(rng.choice([0, 1, 2999, 3000, 8200, 30001, 59999,
                                 60000, int(rng.integers(0, 65536))]))
            ref.cl_sys_status(0, 0xFFFFFFFF, 0xFFFFFFFF, vb, now,
                              ctypes.byref(valid), ctypes.byref(v_sys))
            ad._handle("SYS_STATUS",
                       {"onboard_control_sensors_present": 0,
                        "onboard_control_sensors_enabled": 0xFFFFFFFF,
                        "onboard_control_sensors_health": 0xFFFFFFFF,
                        "voltage_battery": vb}, now)
            assert _eq_f32(v_sys.value, ad.batt_v_total_sys), (k, vb)
        msg = (k, now)
        assert bool(valid.value) == ad.batt_valid, msg
        if last.value:
            assert _eq_f32(vpc.value, ad.batt_vpc), msg
            assert cells.value == ad.batt_cells, msg
            assert _eq_f32(vtot.value, ad.batt_v_total), msg
            assert int(last.value) == ad.batt_last_ms, msg


def test_cl_ctrl_debounce_matches_c(ref):
    """accept_ctrl_frame DISARM debounce: one long stream of 20,000
    random CTRL frames (ARM / DISARM / unknown, random seq continuity and
    inter-frame gaps around the 500 ms window) — want_arm must evolve
    identically to formats.scanframe.CtrlDebouncer (clean:1605-1654)."""
    from micro_quad_slam_tpu.formats.scanframe import CtrlDebouncer

    rng = np.random.default_rng(14)
    ref.cl_reset()
    ref.cl_set_want_arm(0)
    deb = CtrlDebouncer()
    py_want = False
    t = 1000
    seq = 100
    for k in range(20000):
        t += int(rng.choice([5, 30, 100, 300, 480, 499, 500, 501, 900]))
        r = rng.random()
        cmd = 0 if r < 0.6 else (1 if r < 0.9 else int(rng.integers(2, 256)))
        # seq: mostly consecutive, sometimes repeated or jumping
        jump = rng.random()
        if jump < 0.6:
            seq += 1
        elif jump < 0.8:
            pass                       # repeat
        else:
            seq = int(rng.integers(0, 2 ** 32))
        c_want = bool(ref.cl_ctrl_frame(cmd, seq & 0xFFFFFFFF, t))
        res = deb.feed(cmd, seq & 0xFFFFFFFF, t)
        if res is True:
            py_want = True
        elif res is False:
            py_want = False
        assert c_want == py_want, (k, cmd, seq, t)


def test_cl_filter_tick_matches_c(ref):
    """CL tof_filter_tick EMA (identical constants to UL, but checked
    against the CLEAN binary's own compiled text, clean:1700-1708)."""
    from micro_quad_slam_tpu.golden.model import tof_filter_step

    rng = np.random.default_rng(15)
    for _ in range(5000):
        filt = rng.uniform(0.0, 4.0, 4).astype(np.float32)
        minima = rng.uniform(0.0, 4.0, 4).astype(np.float32)
        filt[rng.random(4) < 0.3] = np.nan
        minima[rng.random(4) < 0.3] = np.nan
        out = np.zeros(4, np.float32)
        ref.cl_filter_tick(
            np.ascontiguousarray(filt).ctypes.data_as(_P_F),
            np.ascontiguousarray(minima).ctypes.data_as(_P_F),
            out.ctypes.data_as(_P_F))
        g_out = tof_filter_step(filt, minima)
        for d in range(4):
            assert _eq_f32(out[d], g_out[d])


def test_cl_hover_target_z_down_matches_c(ref):
    """hover_target_z_down: the ceiling-clamped hover setpoint
    (clean:1038-1045) vs the golden CL twin."""
    gm = GoldenBehaviorCL()
    assert _eq_f32(ref.cl_hover_target_z_down(), gm._hover_target_z_down())


def _batt_vpc_sample_twin(now, b_vpc, b_cells, b_last, v_sys, sys_last):
    """Python twin of batt_vpc_sample (clean:939-965): BATTERY_STATUS-
    fresh preferred, SYS_STATUS voltage fallback divided by known-or-2
    cells, 1..6 Vpc validity on both paths."""
    def vpc_valid(v):
        return not math.isnan(v) and F32(1.0) <= F32(v) <= F32(6.0)

    if (b_last != 0 and (now - b_last) < 2000 and vpc_valid(b_vpc)
            and b_cells > 0):
        return True, b_vpc
    if sys_last != 0 and (now - sys_last) < 2000 and not math.isnan(v_sys):
        cells = b_cells if b_cells > 0 else 2
        vpc = float(F32(v_sys) / F32(cells))
        if vpc_valid(vpc):
            return True, vpc
    return False, None


def test_cl_batt_vpc_sample_matches_c(ref):
    """batt_vpc_sample (clean:951-965).  (Dead code in the clean tick —
    battery_failsafe_tick uses the batt_valid latch — but extracted and
    pinned so the semantics are on record.)"""
    rng = np.random.default_rng(16)
    vpc = ctypes.c_float()
    cells = ctypes.c_int()
    vtot = ctypes.c_float()
    valid = ctypes.c_int()
    last = ctypes.c_uint64()
    out = ctypes.c_float()
    for k in range(2000):
        ref.cl_reset()
        now = int(rng.integers(10000, 100000))  # >= staleness draws: the
        # C clock is uint64, a negative test time would wrap
        b_vpc, b_cells, b_last = float("nan"), 0, 0
        if rng.random() < 0.7:
            volts = np.zeros(10, np.uint16)
            nc = int(rng.integers(1, 4))
            volts[:nc] = rng.integers(500, 9000, nc)   # some fail the gates
            t_b = now - int(rng.integers(0, 4000))
            buf = (ctypes.c_uint16 * 10)(*volts.tolist())
            ref.cl_batt_status(buf, t_b, ctypes.byref(vpc),
                               ctypes.byref(cells), ctypes.byref(vtot),
                               ctypes.byref(valid), ctypes.byref(last))
            b_vpc, b_cells, b_last = (float(vpc.value), int(cells.value),
                                      int(last.value))
        v_sys, sys_last = float("nan"), 0
        if rng.random() < 0.7:
            v_sys = float(np.float32(rng.uniform(0.5, 20.0)))
            sys_last = now - int(rng.integers(0, 4000))
            ref.cl_set_batt_sys(np.float32(v_sys), sys_last)
        ref.cl_set_telem(now, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                         np.float32(np.nan), 0, 0, np.float32(np.nan),
                         0, 0, 0)
        got = bool(ref.cl_batt_sample(ctypes.byref(out)))
        want, want_vpc = _batt_vpc_sample_twin(now, b_vpc, b_cells, b_last,
                                               v_sys, sys_last)
        assert got == want, (k, b_vpc, b_cells, b_last, v_sys, sys_last)
        if want:
            assert _eq_f32(out.value, want_vpc), (k,)
