"""Pallas fused window-update kernel: bit-equality with the XLA path (and
therefore the golden model) in interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from micro_quad_slam_tpu.ops import apply_scan_to_grid
from micro_quad_slam_tpu.ops.pallas_raycast import pallas_apply_scans
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM as GEOM
from micro_quad_slam_tpu.utils.config import MapConfig

F32 = np.float32
CFG = MapConfig()


def _random_case(seed, B=3):
    rng = np.random.default_rng(seed)
    padded = np.zeros((B, GEOM.prows, GEOM.pcols), np.int8)
    padded[:, GEOM.pad:GEOM.pad + 500, GEOM.pad:GEOM.pad + 500] = (
        rng.integers(-80, 81, size=(B, 500, 500)).astype(np.int8))
    beams = rng.uniform(0.03, 4.2, size=(B, 4, 8)).astype(np.float32)
    beams[rng.random((B, 4, 8)) < 0.1] = np.nan
    xs = rng.uniform(-20, 20, B).astype(np.float32)
    ys = rng.uniform(-20, 20, B).astype(np.float32)
    yaws = rng.uniform(-180, 180, B).astype(np.float32)
    en = rng.random(B) > 0.2
    return padded, beams, xs, ys, yaws, en


@pytest.mark.parametrize("seed", range(3))
def test_pallas_matches_xla(seed):
    padded, beams, xs, ys, yaws, en = _random_case(seed)
    zero = jnp.zeros(len(xs), jnp.float32)
    out_p = pallas_apply_scans(
        jnp.asarray(padded), jnp.asarray(beams), jnp.asarray(xs),
        jnp.asarray(ys), jnp.asarray(yaws), zero, zero, jnp.asarray(en),
        CFG, interpret=True)
    out_x = jax.vmap(
        lambda g, b, x, y, w, e: apply_scan_to_grid(
            g, b, x, y, w, F32(0), F32(0), e, CFG)
    )(jnp.asarray(padded), jnp.asarray(beams), jnp.asarray(xs),
      jnp.asarray(ys), jnp.asarray(yaws), jnp.asarray(en))
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


def test_pallas_near_saturation_ordering():
    rng = np.random.default_rng(9)
    B = 2
    padded = np.zeros((B, GEOM.prows, GEOM.pcols), np.int8)
    padded[:, GEOM.pad:GEOM.pad + 500, GEOM.pad:GEOM.pad + 500] = rng.choice(
        np.array([-80, -79, 78, 79, 80], np.int8), size=(B, 500, 500))
    beams = rng.uniform(0.1, 1.2, size=(B, 4, 8)).astype(np.float32)
    zero = jnp.zeros(B, jnp.float32)
    en = jnp.ones(B, bool)
    out_p = pallas_apply_scans(
        jnp.asarray(padded), jnp.asarray(beams), zero, zero, zero,
        zero, zero, en, CFG, interpret=True)
    out_x = jax.vmap(
        lambda g, b: apply_scan_to_grid(
            g, b, F32(0), F32(0), F32(0), F32(0), F32(0), True, CFG)
    )(jnp.asarray(padded), jnp.asarray(beams))
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


def test_resident_kernels_small_bit_match_xla():
    """FAST default-suite representative of the whole-replay resident
    kernel family: both generations (pallas_replay_resident v1 and
    pallas_replay_residentx v2) bit-match the XLA replay on a short
    2-flight batch that still exercises a mid-flight recenter.  The
    heavier sweeps (longer flights, cone/hybrid recenter suites, resume,
    saturating endpoints) run under --runslow; on-hardware equality is
    tools/check_all_tpu.py."""
    from micro_quad_slam_tpu.ops.pallas_resident import pallas_replay_resident
    from micro_quad_slam_tpu.ops.pallas_residentx import (
        pallas_replay_residentx)
    from micro_quad_slam_tpu.replay.mapping import (
        replay_mapping_batched, scanlog_to_arrays)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    logs = [synth_room_scanlog(n_frames=16, seed=3, noise_mm=5.0,
                               dropout_p=0.05),
            synth_room_scanlog(n_frames=16, seed=7, noise_mm=4.0)]
    frames = [scanlog_to_arrays(lg) for lg in logs]
    batched = {k: np.stack([f[k] for f in frames]) for k in frames[0]}
    T = batched["x_m"].shape[1]
    batched["x_m"][1] = np.linspace(0.0, 34.0, T, dtype=np.float32)
    batched["y_m"][1] = np.linspace(0.0, -21.0, T, dtype=np.float32)

    st_x, outs_x = replay_mapping_batched(batched, UL_PROFILE)
    assert (np.asarray(outs_x["kf_flags"]) != 0).sum() >= 1  # recentered
    for entry in (pallas_replay_resident, pallas_replay_residentx):
        st_r, outs_r = entry(batched, UL_PROFILE, interpret=True)
        np.testing.assert_array_equal(np.asarray(st_r.grid),
                                      np.asarray(st_x.grid))
        np.testing.assert_array_equal(np.asarray(st_r.origin_x),
                                      np.asarray(st_x.origin_x))
        for k in outs_x:
            np.testing.assert_array_equal(np.asarray(outs_r[k]),
                                          np.asarray(outs_x[k]),
                                          err_msg=k)


@pytest.mark.slow
def test_resident_replay_bit_matches_xla_with_recenter():
    """Whole-replay resident kernel (interpret): bit-equal grids, origins,
    and outs vs the XLA replay, including mid-flight recentering."""
    from micro_quad_slam_tpu.ops.pallas_resident import pallas_replay_resident
    from micro_quad_slam_tpu.replay.mapping import (
        replay_mapping_batched, scanlog_to_arrays)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    logs = [
        synth_room_scanlog(n_frames=24, seed=3, noise_mm=5.0, dropout_p=0.05),
        synth_room_scanlog(n_frames=24, seed=7, noise_mm=4.0),
        synth_room_scanlog(n_frames=24, seed=11, state=1),  # never inits
    ]
    frames = [scanlog_to_arrays(lg) for lg in logs]
    batched = {k: np.stack([f[k] for f in frames]) for k in frames[0]}
    # force strong drift on quad 1 -> recenters mid-flight
    T = batched["x_m"].shape[1]
    batched["x_m"][1] = np.linspace(0.0, 34.0, T, dtype=np.float32)
    batched["y_m"][1] = np.linspace(0.0, -21.0, T, dtype=np.float32)

    st_x, outs_x = replay_mapping_batched(batched, UL_PROFILE)
    st_r, outs_r = pallas_replay_resident(batched, UL_PROFILE, interpret=True)

    assert (np.asarray(outs_x["kf_flags"]) != 0).sum() >= 1  # recentered
    np.testing.assert_array_equal(np.asarray(st_r.grid), np.asarray(st_x.grid))
    np.testing.assert_array_equal(np.asarray(st_r.origin_x),
                                  np.asarray(st_x.origin_x))
    np.testing.assert_array_equal(np.asarray(st_r.origin_y),
                                  np.asarray(st_x.origin_y))
    np.testing.assert_array_equal(np.asarray(st_r.inited),
                                  np.asarray(st_x.inited))
    np.testing.assert_array_equal(np.asarray(st_r.filt), np.asarray(st_x.filt))
    for k in outs_x:
        np.testing.assert_array_equal(np.asarray(outs_r[k]),
                                      np.asarray(outs_x[k]), err_msg=k)


@pytest.mark.slow
def test_resident_replay_via_engine_selector():
    from micro_quad_slam_tpu.replay.mapping import (
        replay_mapping_batched, scanlog_to_arrays)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    log = synth_room_scanlog(n_frames=16, seed=5, noise_mm=3.0)
    f = scanlog_to_arrays(log)
    batched = {k: np.stack([v, v]) for k, v in f.items()}
    st_x, _ = replay_mapping_batched(batched, UL_PROFILE)
    st_r, _ = replay_mapping_batched(batched, UL_PROFILE,
                                     kernel="resident")
    np.testing.assert_array_equal(np.asarray(st_r.grid), np.asarray(st_x.grid))


def test_resident_cone_bit_matches_xla_cone():
    """Cone-mode resident kernel (interpret): bit-equal grids vs the XLA
    cone replay, including recentering (shared transcendental-free
    classifier -> identical IEEE f32 on both paths)."""
    from micro_quad_slam_tpu.replay.mapping import (
        replay_mapping_batched, scanlog_to_arrays)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    logs = [
        synth_room_scanlog(n_frames=20, seed=3, noise_mm=5.0, dropout_p=0.05),
        synth_room_scanlog(n_frames=20, seed=7, noise_mm=4.0),
    ]
    frames = [scanlog_to_arrays(lg) for lg in logs]
    batched = {k: np.stack([f[k] for f in frames]) for k in frames[0]}
    T = batched["x_m"].shape[1]
    batched["x_m"][1] = np.linspace(0.0, 34.0, T, dtype=np.float32)
    batched["y_m"][1] = np.linspace(0.0, -21.0, T, dtype=np.float32)

    st_c, outs_c = replay_mapping_batched(batched, UL_PROFILE, kernel="cone")
    st_r, outs_r = replay_mapping_batched(batched, UL_PROFILE,
                                          kernel="resident_cone")
    assert (np.asarray(outs_c["kf_flags"]) != 0).sum() >= 1
    np.testing.assert_array_equal(np.asarray(st_r.grid), np.asarray(st_c.grid))
    np.testing.assert_array_equal(np.asarray(outs_r["used"]),
                                  np.asarray(outs_c["used"]))


@pytest.mark.slow
def test_map_track_matches_xla_map_pass():
    """pallas_map_track (interpret): bit-equal to the SLAM re-raster pass
    (scan of vmapped apply_scan_to_grid, fixed origin, all enabled)."""
    from micro_quad_slam_tpu.ops.pallas_resident import pallas_map_track
    from micro_quad_slam_tpu.slam.pipeline import _map_pass
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    rng = np.random.default_rng(5)
    B, T = 2, 10
    beams = rng.uniform(0.1, 4.0, (B, T, 4, 8)).astype(np.float32)
    beams[rng.random(beams.shape) < 0.05] = np.nan
    poses = np.stack([
        rng.uniform(-1.5, 1.5, (B, T)).astype(np.float32),
        rng.uniform(-1.5, 1.5, (B, T)).astype(np.float32),
        rng.uniform(-np.pi, np.pi, (B, T)).astype(np.float32),
    ], axis=-1)
    kf = jnp.zeros((T,), bool)

    grid_x, _ = _map_pass(jnp.asarray(beams), jnp.asarray(poses),
                          UL_PROFILE, GEOM, False, kf)
    ox, oy = jnp.asarray(poses[:, 0, 0]), jnp.asarray(poses[:, 0, 1])
    grid_p = pallas_map_track(
        jnp.asarray(beams), jnp.asarray(poses[..., 0]),
        jnp.asarray(poses[..., 1]), jnp.rad2deg(jnp.asarray(poses[..., 2])),
        ox, oy, UL_PROFILE, GEOM, interpret=True)
    np.testing.assert_array_equal(np.asarray(grid_p), np.asarray(grid_x))


def test_resident_vmem_guard():
    from micro_quad_slam_tpu.ops.pallas_resident import _check_vmem_fit
    from micro_quad_slam_tpu.ops.raycast import GridGeom
    big = GridGeom(width=4000, height=4000, prows=4096, pcols=4096)
    with pytest.raises(ValueError, match="VMEM"):
        _check_vmem_fit(big)


@pytest.mark.slow
def test_resident_cl_profile_state_enum():
    """Resident kernel honors the CL state enum (HOVER, LANDING = 5, 6)
    exactly like the XLA replay selector."""
    from micro_quad_slam_tpu.replay.mapping import (
        replay_mapping_batched, scanlog_to_arrays)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import CL_PROFILE

    log = synth_room_scanlog(n_frames=12, seed=31, noise_mm=4.0, state=6)
    f = scanlog_to_arrays(log)
    batched = {k: np.stack([v, v]) for k, v in f.items()}
    st_x, outs_x = replay_mapping_batched(batched, CL_PROFILE)
    st_r, outs_r = replay_mapping_batched(batched, CL_PROFILE,
                                          kernel="resident")
    np.testing.assert_array_equal(np.asarray(st_r.grid), np.asarray(st_x.grid))
    np.testing.assert_array_equal(np.asarray(outs_r["used"]),
                                  np.asarray(outs_x["used"]))
    assert np.asarray(outs_x["used"]).any()  # state 6 = CL LANDING, maps


@pytest.mark.slow
def test_residentx_group_saturating_endpoint():
    """A cell hammered with +6 hits every frame of a group can swing past
    the full clamp range within the group's 256-ray window; the
    prefix-extrema fix-up shortcut (exact for single frames, where fan
    geometry bounds any cell to <= 8 hits) silently mis-clamps there.
    The exact clamp-composition tree reduce must match the per-frame XLA
    path bit-for-bit.  (Scenario: hovering ~7 cm from a wall — every
    front-sensor beam ends in the same one or two cells, 16 frames.)"""
    from micro_quad_slam_tpu.ops.pallas_residentx import pallas_replay_residentx
    from micro_quad_slam_tpu.replay.mapping import replay_mapping_batched
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    B, T = 2, 16
    grid_mm = np.full((B, T, 4, 8, 8), 0xFFFF, np.uint16)
    grid_mm[0, :, 0] = 70      # front sensor: all 64 zones at 7 cm
    grid_mm[1, :, 0] = 70
    grid_mm[1, :, 1] = 90      # quad 1 also hammers the right sensor
    frames = {
        "grid_mm": grid_mm,
        "x_m": np.zeros((B, T), np.float32),
        "y_m": np.zeros((B, T), np.float32),
        "yaw_deg": np.zeros((B, T), np.float32),
        "of_q": np.full((B, T), 200, np.int32),
        "of_rate_x": np.zeros((B, T), np.float32),
        "sys_health": np.zeros((B, T), np.int64),
        "state": np.full((B, T), 5, np.uint8),   # HOVER from frame 0
    }
    st_x, outs_x = replay_mapping_batched(frames, UL_PROFILE)
    st_r, outs_r = pallas_replay_residentx(frames, UL_PROFILE,
                                           interpret=True)
    gx = np.asarray(st_x.grid)
    # the scenario really does drive cells to saturation
    assert gx.max() == UL_PROFILE.map.lo_max
    np.testing.assert_array_equal(np.asarray(st_r.grid), gx)


@pytest.mark.slow
def test_residentx_recenter_in_all_inactive_group():
    """A recenter firing at group frame f >= 1 inside a group with ZERO
    active frames (8 consecutive frames of flow-quality gating failure
    with inited=True — a realistic ToF/flow dropout) must still roll the
    grid: empty groups may only take the trivial fast path when they
    carry no late recenter, else the roll is silently dropped and the
    grid permanently diverges (advisor finding, round 2)."""
    from micro_quad_slam_tpu.ops.pallas_residentx import pallas_replay_residentx
    from micro_quad_slam_tpu.replay.mapping import replay_mapping_batched
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    B, T = 1, 24
    grid_mm = np.full((B, T, 4, 8, 8), 1500, np.uint16)
    x = np.zeros((B, T), np.float32)
    x[0, 8:10] = 10.0
    x[0, 10:] = 16.0            # crosses the 15 m recenter threshold
    of_q = np.full((B, T), 200, np.int32)
    of_q[0, 8:16] = 0           # group 1 (frames 8-15): gating failure
    frames = {
        "grid_mm": grid_mm,
        "x_m": x,
        "y_m": np.zeros((B, T), np.float32),
        "yaw_deg": np.zeros((B, T), np.float32),
        "of_q": of_q,
        "of_rate_x": np.zeros((B, T), np.float32),
        "sys_health": np.zeros((B, T), np.int64),
        "state": np.full((B, T), 5, np.uint8),   # HOVER from frame 0
    }
    st_x, outs_x = replay_mapping_batched(frames, UL_PROFILE)
    # the recenter really does land on an all-inactive frame at group
    # offset >= 1 (frame 10 = group 1, f=2)
    kf = np.asarray(outs_x["kf_flags"])[0]
    used = np.asarray(outs_x["used"])[0]
    assert kf[10] != 0 and not used[8:16].any()

    st_r, _ = pallas_replay_residentx(frames, UL_PROFILE, interpret=True)
    np.testing.assert_array_equal(np.asarray(st_r.grid),
                                  np.asarray(st_x.grid))

    st_c, _ = replay_mapping_batched(frames, UL_PROFILE, kernel="cone")
    st_cx, _ = replay_mapping_batched(frames, UL_PROFILE, kernel="conex")
    np.testing.assert_array_equal(np.asarray(st_cx.grid),
                                  np.asarray(st_c.grid))


@pytest.mark.slow
def test_conex_replay_bit_matches_xla_cone_with_recenter():
    """Grouped cone kernel (interpret): bit-equal grids vs the XLA cone
    path, mid-flight recentering (fallback groups) included."""
    from micro_quad_slam_tpu.replay.mapping import (
        replay_mapping_batched, scanlog_to_arrays)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    logs = [
        synth_room_scanlog(n_frames=24, seed=3, noise_mm=5.0, dropout_p=0.05),
        synth_room_scanlog(n_frames=24, seed=7, noise_mm=4.0),
        synth_room_scanlog(n_frames=24, seed=11, state=1),  # never inits
    ]
    frames = [scanlog_to_arrays(lg) for lg in logs]
    batched = {k: np.stack([f[k] for f in frames]) for k in frames[0]}
    T = batched["x_m"].shape[1]
    batched["x_m"][1] = np.linspace(0.0, 34.0, T, dtype=np.float32)
    batched["y_m"][1] = np.linspace(0.0, -21.0, T, dtype=np.float32)

    st_c, outs_c = replay_mapping_batched(batched, UL_PROFILE,
                                          kernel="cone")
    st_x, outs_x = replay_mapping_batched(batched, UL_PROFILE,
                                          kernel="conex")
    assert (np.asarray(outs_c["kf_flags"]) != 0).sum() >= 1  # recentered
    np.testing.assert_array_equal(np.asarray(st_x.grid),
                                  np.asarray(st_c.grid))
    np.testing.assert_array_equal(np.asarray(st_x.origin_x),
                                  np.asarray(st_c.origin_x))
    for k in outs_c:
        np.testing.assert_array_equal(np.asarray(outs_x[k]),
                                      np.asarray(outs_c[k]), err_msg=k)


@pytest.mark.slow
def test_hybridx_replay_bit_matches_xla_hybrid_with_recenter():
    """Grouped HYBRID kernel (interpret): bit-equal grids vs the XLA
    hybrid path (conemode.hybrid_scan_update), mid-flight recentering
    (fallback groups) included."""
    from micro_quad_slam_tpu.replay.mapping import (
        replay_mapping_batched, scanlog_to_arrays)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    logs = [
        synth_room_scanlog(n_frames=24, seed=3, noise_mm=5.0, dropout_p=0.05),
        synth_room_scanlog(n_frames=24, seed=7, noise_mm=4.0),
        synth_room_scanlog(n_frames=24, seed=11, state=1),  # never inits
    ]
    frames = [scanlog_to_arrays(lg) for lg in logs]
    batched = {k: np.stack([f[k] for f in frames]) for k in frames[0]}
    T = batched["x_m"].shape[1]
    batched["x_m"][1] = np.linspace(0.0, 34.0, T, dtype=np.float32)
    batched["y_m"][1] = np.linspace(0.0, -21.0, T, dtype=np.float32)

    st_c, outs_c = replay_mapping_batched(batched, UL_PROFILE,
                                          kernel="hybrid")
    st_x, outs_x = replay_mapping_batched(batched, UL_PROFILE,
                                          kernel="hybridx")
    assert (np.asarray(outs_c["kf_flags"]) != 0).sum() >= 1  # recentered
    np.testing.assert_array_equal(np.asarray(st_x.grid),
                                  np.asarray(st_c.grid))
    np.testing.assert_array_equal(np.asarray(st_x.origin_x),
                                  np.asarray(st_c.origin_x))
    for k in outs_c:
        np.testing.assert_array_equal(np.asarray(outs_x[k]),
                                      np.asarray(outs_c[k]), err_msg=k)


@pytest.mark.slow
def test_conex_resume_bit_exact():
    """conex checkpoint-resume: a split replay equals the unbroken one."""
    from micro_quad_slam_tpu.replay.mapping import (
        replay_mapping_batched, scanlog_to_arrays)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    lg = synth_room_scanlog(n_frames=40, seed=5, noise_mm=4.0)
    fr = {k: v[None] for k, v in scanlog_to_arrays(lg).items()}
    st_full, _ = replay_mapping_batched(fr, UL_PROFILE, kernel="conex")
    st_h, _ = replay_mapping_batched(
        {k: v[:, :17] for k, v in fr.items()}, UL_PROFILE, kernel="conex")
    st_r, _ = replay_mapping_batched(
        {k: v[:, 17:] for k, v in fr.items()}, UL_PROFILE, kernel="conex",
        state0=st_h)
    np.testing.assert_array_equal(np.asarray(st_r.grid),
                                  np.asarray(st_full.grid))


@pytest.mark.slow
def test_map_step_matches_xla():
    """pallas_map_step (the simulator scan tick's slab kernel,
    models/simulator.py) is bit-identical to vmapped apply_scan_to_grid:
    random grids/poses/beams incl. NaN dropouts, a disabled quad, and
    near-edge poses (window clamping)."""
    from micro_quad_slam_tpu.ops.pallas_residentx import pallas_map_step
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    cfg = UL_PROFILE
    rng = np.random.default_rng(3)
    B = 8
    grids = jnp.asarray(rng.integers(-80, 81, (B, GEOM.prows, GEOM.pcols)),
                        jnp.int8)
    beams = rng.uniform(0.1, 4.2, (B, 4, 8)).astype(np.float32)
    beams[rng.random((B, 4, 8)) < 0.15] = np.nan
    x = rng.uniform(-20, 20, B).astype(np.float32)
    y = rng.uniform(-20, 20, B).astype(np.float32)
    x[-2:] = rng.uniform(24.0, 26.0, 2)      # at/over the grid edge
    yaw = rng.uniform(-180, 180, B).astype(np.float32)
    ox = np.zeros(B, np.float32)
    oy = np.zeros(B, np.float32)
    en = np.ones(B, bool)
    en[3] = False                            # a disabled quad passes through
    args = (grids, jnp.asarray(beams), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(yaw), jnp.asarray(ox), jnp.asarray(oy),
            jnp.asarray(en))
    want = jax.jit(jax.vmap(
        lambda g, b, xi, yi, wi, oxi, oyi, e: apply_scan_to_grid(
            g, b, xi, yi, wi, oxi, oyi, e, cfg.map, cfg.tof, GEOM)))(*args)
    got = jax.jit(lambda *a: pallas_map_step(*a, cfg, GEOM))(*args)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
