"""End-to-end replay tests: scanlog -> occupancy grid on device, bit-matched
against the golden model (SURVEY.md §4 items 2 & 4).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.golden import golden_replay_mapping
from micro_quad_slam_tpu.ops import logical_grid
from micro_quad_slam_tpu.replay import (
    replay_mapping,
    replay_mapping_batched,
    scanlog_to_arrays,
)
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.utils.config import UL_PROFILE


def _run_one(log):
    frames = scanlog_to_arrays(log)
    state, outs = replay_mapping(frames, UL_PROFILE)
    return np.asarray(logical_grid(state.grid)), state, outs


def test_replay_bit_matches_golden_hover():
    log = synth_room_scanlog(n_frames=32, room=(-2.0, -2.0, 2.0, 2.0),
                             path="hover", yaw_rate_dps=20.0,
                             noise_mm=6.0, dropout_p=0.05, seed=11)
    grid_j, state, outs = _run_one(log)
    mapper, used_g = golden_replay_mapping(log)
    np.testing.assert_array_equal(grid_j, mapper.grid)
    np.testing.assert_array_equal(np.asarray(outs["used"]), used_g)
    assert abs(float(state.origin_x) - float(mapper.origin_x)) < 1e-6
    # float path: XLA fuses the EMA into an FMA, so allow 1-ULP drift
    # (SURVEY.md §4: exact for int8 grid, <=1e-6 for float paths)
    np.testing.assert_allclose(
        np.asarray(state.filt), _golden_filt(log), rtol=0, atol=1e-6
    )


def _golden_filt(log):
    from micro_quad_slam_tpu.golden.model import (
        compute_beams_and_minima,
        tof_filter_step,
    )
    filt = np.full(4, np.nan, np.float32)
    for t in range(len(log)):
        _, minima = compute_beams_and_minima(log.grid_mm[t])
        filt = tof_filter_step(filt, minima)
    return filt


def test_replay_bit_matches_golden_moving_with_recenter():
    # a long line path that walks the quad 18 m from the start: recentering
    # fires mid-flight and must stay bit-exact
    log = synth_room_scanlog(n_frames=40, room=(-3.0, -3.0, 40.0, 3.0),
                             path="line", path_radius_m=18.0, seed=13,
                             noise_mm=4.0)
    grid_j, state, outs = _run_one(log)
    mapper, used_g = golden_replay_mapping(log)
    np.testing.assert_array_equal(grid_j, mapper.grid)
    assert mapper.recentered  # the scenario actually exercised recenter
    assert np.asarray(outs["kf_flags"]).any()
    assert abs(float(state.origin_x) - float(mapper.origin_x)) < 1e-6


def test_replay_gates_respected():
    # frames with bad flow quality and unhealthy XY bit must be skipped
    log = synth_room_scanlog(n_frames=16, seed=17)
    log.of_rate_x[4:8] = 0.5     # flow "fresh"
    log.of_q[4:8] = 10           # ...but quality < 50 -> skip
    log.sys_health[10] = 0x01    # sys reported, XY bit clear -> skip
    log.x_m[12] = np.nan         # lpos stale -> skip
    grid_j, state, outs = _run_one(log)
    used = np.asarray(outs["used"])
    mapper, used_g = golden_replay_mapping(log)
    np.testing.assert_array_equal(used, used_g)
    assert not used[4:8].any() and not used[10] and not used[12]
    assert used[0] and used[15]
    np.testing.assert_array_equal(grid_j, mapper.grid)


@pytest.mark.slow
def test_replay_never_inits_on_ground_states():
    log = synth_room_scanlog(n_frames=8, state=1, seed=19)  # ST_IDLE
    grid_j, state, outs = _run_one(log)
    assert not bool(state.inited)
    assert not np.asarray(outs["used"]).any()
    assert grid_j.sum() == 0


@pytest.mark.slow
def test_batched_replay_matches_per_log():
    # N different logs vmapped => per-log equality with single-replay
    logs = [
        synth_room_scanlog(n_frames=12, seed=s, path="hover",
                           yaw_rate_dps=10.0 + 5 * s, noise_mm=5.0)
        for s in range(4)
    ]
    frames = [scanlog_to_arrays(lg) for lg in logs]
    batched = {k: np.stack([f[k] for f in frames]) for k in frames[0]}
    bstate, bouts = replay_mapping_batched(batched, UL_PROFILE)
    for i, f in enumerate(frames):
        sstate, souts = replay_mapping(f, UL_PROFILE)
        np.testing.assert_array_equal(
            np.asarray(bstate.grid[i]), np.asarray(sstate.grid)
        )
        np.testing.assert_array_equal(
            np.asarray(bouts["used"][i]), np.asarray(souts["used"])
        )


@pytest.mark.slow
def test_batched_replay_identical_logs_identical_maps():
    log = synth_room_scanlog(n_frames=10, seed=23, noise_mm=5.0)
    f = scanlog_to_arrays(log)
    batched = {k: np.stack([v, v, v]) for k, v in f.items()}
    bstate, _ = replay_mapping_batched(batched, UL_PROFILE)
    g = np.asarray(bstate.grid)
    np.testing.assert_array_equal(g[0], g[1])
    np.testing.assert_array_equal(g[0], g[2])


def test_cl_profile_replay_uses_cl_state_enum():
    """CL logs number LANDING=6; a CL-profile replay must init the map on
    those states and must NOT treat CL DISARMING (7) as airborne."""
    from micro_quad_slam_tpu.utils.config import CL_PROFILE

    log = synth_room_scanlog(n_frames=8, seed=29)
    log.state[:] = 6  # CL LANDING
    frames = scanlog_to_arrays(log)
    state, outs = replay_mapping(frames, CL_PROFILE)
    assert bool(state.inited)

    log.state[:] = 7  # CL DISARMING — on the ground
    frames = scanlog_to_arrays(log)
    state, outs = replay_mapping(frames, CL_PROFILE)
    assert not bool(state.inited)


@pytest.mark.slow
def test_cli_multi_log_replay_matches_solo(tmp_path):
    """mqs replay with several logs of MIXED lengths runs one batched
    launch; each per-log map is bit-identical to that log's solo replay
    (padding frames are provably gated out: NaN pose + zero ToF grid)."""
    from micro_quad_slam_tpu.cli import _stack_logs, main
    from micro_quad_slam_tpu.formats.scanlog import write_scanlog
    from micro_quad_slam_tpu.replay.mapping import replay_mapping_batched

    lens = (50, 34, 42)
    paths = []
    for i, n in enumerate(lens):
        log = synth_room_scanlog(n_frames=n, seed=10 + i,
                                 path=("circle", "hover", "line")[i],
                                 noise_mm=5.0)
        p = tmp_path / f"l{i}.bin"
        write_scanlog(str(p), log)
        paths.append(str(p))

    logs, frames, got_lens = _stack_logs(paths)
    assert got_lens == list(lens)
    assert frames["x_m"].shape == (3, max(lens))
    state, _ = replay_mapping_batched(frames, UL_PROFILE)
    for i, (p, n) in enumerate(zip(paths, lens)):
        solo = {k: v[None] for k, v in scanlog_to_arrays(logs[i]).items()}
        st_solo, _ = replay_mapping_batched(solo, UL_PROFILE)
        assert np.array_equal(np.asarray(state.grid[i]),
                              np.asarray(st_solo.grid[0])), f"log {i}"
        assert np.asarray(state.origin_x)[i] == np.asarray(
            st_solo.origin_x)[0]

    out = tmp_path / "m.npy"
    rc = main(["replay", "--log", *paths, "--out", str(out)])
    assert rc == 0
    for i in range(3):
        m = np.load(tmp_path / f"m_{i}.npy")
        assert m.shape == np.asarray(logical_grid(state.grid[0])).shape
        assert np.array_equal(m, np.asarray(logical_grid(state.grid[i])))

    # --sharded needs the log count to divide the device count (8 here)
    assert main(["replay", "--log", *paths, "--sharded"]) == 2
