"""EKF fusion tests: covariance sanity, gating, and pose-track accuracy on
synthetic flights with motion-consistent flow (north star: RMSE <= 1 cm).
"""

import numpy as np
import jax.numpy as jnp

from micro_quad_slam_tpu.ops.ekf import (
    EkfState,
    ekf_init,
    ekf_predict,
    ekf_step,
    ekf_update_velocity,
    flow_world_velocity,
)
from micro_quad_slam_tpu.replay.fusion import (
    fusion_arrays,
    pose_rmse,
    replay_fusion,
    replay_fusion_batched,
)
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.utils.config import UL_PROFILE


def test_predict_integrates_velocity():
    st = ekf_init()
    st = EkfState(st.mean.at[2].set(1.0).at[3].set(-0.5), st.cov)
    st = ekf_predict(st, 0.1)
    np.testing.assert_allclose(np.asarray(st.mean),
                               [0.1, -0.05, 1.0, -0.5], atol=1e-6)
    # covariance grows under prediction
    assert float(st.cov[0, 0]) > 1e-4


def test_update_pulls_velocity_and_shrinks_cov():
    st = ekf_init()
    z = jnp.asarray([0.5, 0.0])
    st2, innov = ekf_update_velocity(st, z, jnp.asarray(True), 1e-3)
    assert float(st2.mean[2]) > 0.4
    assert float(st2.cov[2, 2]) < float(st.cov[2, 2])
    np.testing.assert_allclose(np.asarray(innov), [0.5, 0.0], atol=1e-6)


def test_update_invalid_is_identity():
    st = ekf_init()
    z = jnp.asarray([5.0, 5.0])
    st2, innov = ekf_update_velocity(st, z, jnp.asarray(False), 1e-3)
    np.testing.assert_array_equal(np.asarray(st2.mean), np.asarray(st.mean))
    np.testing.assert_array_equal(np.asarray(st2.cov), np.asarray(st.cov))
    np.testing.assert_array_equal(np.asarray(innov), [0.0, 0.0])


def test_flow_world_velocity_rotation():
    # body +x at yaw 90 deg -> world +y
    v = flow_world_velocity(jnp.float32(2.0), jnp.float32(0.0),
                            jnp.float32(0.5), jnp.float32(np.pi / 2))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0], atol=1e-6)


def test_step_gates_on_quality_and_ground():
    st = ekf_init()
    st, d = ekf_step(st, 0.1, jnp.float32(1.0), jnp.float32(0.0),
                     jnp.int32(10), jnp.float32(0.5), jnp.float32(0.0))
    assert not bool(d["flow_used"])  # quality 10 < 50
    st, d = ekf_step(st, 0.1, jnp.float32(1.0), jnp.float32(0.0),
                     jnp.int32(90), jnp.float32(0.0), jnp.float32(0.0))
    assert not bool(d["flow_used"])  # ground 0 <= min
    st, d = ekf_step(st, 0.1, jnp.float32(1.0), jnp.float32(0.0),
                     jnp.int32(90), jnp.float32(0.5), jnp.float32(0.0))
    assert bool(d["flow_used"])


def test_fusion_replay_tracks_circle_within_1cm():
    # exact flow from the simulator: the recomputed track must match the
    # logged path to within the 1 cm north star
    log = synth_room_scanlog(n_frames=200, path="circle", path_radius_m=1.0,
                             with_flow=True, seed=3)
    frames = fusion_arrays(log)
    state, track = replay_fusion(frames, UL_PROFILE)
    rmse = pose_rmse(track, frames)
    assert rmse < 0.01, f"pose RMSE {rmse*100:.2f} cm"
    assert np.asarray(track["flow_used"])[1:].all()


def test_fusion_replay_line_path():
    log = synth_room_scanlog(n_frames=150, path="line", path_radius_m=3.0,
                             room=(-1.0, -2.0, 5.0, 2.0),
                             with_flow=True, seed=4)
    frames = fusion_arrays(log)
    _, track = replay_fusion(frames, UL_PROFILE)
    assert pose_rmse(track, frames) < 0.01


def test_fusion_replay_no_flow_dead_reckons():
    log = synth_room_scanlog(n_frames=30, path="hover", with_flow=False)
    frames = fusion_arrays(log)
    _, track = replay_fusion(frames, UL_PROFILE)
    assert not np.asarray(track["flow_used"]).any()
    # no measurements: stays at the seed position
    np.testing.assert_allclose(np.asarray(track["x"]), 0.0, atol=1e-5)


def test_fusion_batched_matches_single():
    logs = [synth_room_scanlog(n_frames=50, path="circle", with_flow=True,
                               path_radius_m=0.5 + 0.3 * s, seed=s)
            for s in range(3)]
    frames = [fusion_arrays(lg) for lg in logs]
    batched = {k: np.stack([f[k] for f in frames]) for k in frames[0]}
    _, btrack = replay_fusion_batched(batched, UL_PROFILE)
    for i, f in enumerate(frames):
        _, strack = replay_fusion(f, UL_PROFILE)
        np.testing.assert_allclose(np.asarray(btrack["x"][i]),
                                   np.asarray(strack["x"]), atol=1e-6)
