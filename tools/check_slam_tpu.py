"""SLAM on real TPU: chunked-pass parity vs the sequential scan, pass-3
resident raster exactness, and end-to-end timing (B=64 and B=128)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from micro_quad_slam_tpu.ops.pallas_resident import pallas_map_track
from micro_quad_slam_tpu.slam.pipeline import (
    _map_pass, _map_pass_chunked, _origin_schedule, slam_replay)
from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
from micro_quad_slam_tpu.replay.fusion import fusion_arrays
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.utils.config import UL_PROFILE
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM as GEOM

def sync(x):
    return float(jnp.sum(x.astype(jnp.int32)))

def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(5)
    B, T = 4, 64
    beams = rng.uniform(0.1, 4.0, (B, T, 4, 8)).astype(np.float32)
    beams[rng.random(beams.shape) < 0.05] = np.nan
    poses = np.stack([
        rng.uniform(-1.5, 1.5, (B, T)).astype(np.float32),
        rng.uniform(-1.5, 1.5, (B, T)).astype(np.float32),
        rng.uniform(-np.pi, np.pi, (B, T)).astype(np.float32),
    ], axis=-1)
    kf = jnp.zeros((T,), bool)
    gx, _ = _map_pass(jnp.asarray(beams), jnp.asarray(poses),
                      UL_PROFILE, GEOM, False, kf)
    ox, oy = jnp.asarray(poses[:, 0, 0]), jnp.asarray(poses[:, 0, 1])
    gp = pallas_map_track(jnp.asarray(beams), jnp.asarray(poses[..., 0]),
                          jnp.asarray(poses[..., 1]),
                          jnp.rad2deg(jnp.asarray(poses[..., 2])),
                          ox, oy, UL_PROFILE, GEOM)
    print("map_track bit-equal on TPU:",
          np.array_equal(np.asarray(gp), np.asarray(gx)), flush=True)

    # chunked pass 1 (the TPU-only production path) vs the sequential
    # scan: identical grids AND matched poses on the backend that
    # actually executes it (advisor finding, round 2).  Drifted circle
    # poses make real matches fire; a long-excursion flight exercises
    # the recenter schedule through both paths.
    logs = [synth_room_scanlog(n_frames=64, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(2)]
    fr = [{**scanlog_to_arrays(lg), **fusion_arrays(lg)} for lg in logs]
    b4 = {k: np.stack([f[k] for f in fr] * 2) for k in fr[0]}
    # the schedule follows the EKF odometry, so the excursion must ride
    # the flow stream: -20 rad/s at 0.5 m ground = 10 m/s body-x, ~26 m
    # of drift over 6.4 s -> two recenters (verified on CPU)
    b4["of_rate_x"][3] = b4["of_rate_x"][3] + np.float32(-20.0)
    from micro_quad_slam_tpu.ops.beams import extract_beams
    from micro_quad_slam_tpu.slam.pipeline import _ekf_track
    kf_every = 8
    bj = {k: jnp.asarray(v) for k, v in b4.items()}
    beams2, _ = extract_beams(bj["grid_mm"], UL_PROFILE.tof)
    odo = _ekf_track(bj, UL_PROFILE)
    sched = _origin_schedule(odo, UL_PROFILE)
    kf_mask = (jnp.arange(64) % kf_every) == 0
    n_iv = UL_PROFILE.slam.match_chunk_intervals
    snap_mask = (jnp.arange(64) % (kf_every * n_iv)) == 0
    upd_mask = kf_mask if UL_PROFILE.slam.match_map_kf_only else None
    g_seq, m_seq = jax.jit(
        lambda bm, p: _map_pass(bm, p, UL_PROFILE, GEOM, True, kf_mask,
                                sched, snap_mask_t=snap_mask,
                                update_mask_t=upd_mask))(beams2, odo)
    g_chk, m_chk = jax.jit(
        lambda bm, p: _map_pass_chunked(bm, p, UL_PROFILE, GEOM, kf_every,
                                        sched))(beams2, odo)
    print("chunked pass bit-equal grids:",
          np.array_equal(np.asarray(g_chk), np.asarray(g_seq)),
          "poses:", np.array_equal(np.asarray(m_chk), np.asarray(m_seq)),
          "recenters:", int(np.asarray(sched["do"]).sum()), flush=True)

    # end-to-end slam timing
    logs = [synth_room_scanlog(n_frames=256, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(4)]
    fr = [{**scanlog_to_arrays(lg), **fusion_arrays(lg)} for lg in logs]
    for B2 in (64, 128, 256):
        b = {k: np.concatenate([np.stack([f[k] for f in fr])] * 64)[:B2]
             for k in fr[0]}
        bd = {k: jax.device_put(jnp.asarray(v), jax.devices()[0]) for k, v in b.items()}
        sync(bd["x_m"])
        t0 = time.time()
        res = slam_replay(bd, UL_PROFILE); sync(res.grid)
        print(f"slam B={B2} compile+first: {time.time()-t0:.1f} s", flush=True)
        best = 1e9
        for _ in range(2):
            t0 = time.time(); res = slam_replay(bd, UL_PROFILE); sync(res.grid)
            best = min(best, time.time() - t0)
        print(f"slam B={B2} T=256 best={best*1e3:.1f} ms "
              f"({B2*256/best/1e3:.1f}K frames/s)", flush=True)

if __name__ == "__main__":
    main()
