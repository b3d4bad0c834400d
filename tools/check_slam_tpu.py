"""SLAM pass-3 resident raster on real TPU: exactness + slam timing."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from micro_quad_slam_tpu.ops.pallas_resident import pallas_map_track
from micro_quad_slam_tpu.slam.pipeline import _map_pass, slam_replay
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
    gx, _, (ox, oy) = _map_pass(jnp.asarray(beams), jnp.asarray(poses), 0,
                                UL_PROFILE, GEOM, False, kf)
    gp = pallas_map_track(jnp.asarray(beams), jnp.asarray(poses[..., 0]),
                          jnp.asarray(poses[..., 1]),
                          jnp.rad2deg(jnp.asarray(poses[..., 2])),
                          ox, oy, UL_PROFILE, GEOM)
    print("map_track bit-equal on TPU:",
          np.array_equal(np.asarray(gp), np.asarray(gx)), flush=True)

    # end-to-end slam timing (B=64, T=256)
    logs = [synth_room_scanlog(n_frames=256, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(4)]
    fr = [{**scanlog_to_arrays(lg), **fusion_arrays(lg)} for lg in logs]
    b = {k: np.concatenate([np.stack([f[k] for f in fr])] * 16)[:64]
         for k in fr[0]}
    bd = {k: jax.device_put(jnp.asarray(v)) for k, v in b.items()}
    sync(bd["x_m"])
    res = slam_replay(bd, UL_PROFILE); sync(res.grid)
    best = 1e9
    for _ in range(2):
        t0 = time.time(); res = slam_replay(bd, UL_PROFILE); sync(res.grid)
        best = min(best, time.time() - t0)
    print(f"slam B=64 T=256 best={best*1e3:.1f} ms "
          f"({64*256/best/1e3:.1f}K frames/s)", flush=True)

if __name__ == "__main__":
    main()
