"""Headline SLAM end-to-end timing on real TPU (one compile, one
number): slam_replay at the VERDICT workload B=128, T=256 with the
current SlamConfig defaults (feedback-free keyframe match map)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
from micro_quad_slam_tpu.replay.fusion import fusion_arrays
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.slam.pipeline import slam_replay
from micro_quad_slam_tpu.utils.config import UL_PROFILE


def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32).ravel()[:4]))


def grid_checksum(g):
    """Content-sensitive checksum (sum |cells|) — the first-4-cells sync
    reads the always-zero pad ring and printed 0.0 regardless of map
    content."""
    return float(jnp.sum(jnp.abs(jnp.asarray(g).astype(jnp.float32))))


def main():
    B, T = 128, 256
    print("backend:", jax.devices()[0].platform, flush=True)
    logs = [synth_room_scanlog(n_frames=T, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(4)]
    fr = [{**scanlog_to_arrays(lg), **fusion_arrays(lg)} for lg in logs]
    b = {k: np.concatenate([np.stack([f[k] for f in fr])] * 32)[:B]
         for k in fr[0]}
    bd = {k: jax.device_put(jnp.asarray(v)) for k, v in b.items()}
    sync(bd["x_m"])

    t0 = time.time()
    res = slam_replay(bd, UL_PROFILE)
    sync(res.grid)
    print(f"compile+run: {time.time()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        res = slam_replay(bd, UL_PROFILE)
        sync(res.grid)
        best = min(best, time.time() - t0)
    print(f"e2e best: {best*1e3:.1f} ms  ({B*T/best/1e3:.1f}K frames/s)  "
          f"checksum={grid_checksum(res.grid)}", flush=True)


if __name__ == "__main__":
    main()
