"""Headline SLAM end-to-end timing on real TPU (one compile, one
number per operating point): slam_replay at the VERDICT workload
(default B=256, T=256) under the throughput profile (UL_RT_PROFILE:
slam_outer=1, loop_refine=0 — the single-global-round formulation) and
optionally the accuracy defaults (UL_PROFILE: outer=3, refine=3).

usage: prof_slam_e2e_tpu.py [B] [T] [rt|acc|both]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
from micro_quad_slam_tpu.replay.fusion import fusion_arrays
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.slam.pipeline import slam_replay
from micro_quad_slam_tpu.utils.config import UL_PROFILE, UL_RT_PROFILE


def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32).ravel()[:4]))


def grid_checksum(g):
    """Content-sensitive checksum (sum |cells|) — the first-4-cells sync
    reads the always-zero pad ring and printed 0.0 regardless of map
    content."""
    return float(jnp.sum(jnp.abs(jnp.asarray(g).astype(jnp.float32))))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    mode = sys.argv[3] if len(sys.argv) > 3 else "rt"
    print("backend:", jax.devices()[0].platform, flush=True)
    logs = [synth_room_scanlog(n_frames=T, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(4)]
    fr = [{**scanlog_to_arrays(lg), **fusion_arrays(lg)} for lg in logs]
    nrep = -(-B // 4)
    b = {k: np.concatenate([np.stack([f[k] for f in fr])] * nrep)[:B]
         for k in fr[0]}
    bd = {k: jax.device_put(jnp.asarray(v)) for k, v in b.items()}
    sync(bd["x_m"])

    points = {"rt": [("rt", UL_RT_PROFILE)],
              "acc": [("acc", UL_PROFILE)],
              "both": [("rt", UL_RT_PROFILE), ("acc", UL_PROFILE)]}[mode]
    for name, prof in points:
        t0 = time.time()
        res = slam_replay(bd, prof)
        sync(res.grid)
        print(f"[{name}] compile+run: {time.time()-t0:.1f} s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            res = slam_replay(bd, prof)
            sync(res.grid)
            best = min(best, time.time() - t0)
        print(f"[{name}] e2e best: {best*1e3:.1f} ms  "
              f"({B*T/best/1e3:.1f}K frames/s)  "
              f"checksum={grid_checksum(res.grid)}", flush=True)


if __name__ == "__main__":
    main()
