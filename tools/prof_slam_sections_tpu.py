"""Decompose accuracy-profile SLAM cost on real TPU (VERDICT round 4,
ask 3: default-profile throughput regressed 3x when slam_outer=3 /
loop_refine=3 / match_iters=2 landed).

Two sweeps at the driver workload (B=128, T=256 by default):
  1. outer-round scaling: slam_outer in {1, 2, 3} at full pipeline —
     the marginal cost of each global round;
  2. stage truncation within the LAST round via slam_replay(upto=):
     1 = ekf + pass-1 match, 2 = + loop stage, 3 = + GN solve +
     refine rounds, 4 = + track composition, full = + pass-3 re-raster;
  3. knob ablations: match_iters=1, loop_refine in {0, 1}.

usage: prof_slam_sections_tpu.py [B] [T]
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.replay.fusion import fusion_arrays
from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM
from micro_quad_slam_tpu.slam.pipeline import _slam_impl, slam_replay
from micro_quad_slam_tpu.utils.config import UL_PROFILE


def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32).ravel()[:4]))


def timeit(fn, reps=3):
    out = fn()
    sync(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        sync(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    return best


def vary(prof, **kw):
    return dataclasses.replace(
        prof, slam=dataclasses.replace(prof.slam, **kw))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print("backend:", jax.devices()[0].platform, flush=True)
    from micro_quad_slam_tpu.sim import slam_bench_frames
    bd = slam_bench_frames(B, T)
    sync(bd["x_m"])

    line = lambda tag, dt: print(
        f"{tag:34s} {dt*1e3:8.1f} ms  ({B*T/dt/1e3:7.1f} K fps)",
        flush=True)

    for n in (1, 2, 3):
        dt = timeit(lambda: slam_replay(bd, vary(UL_PROFILE, slam_outer=n)))
        line(f"full, slam_outer={n}", dt)

    for upto, tag in ((1, "last-round upto=1 (pass1)"),
                      (2, "last-round upto=2 (+loop)"),
                      (3, "last-round upto=3 (+solve+refine)"),
                      (4, "last-round upto=4 (+compose)")):
        dt = timeit(lambda: _slam_impl(bd, UL_PROFILE, DEFAULT_GEOM,
                                       None, None, None, upto))
        line(tag, dt)
    dt = timeit(lambda: slam_replay(bd, UL_PROFILE))
    line("full (3 outer, +pass3)", dt)

    for kw, tag in (({"match_iters": 1}, "full, match_iters=1"),
                    ({"loop_refine": 0}, "full, loop_refine=0"),
                    ({"loop_refine": 1}, "full, loop_refine=1"),
                    ({"loop_cand": 2}, "full, loop_cand=2")):
        dt = timeit(lambda: slam_replay(bd, vary(UL_PROFILE, **kw)))
        line(f"{tag}", dt)


if __name__ == "__main__":
    main()
