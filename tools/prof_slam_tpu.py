"""Per-stage SLAM timing on real TPU by pipeline differencing.

The axon tunnel adds a ~28 ms dispatch+fetch round trip to EVERY timed
call (measured with a tiny jit; tools/README).  Stage costs here are
reported as differences between successive `upto` truncations of the
same jitted pipeline, which cancels that constant.
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
from micro_quad_slam_tpu.replay.fusion import fusion_arrays
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.slam.pipeline import _slam_impl
from micro_quad_slam_tpu.utils.config import UL_PROFILE, UL_RT_PROFILE
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM


def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32).ravel()[:4]))


def bestof(f, reps=3):
    out = f()
    sync(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = f()
        sync(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    prof = (UL_RT_PROFILE if len(sys.argv) > 3 and sys.argv[3] == "rt"
            else UL_PROFILE)
    logs = [synth_room_scanlog(n_frames=T, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(4)]
    fr = [{**scanlog_to_arrays(lg), **fusion_arrays(lg)} for lg in logs]
    b = {k: np.concatenate([np.stack([f[k] for f in fr])] * (-(-B // 4)))[:B]
         for k in fr[0]}
    bd = {k: jax.device_put(jnp.asarray(v), jax.devices()[0])
          for k, v in b.items()}
    sync(bd["x_m"])

    # overhead floor
    tiny = jax.jit(lambda f: f["x_m"][0, :2])
    floor = bestof(lambda: tiny(bd))
    print(f"tunnel round-trip floor: {floor*1e3:.1f} ms", flush=True)

    names = {0: "odo+sched", 1: "+pass1(match+chunks)", 2: "+loop_edges",
             3: "+posegraph_gn", 4: "+track_correct", 99: "+pass3_raster"}
    prev = floor
    for upto in (0, 1, 2, 3, 4, 99):
        t = bestof(lambda u=upto: _slam_impl(bd, prof, DEFAULT_GEOM, None, None, None, u))
        print(f"upto={upto:2d} {names[upto]:22s} cum={t*1e3:7.1f} ms "
              f"stage={(t-prev)*1e3:7.1f} ms", flush=True)
        prev = t
    total = prev - floor
    print(f"e2e minus tunnel floor: {total*1e3:.1f} ms "
          f"({B*T/total/1e3:.1f}K frames/s)", flush=True)


if __name__ == "__main__":
    main()
