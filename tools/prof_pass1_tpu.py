"""Pass-1 internals ablation on real TPU, on the PRODUCTION chunked path
(_map_pass_chunked, current SlamConfig: kf_every * match_chunk_intervals
frames per chunk).  Stage costs difference out the ~28 ms axon
round-trip floor."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.ops.beams import extract_beams
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM as GEOM
from micro_quad_slam_tpu.replay.fusion import fusion_arrays
from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.slam.pipeline import (
    _map_pass_chunked, _odo_and_schedule)
from micro_quad_slam_tpu.utils.config import UL_PROFILE


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
    cfg = UL_PROFILE
    B, T = 128, 256
    logs = [synth_room_scanlog(n_frames=T, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(4)]
    fr = [{**scanlog_to_arrays(lg), **fusion_arrays(lg)} for lg in logs]
    b = {k: np.concatenate([np.stack([f[k] for f in fr])] * 32)[:B]
         for k in fr[0]}
    bd = {k: jax.device_put(jnp.asarray(v), jax.devices()[0])
          for k, v in b.items()}
    sync(bd["x_m"])

    prep = jax.jit(lambda f: (extract_beams(f["grid_mm"], cfg.tof)[0],)
                   + _odo_and_schedule(f, cfg))
    beams, odo, sched = prep(bd)
    sync(beams)
    tiny = jax.jit(lambda o: o[0, :2, 0])
    floor = bestof(lambda: tiny(odo))
    print(f"floor: {floor*1e3:.1f} ms", flush=True)

    def variant(ablate):
        fn = jax.jit(lambda bm, p, sc: _map_pass_chunked(
            bm, p, cfg, GEOM, cfg.slam.kf_every, sc, _ablate=ablate))
        return lambda: fn(beams, odo, sched)

    for name in ("nomatch nokernel", "nokernel", "nomatch", "discard", ""):
        t = bestof(variant(name))
        print(f"{name or 'full':18s}: {(t-floor)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
