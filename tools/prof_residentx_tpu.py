"""Decompose residentx replay cost on real TPU: XLA schedule+pack vs
pallas kernel vs end-to-end, at the driver bench workload (B=1024,
T=256).  Quantifies the roofline's "schedule cap" claim
(PERFORMANCE.md: the XLA-side schedule alone bounds everything at
~2.1 M frames/s) for the exact2 words path specifically, so the next
optimization round knows whether to attack the kernel ALU or the
schedule/pack HBM traffic."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.ops import pallas_residentx as prx
from micro_quad_slam_tpu.ops.pallas_resident import _schedule
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM
from micro_quad_slam_tpu.utils.config import UL_PROFILE
from check_resident_tpu import make_frames


def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32).ravel()[:4]))


def timeit(fn, syncer, reps=3):
    out = fn()
    syncer(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        syncer(out)
        best = min(best, time.time() - t0)
    return best, out


@functools.partial(jax.jit, static_argnums=(1,))
def sched_only(frames, cfg):
    (aux, words), outs, fin = _schedule(frames, cfg, DEFAULT_GEOM,
                                        "exact2")
    return aux, words


def main():
    import sys
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print("backend:", jax.devices()[0].platform, flush=True)
    frames = make_frames(B, T)
    frames = {k: jax.device_put(jnp.asarray(v)) for k, v in frames.items()}
    sync(frames["x_m"])

    t_s, (aux, words) = timeit(lambda: sched_only(frames, UL_PROFILE),
                               lambda o: sync(o[0]))
    print(f"schedule+pack alone: {t_s*1e3:7.1f} ms "
          f"({B*T/t_s/1e6:.2f} M fps cap)  words {words.shape} "
          f"{words.dtype} = {words.size*4/2**20:.0f} MiB", flush=True)

    grids = jnp.zeros((B, DEFAULT_GEOM.prows, DEFAULT_GEOM.pcols),
                      jnp.int8)
    opts = prx.rx_opts_from_env()     # explicit opt-in: MQS_RX_* knobs
    kern = jax.jit(lambda a, w, g: prx._residentx_call(
        a, w, g, UL_PROFILE.map, DEFAULT_GEOM, False, opts))
    t_k, _ = timeit(lambda: kern(aux, words, grids), sync)
    print(f"kernel alone:        {t_k*1e3:7.1f} ms "
          f"({B*T/t_k/1e6:.2f} M fps cap)  opts={opts}", flush=True)

    t_e, _ = timeit(
        lambda: prx.pallas_replay_residentx(frames, UL_PROFILE,
                                            opts=opts),
        lambda o: sync(o[0].grid))
    print(f"end-to-end:          {t_e*1e3:7.1f} ms "
          f"({B*T/t_e/1e6:.2f} M frames/s)", flush=True)
    print(f"overlap: sched+kernel-sum {1e3*(t_s+t_k):7.1f} ms vs e2e "
          f"{t_e*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
