"""Decompose resident replay cost: schedule scan vs pallas kernel."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.ops import pallas_resident as pr
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM
from micro_quad_slam_tpu.utils.config import UL_PROFILE
from check_resident_tpu import make_frames


def sync(x):
    return float(jnp.sum(x.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnums=(1,))
def sched(frames, cfg):
    rw, outs, fin = pr._schedule(frames, cfg, DEFAULT_GEOM)
    return rw


def kernel_only(ray_words, B, T):
    geom = DEFAULT_GEOM
    grids = jnp.zeros((B, geom.prows, geom.pcols), jnp.int8)
    kernel = functools.partial(pr._resident_kernel, geom=geom,
                               cfg=UL_PROFILE.map, nt=T)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda b, t: (t, b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(grids.shape, jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((geom.prows, geom.pcols), jnp.int8),
            pltpu.VMEM((geom.win_rows + 8, 256), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ray_words, grids)


def timeit(fn, syncer, reps=3):
    out = fn()
    syncer(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        syncer(out)
        best = min(best, time.time() - t0)
    return best


def main():
    for B, T in ((256, 128), (1024, 128)):
        fr = make_frames(B, T)
        frd = {k: jax.device_put(jnp.asarray(v)) for k, v in fr.items()}
        sync(frd["x_m"])

        t_sched = timeit(lambda: sched(frd, UL_PROFILE), sync)
        rw = sched(frd, UL_PROFILE)
        sync(rw)
        run_k = jax.jit(functools.partial(kernel_only, B=B, T=T))
        t_kern = timeit(lambda: run_k(rw), sync)
        tot = B * T
        print(f"B={B} T={T}: schedule={t_sched*1e3:.1f} ms "
              f"({tot/t_sched/1e3:.0f}K fps) "
              f"kernel={t_kern*1e3:.1f} ms ({tot/t_kern/1e3:.0f}K fps)",
              flush=True)


if __name__ == "__main__":
    main()
