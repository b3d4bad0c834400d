"""Lattice-matcher kernel micro-profile on real TPU: per-match cost of
pallas_match_lattice at the SLAM pass-1 shapes (snapshot slabs, 7x7x7
lattice) and the loop-closure shapes (raster windows, 5x5x5), across
per-program match-group sizes G.  Guides the G default and quantifies
the per-program overhead the grouping amortizes (VERDICT round-3 ask 2:
SLAM raw throughput)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.ops.pallas_scanmatch import pallas_match_lattice


def bestof(f, reps=3):
    out = f()
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = f()
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, out


def run(name, N, SR, SC, Y, T, NB=32, groups=(1, 4, 8, 16)):
    rng = np.random.default_rng(0)
    slabs = jnp.asarray(rng.integers(-80, 81, (N, SR, SC)), jnp.int8)
    ry = jnp.asarray(rng.integers(-1, SR, (N, Y * T, NB)), jnp.int32)
    rx = jnp.asarray(rng.integers(-1, SC, (N, Y * T, NB)), jnp.int32)
    print(f"[{name}] N={N} slab=[{SR},{SC}] lattice={Y}x{T}x{T}",
          flush=True)
    ref = None
    for G in groups:
        t, out = bestof(lambda G=G: pallas_match_lattice(
            slabs, ry, rx, Y, None, G))
        if ref is None:
            ref = np.asarray(out)
        else:
            assert np.array_equal(ref, np.asarray(out)), f"G={G} mismatch"
        print(f"  G={G:3d}: {t*1e3:7.2f} ms  ({t/N*1e6:.2f} us/match)",
              flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("pass1", "both"):
        run("pass1", 7168, 104, 256, 7, 7)
    if which in ("loop", "both"):
        run("loop", 19968, 96, 128, 5, 5)


if __name__ == "__main__":
    main()
