"""Probe: validate Mosaic primitives needed by the resident replay kernel.

Checks, per (b, t) program on a 2-D pallas grid:
  1. whole mini-grid HBM->VMEM DMA at t==0, VMEM scratch persists over t
  2. SMEM BlockSpec (1, 1, 8, 128) over an i32 [B, T, 8, 128] table
  3. predicated full-scratch rewrite with dynamic pltpu.roll (both axes, i8)
  4. VMEM->VMEM slab DMA at dynamic (8, 128)-aligned offsets
  5. compact-roll of the slab, static slice, compute, pad+roll-back+blend
  6. store back to HBM at t==T-1 (aliased in/out)

Run: MQS_PROBE=tpu python scratch_probe.py   (or cpu for interpret)
"""
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PLAT = os.environ.get("MQS_PROBE", "cpu")
if PLAT == "cpu":
    jax.config.update("jax_platforms", "cpu")
INTERPRET = PLAT == "cpu"

PR, PC = 64, 256     # mini padded grid
AWR, AWC = 16, 256   # slab (rows mult of 8, cols mult of 128... AWC == PC here)
CR, CC = 8, 128      # compact window
B, T = 3, 4


def _nn(s, n):
    """non-negative roll amount for a left-shift by s over modulus n"""
    return lax.rem(lax.rem(-s, n) + n, n)


def kernel(tab_ref, grid_ref, out_ref, vgrid, slab, s1, s2, s3):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        cp = pltpu.make_async_copy(grid_ref.at[b], vgrid, s1)
        cp.start()
        cp.wait()

    r0a = pl.multiple_of(tab_ref[0, 0, 0, 0], 8)
    c0a = pl.multiple_of(tab_ref[0, 0, 0, 1], 128)
    ry = tab_ref[0, 0, 0, 2]
    rc = tab_ref[0, 0, 0, 3]
    do = tab_ref[0, 0, 0, 4] != 0
    sx = tab_ref[0, 0, 0, 5]
    sy = tab_ref[0, 0, 0, 6]
    add = tab_ref[0, 0, 0, 7]

    @pl.when(do)
    def _():
        g = vgrid[...].astype(jnp.int32)       # pltpu.roll is 32-bit only
        g = pltpu.roll(g, _nn(sy, PR), 0)      # new[r] = old[r + sy]
        g = pltpu.roll(g, _nn(sx, PC), 1)
        vgrid[...] = g.astype(jnp.int8)

    cp = pltpu.make_async_copy(
        vgrid.at[pl.ds(r0a, AWR), pl.ds(c0a, AWC)], slab, s2)
    cp.start()
    cp.wait()

    w = slab[...]
    w32 = w.astype(jnp.int32)
    comp = pltpu.roll(pltpu.roll(w32, _nn(ry, AWR), 0),
                      _nn(rc, AWC), 1).astype(jnp.int8)
    # Mosaic vector arithmetic floor is i16 — i8 is storage-only
    comp = (comp[:CR, :CC].astype(jnp.int16)
            + add.astype(jnp.int16)).astype(jnp.int8)

    full = jnp.pad(comp, ((0, AWR - CR), (0, AWC - CC))).astype(jnp.int32)
    back = pltpu.roll(pltpu.roll(full, lax.rem(ry, AWR), 0),
                      lax.rem(rc, AWC), 1).astype(jnp.int8)
    ri = lax.broadcasted_iota(jnp.int32, (AWR, 1), 0)
    ci = lax.broadcasted_iota(jnp.int32, (1, AWC), 1)
    inw = (ri >= ry) & (ri < ry + CR) & (ci >= rc) & (ci < rc + CC)
    slab[...] = jnp.where(inw, back, w)

    cp = pltpu.make_async_copy(
        slab, vgrid.at[pl.ds(r0a, AWR), pl.ds(c0a, AWC)], s2)
    cp.start()
    cp.wait()

    @pl.when(t == T - 1)
    def _():
        cp = pltpu.make_async_copy(vgrid, out_ref.at[b], s3)
        cp.start()
        cp.wait()


def run(tab, grids):
    return pl.pallas_call(
        functools.partial(kernel),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(grids.shape, jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((PR, PC), jnp.int8),
            pltpu.VMEM((AWR, AWC), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tab, grids)


def reference(tab, grids):
    g = np.array(grids, np.int8)
    for b in range(B):
        for t in range(T):
            r0a, c0a, ry, rc, do, sx, sy, add = (int(v) for v in tab[b, t, 0, :8])
            if do:
                g[b] = np.roll(np.roll(g[b], -sy, 0), -sx, 1)
            r0, c0 = r0a + ry, c0a + rc
            g[b, r0:r0 + CR, c0:c0 + CC] += np.int8(add)
    return g


def main():
    rng = np.random.default_rng(0)
    grids = rng.integers(-50, 50, (B, PR, PC), dtype=np.int8)
    tab = np.zeros((B, T, 8, 128), np.int32)
    for b in range(B):
        for t in range(T):
            r0 = int(rng.integers(0, PR - AWR))
            c0 = 0 if PC == AWC else int(rng.integers(0, PC - AWC))
            tab[b, t, 0, 0] = (r0 // 8) * 8
            tab[b, t, 0, 1] = (c0 // 128) * 128
            tab[b, t, 0, 2] = r0 - (r0 // 8) * 8
            tab[b, t, 0, 3] = int(rng.integers(0, AWC - CC))
            tab[b, t, 0, 4] = int(rng.integers(0, 2))
            tab[b, t, 0, 5] = int(rng.integers(-5, 6))
            tab[b, t, 0, 6] = int(rng.integers(-5, 6))
            tab[b, t, 0, 7] = int(rng.integers(1, 4))

    got = np.asarray(jax.jit(run)(jnp.asarray(tab), jnp.asarray(grids)))
    want = reference(tab, grids)
    ok = np.array_equal(got, want)
    print("probe backend:", jax.devices()[0].platform, "match:", ok)
    if not ok:
        bad = np.argwhere(got != want)
        print("mismatches:", bad.shape[0], "first:", bad[:5])
        b, r, c = bad[0]
        print("got", got[b, r, c], "want", want[b, r, c])
    assert ok


if __name__ == "__main__":
    main()
