"""Probe 2: f32 scalars into a pallas kernel via i32 SMEM words (bitcast),
plus the f32 vector ops the cone kernel needs (mult/compare/select/sqrt-free
squared-range math, f32->i32 conversions)."""
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


def kernel(w_ref, out_ref):
    ux = w_ref[0, 0]
    uy = w_ref[0, 1]
    th = w_ref[0, 2]
    rows = lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)
    cols = lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
    c = ux * cols + uy * rows          # broadcast f32 [8, 128]
    s = ux * rows - uy * cols
    m = (c > th) & (s >= 0.0)
    v = jnp.where(m, c * c + s * s, jnp.float32(-1.0))
    out_ref[...] = jnp.where(v > 25.0, jnp.int32(7), jnp.int32(-3))


def run(words):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=INTERPRET,
    )(words)


def main():
    vals = np.array([0.6, -0.8, 1.5], np.float32)
    words = vals.reshape(1, 3)
    got = np.asarray(jax.jit(run)(jnp.asarray(words)))
    ux, uy, th = vals
    rows = np.arange(8)[:, None].astype(np.float32)
    cols = np.arange(128)[None, :].astype(np.float32)
    c = ux * cols + uy * rows
    s = ux * rows - uy * cols
    m = (c > th) & (s >= 0)
    v = np.where(m, c * c + s * s, -1.0)
    want = np.where(v > 25.0, 7, -3).astype(np.int32)
    ok = np.array_equal(got, want)
    print("probe2 backend:", jax.devices()[0].platform, "match:", ok)
    assert ok


if __name__ == "__main__":
    main()
