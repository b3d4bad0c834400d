"""Probe: which i16 vector primitives Mosaic v5e actually supports.

Motivation (PERFORMANCE.md roofline): residentx is VPU-ALU-bound in the
member-count pass (3 i32 ops per ray per window cell).  Reformulating
Bresenham membership as EQUALITY tests (X-major: one member row per
lane, row == q(lane); Y-major: one member lane per row) in packed i16
would cut the pass to ~2 ops at 2x lane density — IF the needed i16
primitives exist.  The kernel guide records "vector arith is i16/i32,
ordered compares i32-only"; equality compares, selects, shifts, and
min/max on i16 are undocumented, so probe each in ISOLATION (separate
pallas_call per op — a Mosaic lowering error aborts the whole kernel).

Run: MQS_PROBE=tpu python tools/tpu_probe_i16.py   (cpu = interpret mode)
"""
import os
import traceback

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

R, C = 96, 128   # the count-pass window shape


def probe(name, body, want_fn, a16, b16):
    """Run `body(a_ref, b_ref, o_ref)` as its own kernel; compare to
    want_fn(a, b) computed in numpy int16."""
    try:
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.int16),
            interpret=INTERPRET,
        )(a16, b16)
        got = np.asarray(jax.block_until_ready(out))
        want = want_fn(np.asarray(a16), np.asarray(b16))
        ok = np.array_equal(got, want.astype(np.int16))
        print(f"{name:28s} {'OK' if ok else 'WRONG RESULT'}")
        if not ok:
            bad = np.argwhere(got != want)
            r, c = bad[0]
            print(f"   first mismatch at {r},{c}: got {got[r, c]} "
                  f"want {want[r, c]} ({bad.shape[0]} total)")
        return ok
    except Exception as e:  # Mosaic lowering errors surface here
        msg = str(e).splitlines()[0][:110]
        print(f"{name:28s} FAIL: {msg}")
        if os.environ.get("MQS_PROBE_TB"):
            traceback.print_exc()
        return False


def main():
    rng = np.random.default_rng(0)
    a = rng.integers(-3000, 3000, (R, C), dtype=np.int16)
    b = rng.integers(-3000, 3000, (R, C), dtype=np.int16)
    # make some equalities actually occur
    eqm = rng.random((R, C)) < 0.3
    b[eqm] = a[eqm]
    a16, b16 = jnp.asarray(a), jnp.asarray(b)

    def k_eq(a_ref, b_ref, o_ref):
        o_ref[...] = (a_ref[...] == b_ref[...]).astype(jnp.int16)

    def k_eq_sel(a_ref, b_ref, o_ref):
        m = a_ref[...] == b_ref[...]
        o_ref[...] = jnp.where(m, jnp.int16(1), jnp.int16(0))

    def k_eq_sel_val(a_ref, b_ref, o_ref):
        m = a_ref[...] == b_ref[...]
        o_ref[...] = jnp.where(m, a_ref[...], b_ref[...])

    def k_add(a_ref, b_ref, o_ref):
        o_ref[...] = a_ref[...] + b_ref[...]

    def k_shr(a_ref, b_ref, o_ref):
        o_ref[...] = lax.shift_right_arithmetic(a_ref[...], jnp.int16(15))

    def k_minmax(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.minimum(jnp.maximum(a_ref[...], b_ref[...]),
                                 jnp.int16(100))

    def k_iota16(a_ref, b_ref, o_ref):
        o_ref[...] = (lax.broadcasted_iota(jnp.int16, (R, C), 0)
                      + a_ref[...] * jnp.int16(0))

    def k_iota32_cvt(a_ref, b_ref, o_ref):
        o_ref[...] = (lax.broadcasted_iota(jnp.int32, (R, C), 0)
                      .astype(jnp.int16) + a_ref[...] * jnp.int16(0))

    def k_lt(a_ref, b_ref, o_ref):
        o_ref[...] = (a_ref[...] < b_ref[...]).astype(jnp.int16)

    def k_or_sign(a_ref, b_ref, o_ref):
        # the sign-trick interval test: (u | v) >> 15 in i16
        o_ref[...] = lax.shift_right_arithmetic(
            a_ref[...] | b_ref[...], jnp.int16(15))

    def k_bcast_row(a_ref, b_ref, o_ref):
        # [1, C] operand broadcast against [R, C] — the per-lane q layout
        o_ref[...] = (a_ref[...] == b_ref[0:1, :]).astype(jnp.int16)

    def k_bcast_col(a_ref, b_ref, o_ref):
        # [R, 1] operand broadcast — the per-row q2 layout (Y-major)
        o_ref[...] = (a_ref[...] == b_ref[:, 0:1]).astype(jnp.int16)

    print("probe backend:", jax.devices()[0].platform)
    results = {}
    results["eq->i16"] = probe(
        "i16 == (to i16)", k_eq, lambda x, y: (x == y).astype(np.int16),
        a16, b16)
    results["eq_sel"] = probe(
        "i16 == + select 1/0", k_eq_sel,
        lambda x, y: (x == y).astype(np.int16), a16, b16)
    results["eq_sel_val"] = probe(
        "i16 == + select values", k_eq_sel_val,
        lambda x, y: np.where(x == y, x, y), a16, b16)
    results["add"] = probe(
        "i16 add", k_add, lambda x, y: x + y, a16, b16)
    results["shr"] = probe(
        "i16 >> 15 (arith)", k_shr, lambda x, y: x >> 15, a16, b16)
    results["minmax"] = probe(
        "i16 min/max", k_minmax,
        lambda x, y: np.minimum(np.maximum(x, y), np.int16(100)),
        a16, b16)
    results["iota16"] = probe(
        "i16 broadcasted_iota", k_iota16,
        lambda x, y: np.broadcast_to(
            np.arange(R, dtype=np.int16)[:, None], (R, C)).copy(),
        a16, b16)
    results["iota32cvt"] = probe(
        "i32 iota -> i16 convert", k_iota32_cvt,
        lambda x, y: np.broadcast_to(
            np.arange(R, dtype=np.int16)[:, None], (R, C)).copy(),
        a16, b16)
    results["lt"] = probe(
        "i16 < (ordered, expect FAIL)", k_lt,
        lambda x, y: (x < y).astype(np.int16), a16, b16)
    results["or_sign"] = probe(
        "i16 | then >>15", k_or_sign, lambda x, y: (x | y) >> 15,
        a16, b16)
    results["bcast_row"] = probe(
        "i16 == vs [1,C] broadcast", k_bcast_row,
        lambda x, y: (x == y[0:1, :]).astype(np.int16), a16, b16)
    results["bcast_col"] = probe(
        "i16 == vs [R,1] broadcast", k_bcast_col,
        lambda x, y: (x == y[:, 0:1]).astype(np.int16), a16, b16)
    print({k: bool(v) for k, v in results.items()})


if __name__ == "__main__":
    main()
