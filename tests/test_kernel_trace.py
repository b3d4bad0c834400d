"""Trace-time guards for every pallas_call entry point.

jax.eval_shape traces each kernel's BODY with interpret=False (the
production configuration) without compiling or executing — the kernel
function is traced to a jaxpr when pallas_call is bound, so in-kernel
shape/contract drift (the round-4 `_rx_group_body` regression class:
a caller kept passing a raw [1, 1, F, 32, 128] block after the callee's
contract changed to a pre-sliced [F, 32, 128] ref) fails HERE, in
seconds on CPU, before any TPU is touched (VERDICT round 4, ask 2c).

Mosaic-lowering-only failures (BlockSpec rejections) are the complement
and can only be caught on hardware: tools/check_all_tpu.py runs every
entry point below on the real chip.  Keep the two lists in sync.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM as GEOM
from micro_quad_slam_tpu.utils.config import UL_PROFILE

B, T = 2, 16
S = lambda shape, dt=jnp.float32: jax.ShapeDtypeStruct(shape, dt)


def _frames(b=B, t=T):
    return {
        "grid_mm": S((b, t, 4, 8, 8), jnp.uint16),
        "x_m": S((b, t)), "y_m": S((b, t)), "yaw_deg": S((b, t)),
        "of_q": S((b, t)), "of_rate_x": S((b, t)),
        "sys_health": S((b, t), jnp.int32), "state": S((b, t), jnp.int32),
    }


def test_trace_replay_residentx():
    from micro_quad_slam_tpu.ops.pallas_residentx import (
        RxOpts, pallas_replay_residentx)
    jax.eval_shape(lambda f: pallas_replay_residentx(
        f, UL_PROFILE, GEOM, interpret=False), _frames())
    # outer-grid kernel variant (inner=False) traces too
    jax.eval_shape(lambda f: pallas_replay_residentx(
        f, UL_PROFILE, GEOM, interpret=False,
        opts=RxOpts(inner=False)), _frames())


def test_trace_replay_resident_v1():
    from micro_quad_slam_tpu.ops.pallas_resident import (
        pallas_replay_resident)
    for mode in ("exact", "cone"):
        jax.eval_shape(lambda f: pallas_replay_resident(
            f, UL_PROFILE, GEOM, interpret=False, mode=mode), _frames())


def test_trace_replay_conex():
    from micro_quad_slam_tpu.ops.pallas_residentx import (
        pallas_replay_conex)
    for hybrid in (False, True):
        jax.eval_shape(lambda f: pallas_replay_conex(
            f, UL_PROFILE, GEOM, interpret=False, hybrid=hybrid),
            _frames())


def test_trace_map_track_chunk_sched():
    from micro_quad_slam_tpu.ops.pallas_resident import pallas_map_track
    from micro_quad_slam_tpu.ops.pallas_residentx import (
        pallas_map_chunk, pallas_map_chunk_sched, pallas_map_track_x)
    bm = S((B, T, 4, 8))
    bt = S((B, T))
    b1 = S((B,))
    zi = S((B, T), jnp.int32)
    jax.eval_shape(lambda *a: pallas_map_track(
        *a, UL_PROFILE, GEOM, interpret=False), bm, bt, bt, bt, b1, b1)
    jax.eval_shape(lambda *a: pallas_map_track_x(
        *a, UL_PROFILE, GEOM, interpret=False), bm, bt, bt, bt, b1, b1)
    g = S((B, GEOM.prows, GEOM.pcols), jnp.int8)
    jax.eval_shape(lambda *a: pallas_map_chunk(
        *a, UL_PROFILE, GEOM, interpret=False), g, bm, bt, bt, bt, b1, b1)
    jax.eval_shape(lambda *a: pallas_map_chunk_sched(
        *a, UL_PROFILE, GEOM, interpret=False),
        g, bm, bt, bt, bt, bt, bt, zi, zi, zi)


def test_trace_map_snap():
    """The snapshot-emitting SLAM pass-1 kernel — the entry whose caller
    contract broke in round 4 (ops/pallas_residentx.py:820)."""
    from micro_quad_slam_tpu.ops.pallas_residentx import pallas_map_snap
    K, n_kf = 8, 4
    g = S((B, GEOM.prows, GEOM.pcols), jnp.int8)
    bm = S((B, K, 4, 8))
    bk = S((B, K))
    zi = S((B, K), jnp.int32)
    jax.eval_shape(lambda *a: pallas_map_snap(
        *a, n_kf, UL_PROFILE, GEOM, interpret=False),
        g, bm, bk, bk, bk, bk, bk, zi, zi, zi, zi, zi)


def test_trace_map_step():
    """The simulator scan-tick slab kernel (trace side; its round-4
    break was Mosaic-only and is guarded by check_all_tpu)."""
    from micro_quad_slam_tpu.ops.pallas_residentx import pallas_map_step
    g = S((B, GEOM.prows, GEOM.pcols), jnp.int8)
    jax.eval_shape(lambda *a: pallas_map_step(
        *a, UL_PROFILE, GEOM, interpret=False),
        g, S((B, 4, 8)), S((B,)), S((B,)), S((B,)), S((B,)), S((B,)),
        S((B,), jnp.bool_))


def test_trace_match_lattice():
    from micro_quad_slam_tpu.ops.pallas_scanmatch import (
        pallas_match_lattice)
    N, SR, SC = 4, GEOM.win_rows + 8, 2 * GEOM.win_cols
    n_yaw, Tc = 5, 9
    jax.eval_shape(lambda s, ry, rx: pallas_match_lattice(
        s, ry, rx, n_yaw, False),
        S((N, SR, SC), jnp.int8), S((N, n_yaw * Tc, 32), jnp.int32),
        S((N, n_yaw * Tc, 32), jnp.int32))


@pytest.mark.slow
def test_env_knobs_cannot_alter_production(monkeypatch):
    """A stray MQS_RX_* environment variable must NOT change production
    kernel results (VERDICT round 4, weak 6): the entry points consult
    only their explicit RxOpts argument.  Run the interpret-mode replay
    with correctness-altering knobs set and assert bit-equality with
    the clean run."""
    from micro_quad_slam_tpu.ops.pallas_residentx import (
        pallas_replay_residentx)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays

    lg = synth_room_scanlog(n_frames=16, seed=7, noise_mm=4.0)
    fr = {k: jnp.asarray(v)[None] for k, v in scanlog_to_arrays(lg).items()}
    st0, _ = pallas_replay_residentx(fr, UL_PROFILE)
    monkeypatch.setenv("MQS_RX_ABLATE", "count,fix,roll,apply")
    monkeypatch.setenv("MQS_RX_DIRECT", "1")
    # fresh trace under the poisoned env (different shapes -> no reuse
    # of the cached trace above)
    fr2 = {k: jnp.concatenate([v, v]) for k, v in fr.items()}
    st2, _ = pallas_replay_residentx(fr2, UL_PROFILE)
    np.testing.assert_array_equal(np.asarray(st2.grid[0]),
                                  np.asarray(st0.grid[0]))


def test_rx_opts_ride_the_jit_cache_key():
    """The round-4 A/B pitfall inverted: two DIFFERENT RxOpts instances
    must NOT share a cached trace (the env-var knobs silently did,
    measuring the same kernel twice — ADVICE round 4).  An explicit
    correctness-altering ablation must change results on identical
    inputs within one process."""
    from micro_quad_slam_tpu.ops.pallas_residentx import (
        RxOpts, pallas_replay_residentx)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays

    lg = synth_room_scanlog(n_frames=8, seed=9, noise_mm=4.0)
    fr = {k: jnp.asarray(v)[None] for k, v in scanlog_to_arrays(lg).items()}
    st_a, _ = pallas_replay_residentx(fr, UL_PROFILE)
    st_b, _ = pallas_replay_residentx(fr, UL_PROFILE,
                                      opts=RxOpts(ablate="count"))
    assert not np.array_equal(np.asarray(st_a.grid),
                              np.asarray(st_b.grid)), (
        "ablate='count' reused the production trace")


def test_rx_opts_from_env_validates(monkeypatch):
    from micro_quad_slam_tpu.ops.pallas_residentx import rx_opts_from_env
    monkeypatch.setenv("MQS_RX_CHUNK", "0")
    with pytest.raises(ValueError):
        rx_opts_from_env()
    monkeypatch.setenv("MQS_RX_CHUNK", "2")
    monkeypatch.setenv("MQS_RX_ABLATE", "count")
    o = rx_opts_from_env()
    assert o.chunk == 2 and o.ablate == "count"
