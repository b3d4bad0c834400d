"""Ablation profile of the hybridx production path on real TPU.

Splits the end-to-end hybridx replay time into (a) the XLA-side
schedule/packer (aux + fwords + hwords production), (b) the pallas
kernel launch given prepacked operands, for both conex and hybridx —
so the +delta of hybrid over cone is attributed to schedule vs kernel.

Timing uses the fetched-reduction sync (block_until_ready does not
reliably block through the axon tunnel).
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def bestof(f, reps=3):
    f()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from micro_quad_slam_tpu.replay.mapping import (
        replay_mapping_batched,
        scanlog_to_arrays,
    )
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    B, T = 1024, 256
    base = scanlog_to_arrays(
        synth_room_scanlog(n_frames=T, seed=0, path="hover",
                           yaw_rate_dps=20.0, noise_mm=5.0))
    rng = np.random.default_rng(1)
    frames = {k: np.broadcast_to(v, (B,) + v.shape).copy()
              for k, v in base.items()}
    frames["x_m"] = frames["x_m"] + rng.normal(0, 0.3, (B, 1)).astype(np.float32)
    frames["y_m"] = frames["y_m"] + rng.normal(0, 0.3, (B, 1)).astype(np.float32)
    frames["yaw_deg"] = np.mod(
        frames["yaw_deg"] + rng.uniform(-180, 180, (B, 1)).astype(np.float32)
        + 180.0, 360.0) - 180.0
    dev_frames = jax.device_put(frames)

    for kern in ("conex", "hybridx"):
        t = bestof(lambda: sync(replay_mapping_batched(
            dev_frames, UL_PROFILE, kernel=kern)[0].grid))
        print(f"e2e {kern:8s}: {t*1e3:8.1f} ms  "
              f"({B*T/t/1e3:.0f}K fps)")

    # schedule-only: run the packer (exactly what _replay_conex_jit does
    # before the launch) and fetch a reduction of its outputs
    from functools import partial

    from micro_quad_slam_tpu.ops.pallas_resident import _schedule
    from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM

    for mode in ("cone2", "hybrid2"):
        @partial(jax.jit, static_argnums=(1,))
        def pack(fr, mode):
            packed, outs, tail = _schedule(fr, UL_PROFILE, DEFAULT_GEOM,
                                           mode, None)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in packed
                       if o is not None)
        t = bestof(lambda: float(np.asarray(pack(dev_frames, mode))))
        print(f"schedule {mode:8s}: {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
