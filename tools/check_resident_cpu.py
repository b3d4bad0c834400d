"""Resident kernel correctness: bit-match vs the XLA replay (CPU interpret)."""
import os

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from micro_quad_slam_tpu.ops.pallas_resident import pallas_replay_resident
from micro_quad_slam_tpu.replay.mapping import (
    replay_mapping_batched, scanlog_to_arrays)
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.utils.config import UL_PROFILE


def main():
    logs = [
        synth_room_scanlog(n_frames=40, seed=3, path="circle",
                           noise_mm=5.0, dropout_p=0.05),
        # long line flight -> triggers mid-flight recentering
        synth_room_scanlog(n_frames=40, room=(-3.0, -3.0, 40.0, 3.0),
                           path="line", seed=7, noise_mm=4.0),
        synth_room_scanlog(n_frames=40, seed=11, state=1),  # never inits
    ]
    frames = [scanlog_to_arrays(lg) for lg in logs]
    batched = {k: np.stack([f[k] for f in frames]) for k in frames[0]}
    # force strong drift on quad 1 so the replay recenters mid-flight
    T = batched["x_m"].shape[1]
    batched["x_m"][1] = np.linspace(0.0, 34.0, T, dtype=np.float32)
    batched["y_m"][1] = np.linspace(0.0, -21.0, T, dtype=np.float32)

    st_x, outs_x = replay_mapping_batched(batched, UL_PROFILE)
    st_r, outs_r = pallas_replay_resident(batched, UL_PROFILE, interpret=True)

    rc = np.asarray(outs_x["kf_flags"]).nonzero()
    print("recenter events (quad, t):", list(zip(*rc))[:6])
    np.testing.assert_array_equal(np.asarray(st_r.grid),
                                  np.asarray(st_x.grid))
    np.testing.assert_array_equal(np.asarray(st_r.origin_x),
                                  np.asarray(st_x.origin_x))
    np.testing.assert_array_equal(np.asarray(st_r.inited),
                                  np.asarray(st_x.inited))
    np.testing.assert_array_equal(np.asarray(st_r.filt),
                                  np.asarray(st_x.filt))
    for k in outs_x:
        np.testing.assert_array_equal(np.asarray(outs_r[k]),
                                      np.asarray(outs_x[k]), err_msg=k)
    nz = int((np.asarray(st_r.grid) != 0).sum())
    print("bit-exact vs XLA replay; nonzero cells:", nz)


if __name__ == "__main__":
    main()
