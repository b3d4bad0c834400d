"""Resident kernel on real TPU: exactness vs XLA replay, then throughput."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.ops.pallas_resident import pallas_replay_resident
from micro_quad_slam_tpu.replay.mapping import (
    replay_mapping_batched, scanlog_to_arrays)
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.utils.config import UL_PROFILE


def make_frames(B, T, seed0=0):
    base = []
    nbase = min(B, 8)
    for s in range(nbase):
        lg = synth_room_scanlog(n_frames=T, seed=seed0 + s, path="circle",
                                path_radius_m=1.0 + 0.2 * s, noise_mm=5.0,
                                dropout_p=0.03)
        base.append(scanlog_to_arrays(lg))
    reps = -(-B // nbase)
    out = {k: np.concatenate([np.stack([f[k] for f in base])] * reps)[:B]
           for k in base[0]}
    # one strongly drifting quad to exercise recentering
    out["x_m"][0] = np.linspace(0.0, 34.0, T, dtype=np.float32)
    out["y_m"][0] = np.linspace(0.0, -21.0, T, dtype=np.float32)
    return out


def sync(x):
    return float(jnp.sum(x.astype(jnp.int32)))


def main():
    print("backend:", jax.devices()[0].platform, flush=True)

    # --- exactness on hardware ---------------------------------------
    fr = make_frames(8, 64)
    frd = {k: jnp.asarray(v) for k, v in fr.items()}
    t0 = time.time()
    st_x, outs_x = replay_mapping_batched(frd, UL_PROFILE)
    gx = np.asarray(st_x.grid)
    print(f"xla replay done {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    st_r, outs_r = pallas_replay_resident(frd, UL_PROFILE)
    gr = np.asarray(st_r.grid)
    print(f"resident replay done (compile) {time.time()-t0:.1f}s", flush=True)
    eq = np.array_equal(gr, gx)
    print("grids bit-equal on TPU:", eq, flush=True)
    if not eq:
        bad = np.argwhere(gr != gx)
        print("mismatches:", bad.shape[0], "first:", bad[:5])
        b, r, c = bad[0]
        print("got", gr[b, r, c], "want", gx[b, r, c])
        return
    np.testing.assert_array_equal(np.asarray(outs_r["used"]),
                                  np.asarray(outs_x["used"]))
    print("recenters:", int((np.asarray(outs_x["kf_flags"]) != 0).sum()),
          flush=True)

    # --- throughput ---------------------------------------------------
    for B, T in ((256, 128), (1024, 128)):
        fr = make_frames(B, T)
        frd = {k: jax.device_put(jnp.asarray(v)) for k, v in fr.items()}
        sync(frd["x_m"])
        run = lambda: pallas_replay_resident(frd, UL_PROFILE)
        st, _ = run()
        sync(st.grid)  # compile+warm
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            st, _ = run()
            sync(st.grid)
            best = min(best, time.time() - t0)
        fps = B * T / best
        print(f"B={B} T={T} best={best*1e3:.1f} ms "
              f"fps={fps/1e3:.1f}K", flush=True)


if __name__ == "__main__":
    main()
