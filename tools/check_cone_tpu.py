"""Resident cone kernel on real TPU: exactness vs XLA cone, throughput."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from micro_quad_slam_tpu.replay.mapping import replay_mapping_batched
from micro_quad_slam_tpu.utils.config import UL_PROFILE
from check_resident_tpu import make_frames, sync

def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    fr = make_frames(8, 64)
    frd = {k: jnp.asarray(v) for k, v in fr.items()}
    t0 = time.time()
    st_c, outs_c = replay_mapping_batched(frd, UL_PROFILE, kernel="cone")
    gc = np.asarray(st_c.grid)
    print(f"xla cone done {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    st_r, _ = replay_mapping_batched(frd, UL_PROFILE, kernel="resident_cone")
    gr = np.asarray(st_r.grid)
    print(f"resident cone done {time.time()-t0:.1f}s", flush=True)
    eq = np.array_equal(gr, gc)
    print("cone grids bit-equal on TPU:", eq,
          "recenters:", int((np.asarray(outs_c["kf_flags"]) != 0).sum()),
          flush=True)
    if not eq:
        bad = np.argwhere(gr != gc)
        print("mismatches:", bad.shape[0], "first:", bad[:5])
        i, r, c = bad[0]; print("got", gr[i,r,c], "want", gc[i,r,c])
        return
    for B, T in ((1024, 128),):
        fr = make_frames(B, T)
        frd = {k: jax.device_put(jnp.asarray(v)) for k, v in fr.items()}
        sync(frd["x_m"])
        run = lambda: replay_mapping_batched(frd, UL_PROFILE,
                                             kernel="resident_cone")
        st, _ = run(); sync(st.grid)
        best = 1e9
        for _ in range(3):
            t0 = time.time(); st, _ = run(); sync(st.grid)
            best = min(best, time.time() - t0)
        print(f"B={B} T={T} best={best*1e3:.1f} ms "
              f"fps={B*T/best/1e3:.1f}K", flush=True)

if __name__ == "__main__":
    main()
