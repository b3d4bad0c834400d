"""EKF fusion replay timing on real TPU (the PERFORMANCE.md fusion
number: B=1024 x T=256 through the full-pose filter)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.replay.fusion import _ekf_replay_batched
from micro_quad_slam_tpu.replay.fusion import fusion_arrays
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.utils.config import UL_PROFILE


def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32).ravel()[:4]))


def main():
    B, T = 1024, 256
    logs = [synth_room_scanlog(n_frames=T, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(4)]
    fr = [fusion_arrays(lg) for lg in logs]
    b = {k: np.concatenate([np.stack([f[k] for f in fr])] * 256)[:B]
         for k in fr[0]}
    bd = {k: jax.device_put(jnp.asarray(v), jax.devices()[0])
          for k, v in b.items()}
    sync(bd["of_rate_x"])

    fn = jax.jit(lambda f: _ekf_replay_batched(f, UL_PROFILE)[1]["x"])
    t0 = time.time()
    out = fn(bd)
    sync(out)
    print(f"compile+first: {time.time()-t0:.1f} s", flush=True)
    tiny = jax.jit(lambda f: f["of_rate_x"][0, :2])
    floor = 1e9
    for _ in range(3):
        t0 = time.time()
        sync(tiny(bd))
        floor = min(floor, time.time() - t0)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(bd)
        sync(out)
        best = min(best, time.time() - t0)
    net = best - floor
    print(f"floor {floor*1e3:.1f} ms; e2e {best*1e3:.1f} ms; "
          f"net {net*1e3:.1f} ms = {B*T/net/1e6:.2f} M frames/s", flush=True)


if __name__ == "__main__":
    main()
