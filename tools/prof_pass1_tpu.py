"""Pass-1 internals ablation on real TPU: match vs pack vs kernel cost.
Stage costs difference out the ~28 ms axon round-trip floor."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from micro_quad_slam_tpu.ops.beams import extract_beams
from micro_quad_slam_tpu.ops.pallas_residentx import (
    _pack_words_x, _residentx_call, pad_frames_to_group)
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM as GEOM
from micro_quad_slam_tpu.replay.fusion import fusion_arrays
from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.slam.pipeline import _match_kf, _odo_and_schedule
from micro_quad_slam_tpu.utils.config import UL_PROFILE


def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32).ravel()[:4]))


def bestof(f, reps=2):
    out = f()
    sync(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = f()
        sync(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    cfg = UL_PROFILE
    B, T, C = 128, 256, 10
    logs = [synth_room_scanlog(n_frames=T, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(4)]
    fr = [{**scanlog_to_arrays(lg), **fusion_arrays(lg)} for lg in logs]
    b = {k: np.concatenate([np.stack([f[k] for f in fr])] * 32)[:B]
         for k in fr[0]}
    bd = {k: jax.device_put(jnp.asarray(v), jax.devices()[0])
          for k, v in b.items()}
    sync(bd["x_m"])

    prep = jax.jit(lambda f: (extract_beams(f["grid_mm"], cfg.tof)[0],)
                   + _odo_and_schedule(f, cfg))
    beams, odo, sched = prep(bd)
    sync(beams)
    tiny = jax.jit(lambda o: o[0, :2, 0])
    floor = bestof(lambda: tiny(odo))
    print(f"floor: {floor*1e3:.1f} ms", flush=True)

    nc = -(-T // C)
    padn = nc * C - T
    pad_t = lambda a, v: jnp.pad(a, ((0, 0), (0, padn)) + ((0, 0),) *
                                 (a.ndim - 2), constant_values=v)
    beams_p = pad_t(beams, np.nan)
    poses_p = pad_t(odo, 0.0)
    sch = {k: pad_t(v, 0) for k, v in sched.items()}
    chunked = lambda a: jnp.moveaxis(
        a.reshape((B, nc, C) + a.shape[2:]), 0, 1)
    seq = {"beams": chunked(beams_p), "pose": chunked(poses_p),
           **{k: chunked(v) for k, v in sch.items()}}

    def variant(do_match, do_pack, do_kernel):
        def body(grids, inp):
            x = inp["pose"][:, 0, 0]
            y = inp["pose"][:, 0, 1]
            yaw_deg = jnp.rad2deg(inp["pose"][:, 0, 2])
            if do_match:
                x, y, yaw_deg = _match_kf(grids, inp["beams"][:, 0], x, y,
                                          yaw_deg, inp["ox"][:, 0],
                                          inp["oy"][:, 0], cfg, GEOM)
            cx_ = jnp.concatenate([x[:, None], inp["pose"][:, 1:, 0]], 1)
            cy_ = jnp.concatenate([y[:, None], inp["pose"][:, 1:, 1]], 1)
            cyaw = jnp.concatenate(
                [yaw_deg[:, None], jnp.rad2deg(inp["pose"][:, 1:, 2])], 1)
            if do_pack:
                sh = lambda a: jnp.moveaxis(a, 0, 1)
                en = jnp.ones((C, B), bool)
                args = [sh(inp["beams"]), sh(cx_), sh(cy_), sh(cyaw),
                        sh(inp["ox"]), sh(inp["oy"]), en,
                        sh(inp["do"]) != 0, sh(inp["rsy"]), sh(inp["rsx"])]
                args, _ = pad_frames_to_group(args, C)
                aux, words = _pack_words_x(*args, cfg.map, cfg.tof, GEOM)
                if do_kernel:
                    grids = _residentx_call(aux, words, grids, cfg.map,
                                            GEOM, False)
                else:
                    grids = grids + (aux[0, 0, 0, 0] % 2).astype(jnp.int8) \
                        * jnp.int8(0)
            return grids, cx_

        @jax.jit
        def run():
            g0 = jnp.zeros((B, GEOM.prows, GEOM.pcols), jnp.int8)
            g, xs = lax.scan(body, g0, seq)
            return g
        return run

    for name, dm, dp, dk in (("match_only", True, False, False),
                             ("pack_only", False, True, False),
                             ("pack+kernel", False, True, True),
                             ("full", True, True, True)):
        t = bestof(variant(dm, dp, dk))
        print(f"{name:12s}: {(t-floor)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
