"""Pass-1 (feedback-free) internals split on real TPU: the ONE
pallas_map_snap launch vs the flat match batch, per match_iters
iteration.  Stage costs difference out the ~27 ms axon round-trip."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from micro_quad_slam_tpu.ops.beams import extract_beams
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM as GEOM
from micro_quad_slam_tpu.ops.raycast import world_to_cell
from micro_quad_slam_tpu.ops.pallas_residentx import (
    _snap_align, pallas_map_snap)
from micro_quad_slam_tpu.ops.scanmatch import match_window, window_origin
from micro_quad_slam_tpu.replay.fusion import fusion_arrays
from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.slam.pipeline import (
    _compose_kf_sched, _map_pass_nofb, _odo_and_schedule,
    _pad_chunk_inputs)
from micro_quad_slam_tpu.utils.config import UL_PROFILE


def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32).ravel()[:4]))


def bestof(f, reps=3):
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
    import sys
    cfg = UL_PROFILE
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    logs = [synth_room_scanlog(n_frames=T, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(4)]
    fr = [{**scanlog_to_arrays(lg), **fusion_arrays(lg)} for lg in logs]
    b = {k: np.concatenate([np.stack([f[k] for f in fr])] * (-(-B // 4)))[:B]
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

    kf_every = cfg.slam.kf_every
    s = cfg.slam
    n_iv = max(int(s.match_chunk_intervals), 1)
    C = kf_every * n_iv
    nc = -(-T // C)
    beams_p, poses_p, sch = _pad_chunk_inputs(beams, odo, sched, B, T, C,
                                              nc)
    n_kf = C // kf_every
    comp, tail = _compose_kf_sched(sch, B, nc, kf_every, n_kf)
    ksel = lambda a: a[:, ::kf_every]
    kf_beams = ksel(beams_p)
    kf_ox, kf_oy = ksel(sch["ox"]), ksel(sch["oy"])
    sox = jnp.repeat(kf_ox[:, ::n_kf], n_kf, axis=1)
    soy = jnp.repeat(kf_oy[:, ::n_kf], n_kf, axis=1)
    kf_pose = ksel(poses_p)
    kf_x, kf_y = kf_pose[..., 0], kf_pose[..., 1]
    kf_yaw = jnp.rad2deg(kf_pose[..., 2])
    print(f"nc={nc} n_kf={n_kf} K_p={nc*n_kf}", flush=True)

    @jax.jit
    def kern(kf_x, kf_y, kf_yaw):
        pcx, pcy = world_to_cell(kf_x, kf_y, sox, soy, cfg.map.res_m,
                                 cfg.map.width // 2, cfg.map.height // 2)
        wy0, wx0 = window_origin(pcx, pcy, GEOM)
        grids0 = jnp.zeros((B, GEOM.prows, GEOM.pcols), jnp.int8)
        return pallas_map_snap(grids0, kf_beams, kf_x, kf_y, kf_yaw,
                               kf_ox, kf_oy, comp["do"], comp["rsy"],
                               comp["rsx"], wy0, wx0, n_kf, cfg, GEOM)

    t = bestof(lambda: kern(kf_x, kf_y, kf_yaw))
    print(f"pallas_map_snap launch: {(t-floor)*1e3:7.1f} ms", flush=True)
    _, snaps = kern(kf_x, kf_y, kf_yaw)
    sync(snaps)

    @jax.jit
    def match(snaps, kf_x, kf_y, kf_yaw):
        pcx, pcy = world_to_cell(kf_x, kf_y, sox, soy, cfg.map.res_m,
                                 cfg.map.width // 2, cfg.map.height // 2)
        wy0, wx0 = window_origin(pcx, pcy, GEOM)
        r0s, c0s = _snap_align(wy0, wx0, GEOM)
        res = jax.vmap(jax.vmap(
            lambda w, y0, x0, bm, xx, yy, ww, ssx, ssy: match_window(
                w, y0, x0, bm, xx, yy, ww, ssx, ssy, cfg.map, cfg.tof,
                GEOM, s.match_n_xy, s.match_n_yaw, s.match_xy_step_m,
                s.match_yaw_step_deg)
        ))(snaps, r0s, c0s, kf_beams, kf_x, kf_y, kf_yaw, sox, soy)
        return res.x, res.y, res.yaw_deg, res.quality

    t = bestof(lambda: match(snaps, kf_x, kf_y, kf_yaw))
    print(f"flat match batch (XLA): {(t-floor)*1e3:7.1f} ms", flush=True)

    from micro_quad_slam_tpu.ops.scanmatch import match_slabs

    @jax.jit
    def match_k(snaps, kf_x, kf_y, kf_yaw):
        pcx, pcy = world_to_cell(kf_x, kf_y, sox, soy, cfg.map.res_m,
                                 cfg.map.width // 2, cfg.map.height // 2)
        wy0, wx0 = window_origin(pcx, pcy, GEOM)
        r0s, c0s = _snap_align(wy0, wx0, GEOM)
        K_p = nc * n_kf
        fl = lambda a: a.reshape((B * K_p,) + a.shape[2:])
        res = match_slabs(fl(snaps), fl(r0s), fl(c0s), fl(kf_beams),
                          fl(kf_x), fl(kf_y), fl(kf_yaw), fl(sox),
                          fl(soy), cfg.map, cfg.tof, GEOM, s.match_n_xy,
                          s.match_n_yaw, s.match_xy_step_m,
                          s.match_yaw_step_deg)
        return res.x, res.y, res.yaw_deg, res.quality

    t = bestof(lambda: match_k(snaps, kf_x, kf_y, kf_yaw))
    print(f"flat match batch (krn): {(t-floor)*1e3:7.1f} ms", flush=True)

    full = jax.jit(lambda bm, p, sc: _map_pass_nofb(
        bm, p, cfg, GEOM, kf_every, sc))
    t = bestof(lambda: full(beams, odo, sched))
    print(f"full _map_pass_nofb:    {(t-floor)*1e3:7.1f} ms "
          f"(match_iters={s.match_iters})", flush=True)


if __name__ == "__main__":
    main()
