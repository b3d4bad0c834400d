"""All on-TPU kernel parity checks in one run -> TPUCHECK_r{N}.json.

Closes the interpret-vs-Mosaic gap (the CI suite runs Pallas in interpret
mode on CPU; this executes every production kernel on REAL hardware and
bit-compares against the XLA reference paths, which are themselves
bit-matched against the golden C model by the test suite).

Run from the repo root:  python tools/check_all_tpu.py
Writes TPUCHECK_r{N}.json (N from $MQS_ROUND, default 0) and exits
nonzero on any mismatch.
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_resident_tpu import make_frames  # noqa: E402

from micro_quad_slam_tpu.ops.pallas_resident import (  # noqa: E402
    pallas_map_track, pallas_replay_resident)
from micro_quad_slam_tpu.ops.pallas_residentx import (  # noqa: E402
    pallas_map_track_x, pallas_replay_residentx)
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM  # noqa: E402
from micro_quad_slam_tpu.replay.mapping import (  # noqa: E402
    replay_mapping_batched)
from micro_quad_slam_tpu.utils.config import UL_PROFILE  # noqa: E402


def _eq(a, b):
    a, b = np.asarray(a), np.asarray(b)
    if np.issubdtype(a.dtype, np.floating):
        return bool(np.array_equal(a, b, equal_nan=True))
    return bool(np.array_equal(a, b))


def main() -> int:
    results = {"backend": jax.devices()[0].platform,
               "device": str(jax.devices()[0])}
    ok_all = True

    def record(name, ok, extra=""):
        nonlocal ok_all
        ok_all &= ok
        results[name] = bool(ok)
        print(f"{name}: {'PASS' if ok else 'FAIL'} {extra}", flush=True)

    fr = make_frames(8, 64)
    frd = {k: jnp.asarray(v) for k, v in fr.items()}

    t0 = time.time()
    st_x, outs_x = replay_mapping_batched(frd, UL_PROFILE)
    print(f"xla replay {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    st_r, outs_r = pallas_replay_resident(frd, UL_PROFILE)
    record("resident_vs_xla",
           _eq(st_r.grid, st_x.grid) and _eq(st_r.origin_x, st_x.origin_x)
           and _eq(outs_r["used"], outs_x["used"]),
           f"({time.time()-t0:.1f}s, "
           f"recenters={int((np.asarray(outs_x['kf_flags']) != 0).sum())})")

    t0 = time.time()
    st_v, outs_v = pallas_replay_residentx(frd, UL_PROFILE)
    record("residentx_vs_xla",
           _eq(st_v.grid, st_x.grid) and _eq(st_v.origin_x, st_x.origin_x)
           and _eq(st_v.origin_y, st_x.origin_y)
           and _eq(st_v.filt, st_x.filt)
           and all(_eq(outs_v[k], outs_x[k]) for k in outs_x),
           f"({time.time()-t0:.1f}s)")

    # checkpoint-resume: split replay must equal the unbroken one
    half = {k: v[:, :32] for k, v in frd.items()}
    rest = {k: v[:, 32:] for k, v in frd.items()}
    st_h, _ = pallas_replay_residentx(half, UL_PROFILE)
    st_f, _ = pallas_replay_residentx(rest, UL_PROFILE, state0=st_h)
    record("residentx_resume", _eq(st_f.grid, st_x.grid))

    t0 = time.time()
    st_c, outs_c = replay_mapping_batched(frd, UL_PROFILE, kernel="cone")
    st_rc, _ = replay_mapping_batched(frd, UL_PROFILE,
                                      kernel="resident_cone")
    record("resident_cone_vs_xla_cone", _eq(st_rc.grid, st_c.grid),
           f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    st_cx, _ = replay_mapping_batched(frd, UL_PROFILE, kernel="conex")
    record("conex_vs_xla_cone", _eq(st_cx.grid, st_c.grid),
           f"({time.time()-t0:.1f}s)")

    # hybrid production mode: grouped kernel vs the XLA hybrid path
    t0 = time.time()
    st_hy, _ = replay_mapping_batched(frd, UL_PROFILE, kernel="hybrid")
    st_hx, _ = replay_mapping_batched(frd, UL_PROFILE, kernel="hybridx")
    record("hybridx_vs_xla_hybrid", _eq(st_hx.grid, st_hy.grid),
           f"({time.time()-t0:.1f}s)")

    # map-track twins (the SLAM re-raster path)
    rng = np.random.default_rng(5)
    B, T = 4, 64
    beams = rng.uniform(0.1, 4.0, (B, T, 4, 8)).astype(np.float32)
    beams[rng.random(beams.shape) < 0.05] = np.nan
    x = rng.uniform(-1.5, 1.5, (B, T)).astype(np.float32)
    y = rng.uniform(-1.5, 1.5, (B, T)).astype(np.float32)
    yaw = rng.uniform(-180, 180, (B, T)).astype(np.float32)
    ox = np.zeros(B, np.float32)
    oy = np.zeros(B, np.float32)
    args = tuple(jnp.asarray(v) for v in (beams, x, y, yaw, ox, oy))
    g1 = pallas_map_track(*args, UL_PROFILE)
    g2 = pallas_map_track_x(*args, UL_PROFILE)
    record("map_track_x_vs_map_track", _eq(g1, g2))

    # SLAM chunked pass 1 (the TPU-only production path) vs the
    # sequential scan — run on the backend that actually executes it
    # (round-2 advisor finding).  Drifted circle poses fire real
    # matches; an injected flow excursion triggers two recenters so the
    # per-interval recenter plumbing is exercised through both paths.
    from micro_quad_slam_tpu.ops.beams import extract_beams
    from micro_quad_slam_tpu.replay.fusion import fusion_arrays
    from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.slam.pipeline import (
        _ekf_track, _map_pass, _map_pass_chunked, _origin_schedule)

    logs = [synth_room_scanlog(n_frames=64, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(2)]
    frs = [{**scanlog_to_arrays(lg), **fusion_arrays(lg)} for lg in logs]
    b4 = {k: np.stack([f[k] for f in frs] * 2) for k in frs[0]}
    b4["of_rate_x"][3] = b4["of_rate_x"][3] + np.float32(-20.0)
    bj = {k: jnp.asarray(v) for k, v in b4.items()}
    kf_every = UL_PROFILE.slam.kf_every
    beams2, _ = extract_beams(bj["grid_mm"], UL_PROFILE.tof)
    odo = _ekf_track(bj, UL_PROFILE)
    sched = _origin_schedule(odo, UL_PROFILE)
    kf_mask = (jnp.arange(64) % kf_every) == 0
    n_iv = UL_PROFILE.slam.match_chunk_intervals
    snap_mask = (jnp.arange(64) % (kf_every * n_iv)) == 0
    t0 = time.time()
    upd_mask = kf_mask if UL_PROFILE.slam.match_map_kf_only else None
    g_seq, m_seq = jax.jit(
        lambda bm, p: _map_pass(bm, p, UL_PROFILE, DEFAULT_GEOM, True,
                                kf_mask, sched, snap_mask_t=snap_mask,
                                update_mask_t=upd_mask))(beams2, odo)
    g_chk, m_chk = jax.jit(
        lambda bm, p: _map_pass_chunked(bm, p, UL_PROFILE, DEFAULT_GEOM,
                                        kf_every, sched))(beams2, odo)
    record("slam_chunked_vs_sequential",
           _eq(g_chk, g_seq) and _eq(m_chk, m_seq),
           f"({time.time()-t0:.1f}s, "
           f"recenters={int(np.asarray(sched['do']).sum())})")

    # feedback-free pass 1 (the pipeline default since round 3): the
    # resident-kernel snapshot scan vs the XLA window updates, on the
    # hardware that runs the kernel path
    from micro_quad_slam_tpu.slam.pipeline import _map_pass_nofb
    t0 = time.time()
    g_nk, m_nk = jax.jit(lambda bm, p: _map_pass_nofb(
        bm, p, UL_PROFILE, DEFAULT_GEOM, kf_every, sched,
        use_kernel=True))(beams2, odo)
    g_nx, m_nx = jax.jit(lambda bm, p: _map_pass_nofb(
        bm, p, UL_PROFILE, DEFAULT_GEOM, kf_every, sched,
        use_kernel=False))(beams2, odo)
    record("slam_nofb_kernel_vs_xla",
           _eq(g_nk, g_nx) and _eq(m_nk, m_nx),
           f"({time.time()-t0:.1f}s)")

    # --- round-4 kernels (VERDICT round 4, missing 2): every pallas_call
    # entry point gets an on-chip line.  map_step's round-4 break was
    # Mosaic-lowering-ONLY (interpret mode passed) — this block is the
    # only guard for that class.
    from micro_quad_slam_tpu.ops.raycast import apply_scan_to_grid
    from micro_quad_slam_tpu.ops.pallas_residentx import (
        _snap_align, pallas_map_snap, pallas_map_step)

    rng = np.random.default_rng(3)
    Bs = 8
    g0 = jnp.asarray(rng.integers(-80, 81, (Bs, DEFAULT_GEOM.prows,
                                            DEFAULT_GEOM.pcols)), jnp.int8)
    bm = rng.uniform(0.1, 4.2, (Bs, 4, 8)).astype(np.float32)
    bm[rng.random((Bs, 4, 8)) < 0.15] = np.nan
    xs = rng.uniform(-20, 20, Bs).astype(np.float32)
    ys = rng.uniform(-20, 20, Bs).astype(np.float32)
    xs[-2:] = rng.uniform(24.0, 26.0, 2)
    yw = rng.uniform(-180, 180, Bs).astype(np.float32)
    zb = np.zeros(Bs, np.float32)
    en = np.ones(Bs, bool)
    en[3] = False
    a = (g0, jnp.asarray(bm), jnp.asarray(xs), jnp.asarray(ys),
         jnp.asarray(yw), jnp.asarray(zb), jnp.asarray(zb),
         jnp.asarray(en))
    t0 = time.time()
    want = jax.jit(jax.vmap(
        lambda g, b, xi, yi, wi, oxi, oyi, e: apply_scan_to_grid(
            g, b, xi, yi, wi, oxi, oyi, e, UL_PROFILE.map,
            UL_PROFILE.tof, DEFAULT_GEOM)))(*a)
    got = jax.jit(lambda *v: pallas_map_step(*v, UL_PROFILE,
                                             DEFAULT_GEOM))(*a)
    record("map_step_vs_xla", _eq(got, want), f"({time.time()-t0:.1f}s)")

    # map_snap: grids + per-slot snapshots vs the XLA chunk-sched path
    # + hand-sliced snapshot windows
    from micro_quad_slam_tpu.ops.raycast import world_to_cell
    from micro_quad_slam_tpu.ops.scanmatch import window_origin
    Bk, K, n_kf = 2, 8, 4
    bmk = rng.uniform(0.1, 4.0, (Bk, K, 4, 8)).astype(np.float32)
    xk = rng.uniform(-2, 2, (Bk, K)).astype(np.float32)
    yk = rng.uniform(-2, 2, (Bk, K)).astype(np.float32)
    yk2 = rng.uniform(-180, 180, (Bk, K)).astype(np.float32)
    oxk = np.zeros((Bk, K), np.float32)
    zk = np.zeros((Bk, K), np.int32)
    gk0 = jnp.asarray(rng.integers(-40, 41,
                                   (Bk, DEFAULT_GEOM.prows,
                                    DEFAULT_GEOM.pcols)), jnp.int8)
    pcx, pcy = world_to_cell(jnp.asarray(xk), jnp.asarray(yk),
                             jnp.asarray(oxk), jnp.asarray(oxk),
                             UL_PROFILE.map.res_m,
                             UL_PROFILE.map.width // 2,
                             UL_PROFILE.map.height // 2)
    wy0, wx0 = window_origin(pcx, pcy, DEFAULT_GEOM)
    t0 = time.time()
    gsn, snaps = pallas_map_snap(
        gk0, jnp.asarray(bmk), jnp.asarray(xk), jnp.asarray(yk),
        jnp.asarray(yk2), jnp.asarray(oxk), jnp.asarray(oxk),
        jnp.asarray(zk), jnp.asarray(zk), jnp.asarray(zk), wy0, wx0,
        n_kf, UL_PROFILE, DEFAULT_GEOM)
    # XLA twin: sequential per-slot updates; snapshots = chunk-start grid
    r0s, c0s = _snap_align(wy0, wx0, DEFAULT_GEOM)
    sr, sc = snaps.shape[2], snaps.shape[3]
    gx = gk0
    snaps_x = np.zeros_like(np.asarray(snaps))
    upd = jax.jit(jax.vmap(
        lambda g, b, xi, yi, wi, oxi, oyi: apply_scan_to_grid(
            g, b, xi, yi, wi, oxi, oyi, True, UL_PROFILE.map,
            UL_PROFILE.tof, DEFAULT_GEOM)))
    for s in range(K):
        if s % n_kf == 0:
            chunk_start = np.asarray(gx)
        for b in range(Bk):
            snaps_x[b, s] = chunk_start[
                b, int(r0s[b, s]):int(r0s[b, s]) + sr,
                int(c0s[b, s]):int(c0s[b, s]) + sc]
        gx = upd(gx, jnp.asarray(bmk[:, s]), jnp.asarray(xk[:, s]),
                 jnp.asarray(yk[:, s]), jnp.asarray(yk2[:, s]),
                 jnp.asarray(oxk[:, s]), jnp.asarray(oxk[:, s]))
    record("map_snap_vs_xla",
           _eq(gsn, gx) and _eq(snaps, snaps_x),
           f"({time.time()-t0:.1f}s)")

    # lattice matcher: pallas one-hot-matmul scorer vs the XLA
    # match_window path over the same slabs
    from micro_quad_slam_tpu.ops.scanmatch import match_slabs, match_window
    t0 = time.time()
    N = 24
    padded = rng.integers(-80, 81, (N, DEFAULT_GEOM.prows,
                                    DEFAULT_GEOM.pcols)).astype(np.int8)
    oxn = np.zeros(N, np.float32)
    xg = rng.uniform(-8, 8, N).astype(np.float32)
    xg[-6:] = rng.uniform(21.0, 24.5, 6).astype(np.float32)
    yg = rng.uniform(-8, 8, N).astype(np.float32)
    yawg = rng.uniform(-180, 180, N).astype(np.float32)
    bmn = rng.uniform(0.1, 4.0, (N, 4, 8)).astype(np.float32)
    bmn[rng.random((N, 4, 8)) < 0.1] = np.nan
    pcx, pcy = world_to_cell(jnp.asarray(xg), jnp.asarray(yg),
                             jnp.asarray(oxn), jnp.asarray(oxn),
                             UL_PROFILE.map.res_m,
                             UL_PROFILE.map.width // 2,
                             UL_PROFILE.map.height // 2)
    wy0n, wx0n = window_origin(pcx, pcy, DEFAULT_GEOM)
    r0n, c0n = _snap_align(wy0n, wx0n, DEFAULT_GEOM)
    srn = DEFAULT_GEOM.win_rows + 8
    scn = 2 * DEFAULT_GEOM.win_cols
    slabs = np.stack([padded[i, int(r0n[i]):int(r0n[i]) + srn,
                             int(c0n[i]):int(c0n[i]) + scn]
                      for i in range(N)])
    wins = np.stack([padded[i, int(wy0n[i]):int(wy0n[i]) + DEFAULT_GEOM.win_rows,
                            int(wx0n[i]):int(wx0n[i]) + DEFAULT_GEOM.win_cols]
                     for i in range(N)])
    want_m = jax.jit(jax.vmap(
        lambda w, y0, x0, b, xi, yi, wi, oxi, oyi: match_window(
            w, y0, x0, b, xi, yi, wi, oxi, oyi, UL_PROFILE.map,
            UL_PROFILE.tof, DEFAULT_GEOM)
    ))(jnp.asarray(wins), wy0n, wx0n, jnp.asarray(bmn), jnp.asarray(xg),
       jnp.asarray(yg), jnp.asarray(yawg), jnp.asarray(oxn),
       jnp.asarray(oxn))
    got_m = jax.jit(lambda *v: match_slabs(*v, UL_PROFILE.map,
                                           UL_PROFILE.tof, DEFAULT_GEOM))(
        jnp.asarray(slabs), r0n, c0n, jnp.asarray(bmn), jnp.asarray(xg),
        jnp.asarray(yg), jnp.asarray(yawg), jnp.asarray(oxn),
        jnp.asarray(oxn))
    record("match_lattice_vs_xla",
           all(_eq(a_, b_) for a_, b_ in zip(got_m, want_m)),
           f"({time.time()-t0:.1f}s)")

    rnd = os.environ.get("MQS_ROUND", "0")
    out = f"TPUCHECK_r{int(rnd):02d}.json"
    results["ok"] = bool(ok_all)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}: ok={ok_all}", flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
