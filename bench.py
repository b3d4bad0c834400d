"""Benchmark: fused sensor-frames/sec/chip on batched mapping replay.

Measures the framework's headline metric (BASELINE.md north star:
>= 1,000,000 fused frames/sec on one TPU v5e chip): B independent flight
replays, each frame doing beam extraction + gating + a fused map update.

By default prints SIX JSON lines {"metric", "value", "unit",
"vs_baseline", "checksum", ...}: first `residentx` — the BIT-EXACT
reference-semantics whole-replay kernel (the headline number;
ops/pallas_residentx.py, grids bit-match the golden C model) — then
`hybridx`, the PRODUCTION mode (dense free-space carve + the
reference's exact endpoint occupied semantics; occ-IoU 1.0/tol-0 vs the
exact path on the divergence suites, tests/test_conemode.py), then
SLAM at the accuracy defaults (B=128), SLAM at the UL_RT throughput
operating point (B=256), EKF fusion, and the closed-loop swarm
simulator (MQS_BENCH_FULL=0 restores the two-line mapping-only bench).
vs_baseline is the multiple of the reference pipeline's own fused-frame
rate (~10 frames/s on the companion SBC, BASELINE.md).
MQS_BENCH_KERNEL pins a single kernel (one line).

Env knobs: MQS_BENCH_B (batch, default 256), MQS_BENCH_T (frames/log,
default 256), MQS_BENCH_REPS (timed reps, default 3),
MQS_BENCH_MODE=replay|swarm (default replay; swarm = closed-loop
simulator, BASELINE config 5: quads x 1 kHz control ticks;
MQS_BENCH_VF=1 adds real rendered-camera LK vision flow in the loop),
MQS_BENCH_KERNEL=xla|pallas|cone (replay map-update kernel; cone is the
dense inverse-model production mode, not bit-exact).
"""

import json
import os
import sys
import time

import numpy as np


def sync_scalar(x) -> int:
    """Force completion through the axon tunnel (block_until_ready does not
    reliably block there): fetch a tiny on-device reduction."""
    import jax.numpy as jnp
    return int(np.asarray(jnp.sum(x.astype(jnp.int32))))


def bench_swarm(B: int, T: int, reps: int) -> None:
    import jax
    from micro_quad_slam_tpu.models.simulator import make_world, sim_init, sim_run
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    world = make_world(B, room=(-3.5, -3.5, 3.5, 3.5),
                       obstacles=[(1.5, -0.5, 2.5, 0.5)])
    # mid-mission start: armed + EXPLORE + mapper inited, so the 100 ms
    # scan ticks run REAL map updates through pallas_map_step from t=0
    # (a ground start spends the whole 1 s window in ARMING/TAKEOFF with
    # mapping disabled — the old bench measured an inert map path and
    # printed checksum=0)
    st0 = sim_init(B, jax.random.PRNGKey(0), spread_m=0.5, airborne=True)
    # 1 kHz control ticks; ToF scans every 100 ms as in the reference
    vf = os.environ.get("MQS_BENCH_VF", "0") == "1"
    run = lambda s: sim_run(s, world, T, UL_PROFILE, dt_ms=1,
                            scan_period_ms=100, vision_flow=vf)[0]
    st = run(st0)
    checksum = sync_scalar(st.mapper.grid)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        st = run(st0)
        checksum = sync_scalar(st.mapper.grid)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    tps = B * T / dt
    print(json.dumps({
        "metric": "swarm_control_ticks_per_sec_per_chip",
        "value": round(tps, 1),
        "unit": "quad-ticks/s",
        # north star: 1024 quads at 1 kHz = 1.024M quad-ticks/s
        "vs_baseline": round(tps / 1.024e6, 3),
        "checksum": checksum,
    }))
    print(f"# swarm B={B} T={T} best={dt*1e3:.1f} ms backend={jax.default_backend()} "
          f"checksum={checksum}", file=sys.stderr)


def bench_slam(B: int, T: int, reps: int, profile: str = "acc") -> None:
    """Full SLAM replay (odo -> pass1 match -> loop closure -> pose graph
    -> re-raster) frames/s — driver-visible so regressions in the SLAM
    stack show up in BENCH_r{N}.json (VERDICT round 3, weak 5).
    profile: "acc" = UL_PROFILE accuracy defaults; "rt" = UL_RT_PROFILE
    throughput operating point (single global round)."""
    from micro_quad_slam_tpu.slam.pipeline import slam_replay
    from micro_quad_slam_tpu.utils.config import UL_PROFILE, UL_RT_PROFILE

    prof = UL_RT_PROFILE if profile == "rt" else UL_PROFILE
    from micro_quad_slam_tpu.sim import slam_bench_frames
    bd = slam_bench_frames(B, T)
    sync_scalar(bd["x_m"])
    res = slam_replay(bd, prof)
    checksum = sync_scalar(res.grid)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = slam_replay(bd, prof)
        checksum = sync_scalar(res.grid)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(json.dumps({
        "metric": ("slam_frames_per_sec_per_chip" if profile == "acc"
                   else "slam_rt_frames_per_sec_per_chip"),
        "value": round(B * T / dt, 1),
        "unit": "frames/s",
        "vs_baseline": round(B * T / dt / 10.0, 1),  # ref fused rate
        "checksum": checksum,
    }))
    print(f"# slam[{profile}] B={B} T={T} best={dt*1e3:.1f} ms",
          file=sys.stderr)


def bench_ekf(B: int, T: int, reps: int) -> None:
    """EKF fusion replay frames/s (driver-visible; VERDICT r3 weak 5)."""
    import jax
    import jax.numpy as jnp
    from micro_quad_slam_tpu.replay.fusion import (_ekf_replay_batched,
                                                   fusion_arrays)
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    logs = [synth_room_scanlog(n_frames=T, seed=s, path="circle",
                               noise_mm=6.0, with_flow=True)
            for s in range(4)]
    fr = [fusion_arrays(lg) for lg in logs]
    b = {k: np.concatenate([np.stack([f[k] for f in fr])] * (B // 4 + 1))[:B]
         for k in fr[0]}
    bd = {k: jax.device_put(jnp.asarray(v)) for k, v in b.items()}
    sync_scalar(bd["of_rate_x"])
    fn = jax.jit(lambda f: _ekf_replay_batched(f, UL_PROFILE)[1]["x"])
    out = fn(bd)
    checksum = sync_scalar(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(bd)
        checksum = sync_scalar(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(json.dumps({
        "metric": "ekf_frames_per_sec_per_chip",
        "value": round(B * T / dt, 1),
        "unit": "frames/s",
        "vs_baseline": round(B * T / dt / 10.0, 1),
        "checksum": checksum,
    }))
    print(f"# ekf B={B} T={T} best={dt*1e3:.1f} ms", file=sys.stderr)


def main() -> None:
    mode = os.environ.get("MQS_BENCH_MODE", "replay")
    if mode == "swarm":
        bench_swarm(int(os.environ.get("MQS_BENCH_B", "1024")),
                    int(os.environ.get("MQS_BENCH_T", "1000")),
                    int(os.environ.get("MQS_BENCH_REPS", "2")))
        return
    if mode == "slam":
        bench_slam(int(os.environ.get("MQS_BENCH_B", "128")),
                   int(os.environ.get("MQS_BENCH_T", "256")),
                   int(os.environ.get("MQS_BENCH_REPS", "3")))
        return
    if mode == "ekf":
        bench_ekf(int(os.environ.get("MQS_BENCH_B", "1024")),
                  int(os.environ.get("MQS_BENCH_T", "256")),
                  int(os.environ.get("MQS_BENCH_REPS", "3")))
        return
    import jax

    from micro_quad_slam_tpu.parallel.mesh import (
        _replay_batched_with_metrics,
        make_mesh,
        shard_batch,
    )
    from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM
    from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
    from micro_quad_slam_tpu.sim import synth_room_scanlog
    from micro_quad_slam_tpu.utils.config import UL_PROFILE

    B = int(os.environ.get("MQS_BENCH_B", "1024"))
    T = int(os.environ.get("MQS_BENCH_T", "256"))
    reps = int(os.environ.get("MQS_BENCH_REPS", "3"))

    # one synthetic flight, replicated with per-flight pose jitter: the
    # throughput path is identical for any inputs (static shapes, no
    # data-dependent control flow), so generation cost stays off the bench.
    base = scanlog_to_arrays(
        synth_room_scanlog(n_frames=T, seed=0, path="hover",
                           yaw_rate_dps=20.0, noise_mm=5.0)
    )
    rng = np.random.default_rng(1)
    frames = {k: np.broadcast_to(v, (B,) + v.shape).copy() for k, v in base.items()}
    frames["x_m"] = frames["x_m"] + rng.normal(0, 0.3, (B, 1)).astype(np.float32)
    frames["y_m"] = frames["y_m"] + rng.normal(0, 0.3, (B, 1)).astype(np.float32)
    frames["yaw_deg"] = np.mod(
        frames["yaw_deg"] + rng.uniform(-180, 180, (B, 1)).astype(np.float32) + 180.0,
        360.0,
    ) - 180.0

    mesh = make_mesh()
    frames = shard_batch(frames, mesh)

    def sync(state):
        # block_until_ready does not reliably block through the axon TPU
        # tunnel; fetching a tiny on-device reduction forces completion.
        import jax.numpy as jnp
        return int(np.asarray(jnp.sum(state.grid.astype(jnp.int32))))

    def bench_kernel(kernel: str):
        if kernel != "xla":
            from micro_quad_slam_tpu.parallel.mesh import batch_metrics
            from micro_quad_slam_tpu.replay.mapping import replay_mapping_batched

            def run():
                state, outs = replay_mapping_batched(frames, UL_PROFILE,
                                                     DEFAULT_GEOM, kernel)
                return state, outs, batch_metrics(outs)
        else:
            run = lambda: _replay_batched_with_metrics(frames, UL_PROFILE,
                                                       DEFAULT_GEOM)
        # compile + warmup
        state, outs, metrics = run()
        checksum = sync(state)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state, outs, metrics = run()
            checksum = sync(state)
            times.append(time.perf_counter() - t0)
        return min(times), checksum, metrics

    ref_fps = 10.0  # reference fused-frame rate (BASELINE.md)
    # Default: bench BOTH the bit-exact flagship (residentx, the headline
    # first line) and the hybrid production path (hybridx) so the driver
    # record carries both numbers; MQS_BENCH_KERNEL pins one.
    pinned = os.environ.get("MQS_BENCH_KERNEL")
    kernels = [pinned] if pinned else ["residentx", "hybridx"]
    for kernel in kernels:
        dt, checksum, metrics = bench_kernel(kernel)
        fps = B * T / dt
        print(json.dumps({
            "metric": ("fused_sensor_frames_per_sec_per_chip" if kernel ==
                       kernels[0] else
                       f"fused_sensor_frames_per_sec_per_chip_{kernel}"),
            "value": round(fps, 1),
            "unit": "frames/s",
            "vs_baseline": round(fps / ref_fps, 1),
            "kernel": kernel,
            "exact": kernel not in ("cone", "resident_cone", "conex",
                                    "hybrid", "hybridx"),
            "checksum": checksum,
        }))
        print(
            f"# kernel={kernel} B={B} T={T} reps={reps} best={dt*1e3:.1f} ms "
            f"devices={len(jax.devices())} backend={jax.default_backend()} "
            f"frames_used={int(metrics['frames_used'])}/{int(metrics['frames_total'])} "
            f"grid_checksum={checksum}",
            file=sys.stderr,
        )

    # driver-visible subsystem lines (VERDICT round 3, weak 5): SLAM,
    # EKF fusion, and closed-loop swarm throughput regressions now show
    # in BENCH_r{N}.json instead of living only in PERFORMANCE.md prose.
    # MQS_BENCH_FULL=0 restores the two-line mapping-only bench.
    if os.environ.get("MQS_BENCH_FULL", "1") == "1" and not pinned:
        bench_slam(int(os.environ.get("MQS_BENCH_SLAM_B", "128")), T,
                   max(reps - 1, 1))
        bench_slam(int(os.environ.get("MQS_BENCH_SLAM_RT_B", "256")), T,
                   max(reps - 1, 1), profile="rt")
        bench_ekf(int(os.environ.get("MQS_BENCH_EKF_B", "1024")), T,
                  max(reps - 1, 1))
        bench_swarm(int(os.environ.get("MQS_BENCH_SWARM_B", "1024")),
                    int(os.environ.get("MQS_BENCH_SWARM_T", "1000")),
                    max(reps - 1, 1))


if __name__ == "__main__":
    main()
