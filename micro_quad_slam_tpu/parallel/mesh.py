"""Mesh / sharding layer: scale-out over flight logs.

The reference's "distribution" is four heterogeneous processors on
point-to-point UARTs (SURVEY.md §2F); those links are replayed from logs,
not re-implemented.  The rebuild's parallelism is the TPU-native
equivalent: pure data parallelism over independent replays (one virtual
quad per batch lane), sharded over a 1-D `('logs',)` device mesh with
`NamedSharding` — XLA inserts the collectives (all-reduce over ICI) only
for the aggregate metrics.  No TP/PP analog exists or is needed: each
replay's state (pose, 400 KB padded grid, filters) is tiny and strictly
sequential in time; throughput comes from batching, exactly like the
driver's north-star configs (BASELINE.md: 256-4096 logs per chip).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM, GridGeom
from micro_quad_slam_tpu.replay.mapping import _replay_batched
from micro_quad_slam_tpu.utils.config import PipelineConfig, UL_PROFILE

LOGS_AXIS = "logs"


def make_mesh(n_devices: Optional[int] = None, axis: str = LOGS_AXIS) -> Mesh:
    """1-D device mesh over the logs (data-parallel) axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(frames: dict, mesh: Mesh, axis: str = LOGS_AXIS) -> dict:
    """Place a [B, T, ...] frame batch with B sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(np.asarray(v), sharding) for k, v in frames.items()}


def batch_metrics(outs: dict) -> dict:
    """Aggregate per-frame outputs to global scalars.  Under a sharded jit
    these sums lower to XLA all-reduces across the mesh."""
    used = outs["used"]
    return {
        "frames_total": jnp.int32(used.size),
        "frames_used": used.sum().astype(jnp.int32),
        "recenters": (outs["kf_flags"] != 0).sum().astype(jnp.int32),
    }


@partial(jax.jit, static_argnums=(1, 2, 3))
def _replay_batched_with_metrics(frames, cfg: PipelineConfig, geom: GridGeom,
                                 kernel: str = "xla"):
    state, outs = _replay_batched(frames, cfg, geom, kernel)
    return state, outs, batch_metrics(outs)


def replay_mapping_sharded(
    frames: dict,
    cfg: PipelineConfig = UL_PROFILE,
    mesh: Optional[Mesh] = None,
    geom: GridGeom = DEFAULT_GEOM,
    kernel: str = "xla",
):
    """Batched replay with the batch sharded across the device mesh.

    frames: dict of [B, T, ...] arrays (host or device).  B should be a
    multiple of the mesh size.  Returns (MappingState [B,...], outs,
    metrics) with per-flight grids left device-sharded and metrics
    all-reduced to replicated scalars.

    The XLA kernels partition under plain GSPMD; the pallas "resident"
    kernel is explicitly `shard_map`ped so each device runs the kernel
    over its local batch shard.
    """
    mesh = mesh or make_mesh()
    frames = shard_batch(frames, mesh)
    if not kernel.startswith("resident"):
        return _replay_batched_with_metrics(frames, cfg, geom, kernel)

    spec = P(LOGS_AXIS)
    inner = jax.shard_map(
        partial(_replay_batched, cfg=cfg, geom=geom, kernel=kernel),
        mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False)  # pallas out_shape carries no vma type

    @jax.jit
    def run(fr):
        state, outs = inner(fr)
        return state, outs, batch_metrics(outs)

    return run(frames)
