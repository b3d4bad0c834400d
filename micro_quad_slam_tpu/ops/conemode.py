"""Dense inverse-sensor-model map update ("cone mode") — the
production-quality alternative to the bit-exact Bresenham mode.

The reference marks free space only along 32 one-cell-wide rays
(uav_local_nav.c:280-306), leaving unmarked wedges between rays that
widen with range.  Cone mode instead classifies EVERY window cell against
the scan: a cell is free if it lies inside a sensor's 63-degree fan
closer than that bearing's measured distance, occupied if it lies at the
measured distance of a hitting beam.  This is the standard occupancy-grid
inverse model — denser maps, faster convergence — and it is dramatically
cheaper on TPU: one vectorized pass over the window (a rotation, one
atan2, a 5-level binary gather of per-column distances, two compares)
instead of 32 per-ray passes.  ~30 full-window ops/frame vs ~290.

Updates are order-free by construction (each cell gets exactly one delta
per scan), so a plain saturating add is exact.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from micro_quad_slam_tpu.ops.raycast import (
    DEFAULT_GEOM,
    GridGeom,
    world_to_cell,
)
from micro_quad_slam_tpu.utils.config import MapConfig, TofConfig

_F32 = np.float32


@dataclass(frozen=True)
class ConeConfig:
    """Inverse-model parameters (log-odds deltas match the reference's
    per-ray constants so maps are comparable)."""

    free_dec: int = 1
    occ_inc: int = 6
    hit_band_m: float = 0.10      # occupied band around the return
    free_margin_m: float = 0.05   # stop free-marking this short of the hit


def cone_scan_update(
    padded_grid: jnp.ndarray,
    beams: jnp.ndarray,          # f32 [4, 8]
    x_m, y_m, yaw_deg,
    origin_x, origin_y,
    enabled,
    cfg: MapConfig = MapConfig(),
    tof: TofConfig = TofConfig(),
    geom: GridGeom = DEFAULT_GEOM,
    cone: ConeConfig = ConeConfig(),
) -> jnp.ndarray:
    """One dense scan update on the padded int8 grid (single quad)."""
    pcx, pcy = world_to_cell(x_m, y_m, origin_x, origin_y, cfg.res_m,
                             cfg.width // 2, cfg.height // 2)
    pose_in = (pcx >= 0) & (pcx < cfg.width) & (pcy >= 0) & (pcy < cfg.height)
    en = enabled & pose_in
    pcx = jnp.clip(pcx, 0, cfg.width - 1)
    pcy = jnp.clip(pcy, 0, cfg.height - 1)

    R = geom.win_r
    WR, WC = geom.win_rows, geom.win_cols
    r0 = pcy + geom.pad - R
    c0 = pcx + geom.pad - R
    win = lax.dynamic_slice(padded_grid, (r0, c0), (WR, WC))

    # cell center offsets from the pose, in meters (sub-cell pose offset
    # included so ranges are exact)
    res = _F32(cfg.res_m)
    fx = (x_m - origin_x) / res + _F32(cfg.width // 2)   # pose in cell units
    fy = (y_m - origin_y) / res + _F32(cfg.height // 2)
    rows = lax.broadcasted_iota(jnp.int32, (WR, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, WC), 1)
    gy = (rows + r0 - geom.pad).astype(jnp.float32)      # logical cell y
    gx = (cols + c0 - geom.pad).astype(jnp.float32)
    dy = (gy - fy) * res
    dx = (gx - fx) * res
    rng = jnp.sqrt(dx * dx + dy * dy)                    # [WR, WC]

    # bearing relative to the vehicle, 0..360 with 0 = FRONT fan start
    ang = jnp.degrees(jnp.arctan2(dy, dx)) - yaw_deg
    half = _F32(tof.half_fov_deg)
    ang = jnp.mod(ang + half, _F32(360.0))               # fan starts at 0
    dir_idx = (ang // _F32(90.0)).astype(jnp.int32)      # 0..3 = F,R,B,L
    in_dir = jnp.mod(ang, _F32(90.0))
    in_fan = in_dir < _F32(tof.fov_deg)
    col = jnp.clip((in_dir / _F32(tof.fov_deg) * 8.0).astype(jnp.int32), 0, 7)
    sector = dir_idx * 8 + col                           # [WR, WC] in 0..31

    # per-sector measured distance + hit flag, gathered by 5-level binary
    # select (cheap on the VPU; a real gather would scatter lanes)
    d32 = beams.reshape(32)
    hit32 = ((~jnp.isnan(d32)) & (d32 > _F32(tof.map_skip_below_m))
             & (d32 < _F32(tof.max_range_m) - _F32(tof.hit_margin_m)))
    d32 = jnp.where(jnp.isnan(d32), _F32(0.0),
                    jnp.minimum(d32, _F32(tof.max_range_m)))
    packed = jnp.where(hit32, d32, -d32)   # sign carries the hit flag;
    #                                        0 = no return (sec_valid false)

    def bsel(table):
        """table[sector] for a 32-entry table as a binary select tree
        (31 vectorized selects; avoids a lane-scattering gather)."""
        level = [table[i] for i in range(32)]
        for k in range(5):
            half_n = len(level) // 2
            sel = ((sector >> (4 - k)) & 1) == 1
            level = [jnp.where(sel, level[i + half_n], level[i])
                     for i in range(half_n)]
        return level[0]

    sec_packed = bsel(packed)
    sec_dist = jnp.abs(sec_packed)
    sec_hit = sec_packed > 0
    sec_valid = jnp.abs(sec_packed) > _F32(tof.map_skip_below_m)

    free = (in_fan & sec_valid & (rng > _F32(0.0))
            & (rng < sec_dist - _F32(cone.free_margin_m))
            & (rng <= _F32(tof.max_range_m)))
    occ = (in_fan & sec_valid & sec_hit
           & (jnp.abs(rng - sec_dist) <= _F32(cone.hit_band_m)))
    # logical-grid bound: the window sticks into the margins near edges
    inb = ((gy >= 0) & (gy < cfg.height) & (gx >= 0) & (gx < cfg.width))
    delta = jnp.where(occ, cone.occ_inc,
                      jnp.where(free, -cone.free_dec, 0)).astype(jnp.int16)
    delta = jnp.where(inb & en, delta, 0)

    out = jnp.clip(win.astype(jnp.int16) + delta, cfg.lo_min,
                   cfg.lo_max).astype(jnp.int8)
    return lax.dynamic_update_slice(padded_grid, out, (r0, c0))


cone_scan_update_batched = jax.vmap(
    cone_scan_update,
    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None, None, None),
)
