"""Dense inverse-sensor-model map update ("cone mode") — the
production-quality alternative to the bit-exact Bresenham mode.

The reference marks free space only along 32 one-cell-wide rays
(uav_local_nav.c:280-306), leaving unmarked wedges between rays that
widen with range.  Cone mode instead classifies EVERY window cell against
the scan: a cell is free if it lies inside a sensor's 63-degree fan
closer than that bearing's measured distance, occupied if it lies at the
measured distance of a hitting beam.  This is the standard occupancy-grid
inverse model — denser maps, faster convergence.

The per-cell classifier (`cone_cell_delta`) is TRANSCENDENTAL-FREE:
the bearing sector comes from sign tests against the fan-start basis
vector and a 3-level binary search over static column-boundary unit
vectors (cross-product signs), and all range tests compare SQUARED
distances.  Only mult/add/compare/select — so the same jnp code runs
identically inside the Pallas resident kernel (Mosaic has no atan2) and
the two paths produce bit-identical grids.

Updates are order-free by construction (each cell gets exactly one delta
per scan), so a plain saturating add is exact.
"""

from __future__ import annotations

import math
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
_DEG2RAD = _F32(math.pi / 180.0)


@dataclass(frozen=True)
class ConeConfig:
    """Inverse-model parameters (log-odds deltas match the reference's
    per-ray constants so maps are comparable)."""

    free_dec: int = 1
    occ_inc: int = 6
    hit_band_m: float = 0.10      # occupied band around the return
    free_margin_m: float = 0.05   # stop free-marking this short of the hit

def pack_beams(beams32, tof: TofConfig):
    """[...,32] f32 beam distances -> "packed" returns: |p| = clamped
    distance, sign = hit flag, 0.0 = no usable return."""
    d32 = beams32
    hit32 = ((~jnp.isnan(d32)) & (d32 > _F32(tof.map_skip_below_m))
             & (d32 < _F32(tof.max_range_m) - _F32(tof.hit_margin_m)))
    d32 = jnp.where(jnp.isnan(d32), _F32(0.0),
                    jnp.minimum(d32, _F32(tof.max_range_m)))
    return jnp.where(hit32, d32, -d32)


def fan_basis(yaw_deg, tof: TofConfig):
    """Unit vector of the FRONT fan's start bearing (yaw - half_fov)."""
    a = (yaw_deg - _F32(tof.half_fov_deg)) * _DEG2RAD
    return jnp.cos(a), jnp.sin(a)


def _col_bound(k: int, tof: TofConfig):
    """Static unit vector of fan-column boundary k (k * fov/8 degrees
    into the quadrant)."""
    a = math.radians(float(tof.fov_deg) / 8.0 * k)
    return _F32(math.cos(a)), _F32(math.sin(a))


def cone_cell_delta(rowsf, colsf, oxc, oyc, res: float, ux, uy, packed,
                    tof: TofConfig, cone: ConeConfig):
    """Per-cell log-odds delta (i32, broadcast [R, C]) for one scan,
    before bounds/enable gating.

    rowsf/colsf: f32 iotas [R, 1] / [1, C] (window-local cell indices);
    oxc/oyc: f32 scalars such that the pose->cell vector in meters is
    ((colsf + oxc) * res, (rowsf + oyc) * res) — they carry both the
    window offset and the sub-cell pose fraction; ux/uy: fan-start unit
    vector (fan_basis); packed: indexable of 32 f32 scalars (pack_beams
    order F0..7, R0..7, B0..7, L0..7).

    Only mult/add/compare/select ops — runs bit-identically under XLA
    and inside Pallas kernels (IEEE f32 both).  Conventions: quadrant
    boundaries go to the higher quadrant; column boundaries to the lower
    column; the fan-end boundary (phi == fov) is IN the fan.
    """
    resf = _F32(res)
    dx = (colsf + oxc) * resf            # [1, C] meters
    dy = (rowsf + oyc) * resf            # [R, 1]
    rng2 = dx * dx + dy * dy             # [R, C]
    c = ux * dx + uy * dy                # rng * cos(phi_global)
    s = ux * dy - uy * dx                # rng * sin(phi_global)

    # quadrant (F, R, B, L) of the bearing relative to the fan start
    m0 = (c > _F32(0.0)) & (s >= _F32(0.0))
    m1 = (~m0) & (s > _F32(0.0))
    m2 = (~m0) & (~m1) & (c < _F32(0.0))
    m_d1 = (~m0) & (~m1)                 # dir in {2, 3}
    m_d0 = m1 | (m_d1 & (~m2))           # dir in {1, 3}

    # rotate into the quadrant frame: phi in [0, 90)
    lc1 = jnp.where(m_d1, -c, c)
    ls1 = jnp.where(m_d1, -s, s)
    lc = jnp.where(m_d0, ls1, lc1)
    ls = jnp.where(m_d0, -lc1, ls1)

    # 3-level binary search for the fan column: boundary k sits at
    # k * fov/8 degrees; phi > boundary  <=>  cos_b*ls - sin_b*lc > 0
    def above(cb, sb):
        return cb * ls - sb * lc > _F32(0.0)

    c4, s4 = _col_bound(4, tof)
    b2 = above(c4, s4)
    c2, s2 = _col_bound(2, tof)
    c6, s6 = _col_bound(6, tof)
    b1 = above(jnp.where(b2, c6, c2), jnp.where(b2, s6, s2))
    c1, s1 = _col_bound(1, tof)
    c3, s3 = _col_bound(3, tof)
    c5, s5 = _col_bound(5, tof)
    c7, s7 = _col_bound(7, tof)
    b0 = above(jnp.where(b2, jnp.where(b1, c7, c5), jnp.where(b1, c3, c1)),
               jnp.where(b2, jnp.where(b1, s7, s5), jnp.where(b1, s3, s1)))
    c8, s8 = _col_bound(8, tof)
    in_fan = ~above(c8, s8)              # phi <= fov

    # distance gather: 5-level select tree over (d1, d0, b2, b1, b0)
    level = [packed[i] for i in range(32)]
    for m in (m_d1, m_d0, b2, b1, b0):
        h = len(level) // 2
        level = [jnp.where(m, level[i + h], level[i]) for i in range(h)]
    sec_p = level[0]
    sec_d = jnp.abs(sec_p)
    sec_hit = sec_p > _F32(0.0)
    sec_valid = sec_d > _F32(tof.map_skip_below_m)

    dfree = jnp.maximum(sec_d - _F32(cone.free_margin_m), _F32(0.0))
    maxr = _F32(tof.max_range_m)
    free = (in_fan & sec_valid & (rng2 > _F32(0.0))
            & (rng2 < dfree * dfree) & (rng2 <= maxr * maxr))
    olo = jnp.maximum(sec_d - _F32(cone.hit_band_m), _F32(0.0))
    ohi = sec_d + _F32(cone.hit_band_m)
    occ = (in_fan & sec_valid & sec_hit
           & (rng2 >= olo * olo) & (rng2 <= ohi * ohi))
    return jnp.where(occ, jnp.int32(cone.occ_inc),
                     jnp.where(free, jnp.int32(-cone.free_dec),
                               jnp.int32(0)))


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

    # pose->cell offsets: (cols + oxc) in cell units, sub-cell fraction
    # included so ranges are exact (see cone_cell_delta)
    res = _F32(cfg.res_m)
    fx = (x_m - origin_x) / res + _F32(cfg.width // 2)
    fy = (y_m - origin_y) / res + _F32(cfg.height // 2)
    oxc = (pcx - R).astype(jnp.float32) - fx
    oyc = (pcy - R).astype(jnp.float32) - fy
    rowsf = lax.broadcasted_iota(jnp.int32, (WR, 1), 0).astype(jnp.float32)
    colsf = lax.broadcasted_iota(jnp.int32, (1, WC), 1).astype(jnp.float32)

    ux, uy = fan_basis(yaw_deg, tof)
    packed = pack_beams(beams.reshape(32), tof)
    delta = cone_cell_delta(rowsf, colsf, oxc, oyc, cfg.res_m, ux, uy,
                            packed, tof, cone)

    # logical-grid bound (the window sticks into the margins near edges)
    rows = lax.broadcasted_iota(jnp.int32, (WR, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, WC), 1)
    gy = rows + (pcy - R)
    gx = cols + (pcx - R)
    inb = ((gy >= 0) & (gy < cfg.height) & (gx >= 0) & (gx < cfg.width))
    delta = jnp.where(inb & en, delta, 0).astype(jnp.int16)

    out = jnp.clip(win.astype(jnp.int16) + delta, cfg.lo_min,
                   cfg.lo_max).astype(jnp.int8)
    return lax.dynamic_update_slice(padded_grid, out, (r0, c0))


cone_scan_update_batched = jax.vmap(
    cone_scan_update,
    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None, None, None),
)
