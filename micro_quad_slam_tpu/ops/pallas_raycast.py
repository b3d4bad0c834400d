"""Pallas TPU kernel for the fused scan -> log-odds window update.

The XLA path (ops/raycast.py) expresses the 32-ray update as ~2000
elementwise ops on [96, 128] windows; under vmap+scan XLA materializes
intermediates and pays batched gather/scatter for the per-quad dynamic
window slices.  This kernel owns the whole update per quad:

  grid = (B,) programs, one per quad, on the single TensorCore:
    1. DMA the quad's (96, 128) int8 window HBM -> VMEM at its
       pose-dependent offset (no batched-gather: a real strided DMA).
    2. Unrolled 32-ray pass in VMEM/vregs: per ray, one [AWR, 256]
       compare per orientation against a sentinel-masked minor-offset
       vector, membership OR, endpoint select, and the (P, max, min)
       prefix updates that recover exact sequential int8 clamping
       (see ops/raycast.py's Skorokhod-form derivation).
    3. Apply final = max(lo, min(mid, up)) and DMA the window back.

Ray parameters arrive as per-quad scalars in SMEM (computed by the XLA
make_rays prologue), so the kernel does no trig.  The grid buffer is
input/output-aliased: untouched cells never move.

Falls back to interpret mode for CPU tests (exactness is asserted against
both the XLA path and the golden model).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from micro_quad_slam_tpu.ops.raycast import (
    DEFAULT_GEOM,
    GridGeom,
    make_rays,
)
from micro_quad_slam_tpu.utils.config import MapConfig, TofConfig

_SENT = 0x7FFF  # impossible minor-offset sentinel (window rel coords < 256)


# Mosaic DMA slices of tiled int8 HBM arrays must start on (8, 128) tile
# boundaries, so the kernel loads a tile-ALIGNED superset window of
# (win_rows + 8, 2 * 128) and carries the pose center as scalars.
_AWR_PAD = 8
_AWC = 256


def _compute_window(rw, win_ref, cy, cx, geom: GridGeom, cfg: MapConfig):
    """The unrolled 32-ray pass on one VMEM window ref (shared by the
    single-buffered and pipelined kernels)."""
    AWR = geom.win_rows + _AWR_PAD
    AWC = _AWC
    rows = lax.broadcasted_iota(jnp.int32, (AWR, 1), 0) - cy   # v (y)
    cols = lax.broadcasted_iota(jnp.int32, (1, AWC), 1) - cx   # u (x)

    P = jnp.zeros((AWR, AWC), jnp.int32)
    mx = jnp.zeros((AWR, AWC), jnp.int32)
    mn = jnp.zeros((AWR, AWC), jnp.int32)

    for r in range(32):
        ex = rw(4 * r + 0)
        ey = rw(4 * r + 1)
        ed = rw(4 * r + 2)
        val = rw(4 * r + 3) != 0
        dx = jnp.abs(ex)
        dy = jnp.abs(ey)
        sx = jnp.where(ex > 0, 1, -1)
        sy = jnp.where(ey > 0, 1, -1)
        kx = cols * sx
        ky = rows * sy
        xmaj = dx >= dy
        mX = (2 * kx * dy + dx) // jnp.maximum(2 * dx, 1)
        mY = (2 * ky * dx + dy) // jnp.maximum(2 * dy, 1)
        okX = (kx >= 0) & (kx <= dx) & xmaj & val
        okY = (ky >= 0) & (ky <= dy) & (~xmaj) & val
        mX = jnp.where(okX, mX, _SENT)
        mY = jnp.where(okY, mY, _SENT)
        member = (ky == mX) | (kx == mY)
        is_end = (rows == ey) & (cols == ex) & val
        delta = jnp.where(member,
                          jnp.where(is_end, ed, -cfg.lo_free_dec), 0)
        P = P + delta
        mx = jnp.maximum(mx, P)
        mn = jnp.minimum(mn, P)

    v0 = win_ref[...].astype(jnp.int32)
    mid = v0 + P
    up = jnp.int32(cfg.lo_max) + P - mx
    lo = jnp.int32(cfg.lo_min) + P - mn
    win_ref[...] = jnp.maximum(jnp.minimum(mid, up), lo).astype(jnp.int8)


def _window_kernel(ray_ref, grid_ref, out_ref, win_ref, sem_in, sem_out,
                   *, geom: GridGeom, cfg: MapConfig):
    """ray_ref: SMEM i32 [1, 8, 128]; flat layout: words 0..127 are
    32*(ex, ey, ed, valid); row-1 words: 0/1 = tile-aligned window origin
    (r0a, c0a), 2/3 = pose-center offset inside the window (cy, cx).
    grid_ref/out_ref: ANY i8 [B, prows, pcols] (aliased); win_ref: VMEM i8
    scratch [awr, awc]."""
    ib = pl.program_id(0)
    AWR = geom.win_rows + _AWR_PAD
    AWC = _AWC

    def rw(w):  # flat ray-word read from the [1, 8, 128] SMEM block
        return ray_ref[0, w // 128, w % 128]

    r0a = pl.multiple_of(rw(128), 8)
    c0a = pl.multiple_of(rw(129), 128)
    cy = rw(130)
    cx = rw(131)

    load = pltpu.make_async_copy(
        grid_ref.at[ib, pl.ds(r0a, AWR), pl.ds(c0a, AWC)], win_ref, sem_in)
    load.start()
    load.wait()

    _compute_window(rw, win_ref, cy, cx, geom, cfg)

    store = pltpu.make_async_copy(
        win_ref, out_ref.at[ib, pl.ds(r0a, AWR), pl.ds(c0a, AWC)], sem_out)
    store.start()
    store.wait()


def _pack_rays(beams, x, y, yaw, ox, oy, enabled, cfg: MapConfig,
               tof: TofConfig, geom: GridGeom):
    """XLA prologue: per-quad ray scalars packed for SMEM prefetch.
    Returns i32 [B, 8, 128]: row 0 = 128 ray words (ex, ey, ed, valid
    per ray), row 1 words 0/1 = window origin (r0, c0); rest padding
    (the 8x128 tile shape is what the TPU lowering requires)."""
    rays = jax.vmap(
        lambda b_, x_, y_, yaw_, ox_, oy_, en_: make_rays(
            b_, x_, y_, yaw_, ox_, oy_, en_, cfg, tof)
    )(beams, x, y, yaw, ox, oy, enabled)
    packed = jnp.stack(
        [rays["ex"], rays["ey"], rays["end_delta"],
         rays["valid"].astype(jnp.int32)], axis=-1,
    ).reshape(-1, 128)
    r0 = rays["pcy"] + geom.pad - geom.win_r
    c0 = rays["pcx"] + geom.pad - geom.win_r
    r0a = (r0 // 8) * 8          # tile-aligned DMA origin (Mosaic req.)
    c0a = (c0 // 128) * 128
    cy = rays["pcy"] + geom.pad - r0a   # pose center inside the window
    cx = rays["pcx"] + geom.pad - c0a
    B = packed.shape[0]
    row1 = jnp.zeros((B, 128), jnp.int32)
    row1 = row1.at[:, 0].set(r0a).at[:, 1].set(c0a)
    row1 = row1.at[:, 2].set(cy).at[:, 3].set(cx)
    rest = jnp.zeros((B, 6, 128), jnp.int32)
    return jnp.concatenate(
        [packed[:, None, :], row1[:, None, :], rest], axis=1)


def pallas_apply_scans(
    padded_grids: jnp.ndarray,   # i8 [B, prows, pcols]
    beams: jnp.ndarray,          # f32 [B, 4, 8]
    x, y, yaw_deg,               # f32 [B]
    origin_x, origin_y,          # f32 [B]
    enabled,                     # bool [B]
    cfg: MapConfig = MapConfig(),
    tof: TofConfig = TofConfig(),
    geom: GridGeom = DEFAULT_GEOM,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched fused scan update: the Pallas twin of
    vmap(apply_scan_to_grid).  Bit-identical results.  interpret=None
    follows the backend (interpret off TPU) — the old False default
    crashed the CLI's --kernel pallas path on CPU (round-5 drive)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pallas_apply_scans_jit(padded_grids, beams, x, y, yaw_deg,
                                   origin_x, origin_y, enabled, cfg, tof,
                                   geom, interpret)


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11))
def _pallas_apply_scans_jit(
    padded_grids, beams, x, y, yaw_deg, origin_x, origin_y, enabled,
    cfg: MapConfig, tof: TofConfig, geom: GridGeom, interpret: bool
) -> jnp.ndarray:
    B = padded_grids.shape[0]
    ray_words = _pack_rays(beams, x, y, yaw_deg, origin_x, origin_y,
                           enabled, cfg, tof, geom)

    kernel = functools.partial(_window_kernel, geom=geom, cfg=cfg)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(padded_grids.shape, jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((geom.win_rows + _AWR_PAD, _AWC), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ray_words, padded_grids)


def _window_kernel_db(org_ref, ray_ref, grid_ref, out_ref, win2,
                      sem_in, sem_out, *, geom: GridGeom, cfg: MapConfig,
                      nb: int):
    """Pipelined variant: two-slot VMEM window scratch; each program
    prefetches the NEXT quad's window while computing its own (grid
    programs run sequentially on the core, and scratch persists across
    them).  org_ref: scalar-prefetch i32 [B, 2] tile-aligned window
    origins; sem_in/sem_out: DMA semaphore pairs per slot."""
    b = pl.program_id(0)
    AWR = geom.win_rows + _AWR_PAD
    AWC = _AWC
    slot = lax.rem(b, 2)
    nslot = lax.rem(b + 1, 2)

    def rw(w):
        return ray_ref[0, w // 128, w % 128]

    def start_load(qi, sl):
        r0a = pl.multiple_of(org_ref[qi, 0], 8)
        c0a = pl.multiple_of(org_ref[qi, 1], 128)
        pltpu.make_async_copy(
            grid_ref.at[qi, pl.ds(r0a, AWR), pl.ds(c0a, AWC)],
            win2.at[sl], sem_in.at[sl]).start()

    @pl.when(b == 0)
    def _():
        start_load(0, slot)

    @pl.when(b + 1 < nb)
    def _():
        # the next slot's previous STORE (program b-1) must land before
        # we overwrite that buffer with a new load
        @pl.when(b >= 1)
        def _():
            pltpu.make_async_copy(win2.at[nslot],
                                  out_ref.at[b - 1, pl.ds(0, AWR),
                                             pl.ds(0, AWC)],
                                  sem_out.at[nslot]).wait()
        start_load(b + 1, nslot)

    pltpu.make_async_copy(
        grid_ref.at[b, pl.ds(0, AWR), pl.ds(0, AWC)], win2.at[slot],
        sem_in.at[slot]).wait()

    _compute_window(rw, win2.at[slot], rw(130), rw(131), geom, cfg)

    r0a = pl.multiple_of(org_ref[b, 0], 8)
    c0a = pl.multiple_of(org_ref[b, 1], 128)
    store = pltpu.make_async_copy(
        win2.at[slot], out_ref.at[b, pl.ds(r0a, AWR), pl.ds(c0a, AWC)],
        sem_out.at[slot])
    store.start()

    @pl.when(b == nb - 1)
    def _():
        store.wait()
    @pl.when((b == nb - 1) & (nb >= 2))
    def _():
        # drain the other slot's in-flight store too
        pltpu.make_async_copy(win2.at[nslot],
                              out_ref.at[b, pl.ds(0, AWR), pl.ds(0, AWC)],
                              sem_out.at[nslot]).wait()


def pallas_apply_scans_db(
    padded_grids: jnp.ndarray,
    beams: jnp.ndarray,
    x, y, yaw_deg,
    origin_x, origin_y,
    enabled,
    cfg: MapConfig = MapConfig(),
    tof: TofConfig = TofConfig(),
    geom: GridGeom = DEFAULT_GEOM,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Double-buffered batched fused scan update (bit-identical).
    interpret=None follows the backend, like every other entry."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pallas_apply_scans_db_jit(padded_grids, beams, x, y, yaw_deg,
                                      origin_x, origin_y, enabled, cfg,
                                      tof, geom, interpret)


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11))
def _pallas_apply_scans_db_jit(
    padded_grids, beams, x, y, yaw_deg, origin_x, origin_y, enabled,
    cfg: MapConfig, tof: TofConfig, geom: GridGeom, interpret: bool
) -> jnp.ndarray:
    B = padded_grids.shape[0]
    ray_words = _pack_rays(beams, x, y, yaw_deg, origin_x, origin_y,
                           enabled, cfg, tof, geom)
    origins = ray_words[:, 1, :2]  # (r0a, c0a) per quad

    kernel = functools.partial(_window_kernel_db, geom=geom, cfg=cfg, nb=B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b, org: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, geom.win_rows + _AWR_PAD, _AWC), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(padded_grids.shape, jnp.int8),
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(origins, ray_words, padded_grids)
