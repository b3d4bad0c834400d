"""Resident-grid Pallas TPU kernel: the WHOLE mapping replay in one launch.

The per-step kernels (pallas_raycast.py) pay, per frame, an HBM window
round-trip plus a 32-ray pass in int32 over a (104, 256) tile-aligned
window — ~30 us/frame, on par with the XLA paths whose cost is the
batched dynamic window slice (PERFORMANCE.md).  This kernel restructures
the whole replay around two observations:

  1. Everything except the grid is grid-independent.  Origins, the
     recenter schedule, ray endpoints, and the enable gates depend only
     on the logged frames, so a cheap scalar `lax.scan` (no grid in the
     carry) precomputes the full per-(quad, frame) schedule up front.
  2. A quad's padded grid (608x640 int8 = 389 KB) fits in VMEM.  With a
     (B, T) pallas grid (T minor => programs run t-inner on the core and
     scratch persists across programs), each quad's grid is DMA'd from
     HBM ONCE, all T scans apply in VMEM, and it is stored back once.

Per frame the kernel then does:
  - slab: VMEM->VMEM copy of the (8,128)-aligned (104, 256) superset
    window (int8 tile alignment, as in pallas_raycast.py);
  - compact: dynamic two-axis `pltpu.roll` so the true window sits at
    (0, 0) — the 32-ray pass runs on a [96, 128] window with a STATIC
    center (win_r, win_r), exactly window_scan_update's shape;
  - the ray pass itself with NO integer division: minor == floor(A / D)
    is tested as D*minor <= A < D*minor + D (exact for D > 0, including
    the D = max(2*dmaj, 1) = 1 degenerate zero-length-ray case), with
    out-of-extent / invalid rays folded in by forcing A to a sentinel
    below any reachable D*minor.  All in int32: Mosaic v5e supports
    neither int8 vector arithmetic nor ordered int16 vector compares,
    but the compact window (12 vregs/op vs 26) and the dropped integer
    divisions still cut the per-frame ALU ~11x;
  - sequential int8 clamping recovered in one int16 pass from the
    prefix extrema (Skorokhod form, see ops/raycast.py);
  - roll back, blend into the slab, copy the slab back into the
    resident grid;
  - the rare map recenter (uav_local_nav.c:308-343) runs fully in VMEM
    behind `pl.when`: two whole-grid rolls plus the logical-region /
    shifted-source masks of recenter_apply.

Bit-exactness versus the XLA path (and hence the golden C model) is
asserted in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from micro_quad_slam_tpu.ops.beams import extract_beams, tof_filter_update
from micro_quad_slam_tpu.ops.pallas_raycast import _AWC, _AWR_PAD, _pack_rays
from micro_quad_slam_tpu.ops.raycast import (
    shift_origin,
    DEFAULT_GEOM,
    GridGeom,
    recenter_decide,
)
from micro_quad_slam_tpu.utils.config import MapConfig, PipelineConfig, UL_PROFILE

_F32 = np.float32

# extra schedule words in ray-word row 1 (words 0-3 are r0a/c0a/cy/cx)
_W_DO, _W_SY, _W_SX = 4, 5, 6

_A_SENT = -20000  # below any reachable D*minor (>= -2*88*44 = -7744)


def _schedule(frames: dict, cfg: PipelineConfig, geom: GridGeom,
              mode: str = "exact", state0=None):
    """Grid-free scalar replay: reproduces mapping_step's origin / init /
    recenter / enable sequence (replay/mapping.py) and packs the full
    per-(t, b) ray + recenter schedule for the kernel.

    mode "exact": returns (ray_words i32 [T, B, 8, 128], outs, final).
    mode "exact2": v2 planar words i32 [T, B, 16, 128]
    (ops/pallas_residentx.py layout).
    mode "cone": returns ((words i32 [T, B, 1, 128], fwords f32
    [T, B, 1, 128]), outs, final) — i32 words 0-7 = r0a, c0a, cy, cx,
    do, sy, sx, en; f32 words 0-31 = packed beam returns (pack_beams),
    32-49 = fan_bounds scalars, 50/51 = oxc, oyc (cone_cell_delta
    scalars).

    The scan carries ONLY the tiny sequential state (origins, inited,
    ToF filter); the heavy per-(t, b) ray packing runs vectorized over
    the whole [T, B] batch afterwards — the latency-bound small-op scan
    was costing more than the pallas kernel itself."""
    from micro_quad_slam_tpu.replay.mapping import (
        ST_HOVER,
        ST_LANDING,
        KF_MAP_RECENTER,
        pose_good_for_mapping,
    )

    B, T = frames["x_m"].shape
    beams, minima = extract_beams(frames["grid_mm"], cfg.tof)
    seq = {"minima": jnp.moveaxis(minima, 0, 1)}
    for k in ("x_m", "y_m", "state"):
        seq[k] = jnp.moveaxis(frames[k], 0, 1)

    st_hi = ST_LANDING if cfg.behavior.explore_enabled else 6
    res = _F32(cfg.map.res_m)

    def step(carry, fr):
        origin_x, origin_y, inited, filt = carry
        filt = tof_filter_update(filt, fr["minima"], cfg.tof.filt_alpha)
        x, y = fr["x_m"], fr["y_m"]
        pose_finite = jnp.isfinite(x) & jnp.isfinite(y)
        st = fr["state"].astype(jnp.int32)
        airborne = (st >= ST_HOVER) & (st <= st_hi)
        do_init = (~inited) & pose_finite & airborne
        origin_x = jnp.where(do_init, x, origin_x)
        origin_y = jnp.where(do_init, y, origin_y)
        inited = inited | do_init

        sx, sy, do_rc = recenter_decide(
            origin_x, origin_y, x, y, pose_finite & inited, cfg.map)
        origin_x = shift_origin(origin_x, sx, res)
        origin_y = shift_origin(origin_y, sy, res)

        out = {"ox": origin_x, "oy": origin_y, "inited": inited,
               "do": do_rc, "rsy": sy, "rsx": sx, "filt": filt}
        return (origin_x, origin_y, inited, filt), out

    if state0 is not None:   # resume a checkpointed replay
        init = (state0.origin_x, state0.origin_y, state0.inited,
                state0.filt)
    else:
        # carry init derived from the data (not constants) so its
        # sharding varying-axis type matches the body under shard_map
        x0 = frames["x_m"][:, 0]
        nanb = jnp.full_like(x0, jnp.nan)
        init = (nanb, nanb, jnp.zeros_like(x0, bool),
                nanb[:, None] + jnp.zeros((4,), jnp.float32))
    final, so = lax.scan(step, init, seq, unroll=8)

    # everything below is carry-free: vectorized over the full [T, B]
    xT = jnp.moveaxis(frames["x_m"], 0, 1)
    yT = jnp.moveaxis(frames["y_m"], 0, 1)
    yawT = jnp.moveaxis(frames["yaw_deg"], 0, 1)
    enabled = so["inited"] & pose_good_for_mapping(
        xT, yawT, jnp.moveaxis(frames["of_q"], 0, 1).astype(jnp.int32),
        jnp.moveaxis(frames["of_rate_x"], 0, 1),
        jnp.moveaxis(frames["sys_health"], 0, 1),
        cfg.gates.of_min_quality)
    beamsT = jnp.moveaxis(beams, 0, 1)
    do_rc, rsy, rsx = so["do"], so["rsy"], so["rsx"]
    outs = {
        "used": enabled,
        "kf_flags": jnp.where(do_rc, jnp.uint8(KF_MAP_RECENTER),
                              jnp.uint8(0)),
        "filt": so["filt"],
    }

    if mode == "cone":
        words = jax.vmap(
            lambda b_, x_, y_, w_, ox_, oy_, en_, do_, sy_, sx_: _pack_cone(
                b_, x_, y_, w_, ox_, oy_, en_, cfg.map, cfg.tof, geom,
                do_, sy_, sx_)
        )(beamsT, xT, yT, yawT, so["ox"], so["oy"], enabled,
          do_rc, rsy, rsx)
    elif mode in ("exact2", "cone2", "hybrid2"):
        from micro_quad_slam_tpu.ops.pallas_residentx import (
            _pack_cone_x, _pack_hybrid_x, _pack_words_x,
            pad_frames_to_group)
        args = [beamsT, xT, yT, yawT, so["ox"], so["oy"], enabled,
                do_rc, rsy, rsx]
        # pad to the kernel's frame-group size with inert frames
        # (enabled=False => every ray invalid; do=False)
        args, _ = pad_frames_to_group(args, T)
        packer = {"exact2": _pack_words_x, "cone2": _pack_cone_x,
                  "hybrid2": _pack_hybrid_x}[mode]
        words = packer(*args, cfg.map, cfg.tof, geom)
    else:
        words = jax.vmap(
            lambda b_, x_, y_, w_, ox_, oy_, en_: _pack_rays(
                b_, x_, y_, w_, ox_, oy_, en_, cfg.map, cfg.tof, geom)
        )(beamsT, xT, yT, yawT, so["ox"], so["oy"], enabled)
        words = (words.at[:, :, 1, _W_DO].set(do_rc.astype(jnp.int32))
                 .at[:, :, 1, _W_SY].set(rsy)
                 .at[:, :, 1, _W_SX].set(rsx))
    return words, outs, final


def _pack_cone(beams, x, y, yaw, ox, oy, enabled, cfg: MapConfig, tof,
               geom: GridGeom, do_rc, sy, sx):
    """Cone-mode schedule words for a [B] batch: (i32 [B, 1, 128],
    f32 [B, 1, 128]).  Mirrors cone_scan_update's scalar prologue
    (ops/conemode.py) so the kernel's per-cell math sees identical f32
    inputs and the grids bit-match the XLA cone path."""
    from micro_quad_slam_tpu.ops.conemode import fan_bounds, pack_beams
    from micro_quad_slam_tpu.ops.raycast import world_to_cell

    R = geom.win_r
    B = x.shape[0]
    pcx, pcy = world_to_cell(x, y, ox, oy, cfg.res_m,
                             cfg.width // 2, cfg.height // 2)
    pose_in = ((pcx >= 0) & (pcx < cfg.width)
               & (pcy >= 0) & (pcy < cfg.height))
    en = enabled & pose_in
    pcx = jnp.clip(pcx, 0, cfg.width - 1)
    pcy = jnp.clip(pcy, 0, cfg.height - 1)
    r0 = pcy + geom.pad - R
    c0 = pcx + geom.pad - R
    r0a = (r0 // 8) * 8
    c0a = (c0 // 128) * 128

    res = _F32(cfg.res_m)
    fx = (x - ox) / res + _F32(cfg.width // 2)
    fy = (y - oy) / res + _F32(cfg.height // 2)
    oxc = (pcx - R).astype(jnp.float32) - fx
    oyc = (pcy - R).astype(jnp.float32) - fy
    fb = fan_bounds(yaw, tof)                     # 18 x [B]
    packed = pack_beams(beams.reshape(B, 32), tof)

    iw = jnp.zeros((B, 128), jnp.int32)
    iw = iw.at[:, 0].set(r0a).at[:, 1].set(c0a)
    iw = iw.at[:, 2].set(pcy + geom.pad - r0a)   # cy
    iw = iw.at[:, 3].set(pcx + geom.pad - c0a)   # cx
    iw = iw.at[:, 4].set(do_rc.astype(jnp.int32))
    iw = iw.at[:, 5].set(sy).at[:, 6].set(sx)
    iw = iw.at[:, 7].set(en.astype(jnp.int32))
    fw = jnp.zeros((B, 128), jnp.float32)
    fw = fw.at[:, 0:32].set(packed)
    fw = fw.at[:, 32:50].set(jnp.stack(fb, axis=-1))
    fw = fw.at[:, 50].set(oxc).at[:, 51].set(oyc)
    return iw[:, None, :], fw[:, None, :]


def _nn(s, n):
    """non-negative left-rotate amount for a shift by s over modulus n"""
    return lax.rem(lax.rem(-s, n) + n, n)


def _ray_pass(window: jnp.ndarray, rw, geom: GridGeom, cfg: MapConfig):
    """The 32-ray update on a compact [win_rows, win_cols] int8 window
    with the pose at the static center (win_r, win_r).  Bit-identical to
    ops/raycast.py window_scan_update, restructured division-free and in
    int8/int16 for VPU lane packing."""
    R = geom.win_r
    rows = lax.broadcasted_iota(jnp.int32, (geom.win_rows, 1), 0) - R
    cols = lax.broadcasted_iota(jnp.int32, (1, geom.win_cols), 1) - R

    free = jnp.int32(cfg.lo_free_dec)
    z = jnp.zeros((geom.win_rows, geom.win_cols), jnp.int32)
    P, mx, mn = z, z, z

    for r in range(32):
        ex = rw(4 * r + 0)
        ey = rw(4 * r + 1)
        ed = rw(4 * r + 2)
        val = rw(4 * r + 3) != 0
        dx = jnp.abs(ex)
        dy = jnp.abs(ey)
        sx = jnp.where(ex > 0, 1, -1)
        sy = jnp.where(ey > 0, 1, -1)
        xmaj = dx >= dy
        D = jnp.maximum(2 * dx, 1)       # X-major divisor
        E = jnp.maximum(2 * dy, 1)       # Y-major divisor

        # i32 throughout: Mosaic on v5e supports neither i8 arithmetic
        # nor ordered i16 vector compares, and mask relayouts between
        # mixed-width layouts are unimplemented.  The win over the
        # per-step kernel is the 2.2x smaller static-centered window and
        # the division-free membership test.
        nA = (2 * dy * sx) * cols       # 2*dy*kx    [1, C]
        nE = (E * sx) * cols            # E*kx       [1, C]
        mD = (D * sy) * rows            # D*ky       [R, 1]
        mA = (2 * dx * sy) * rows       # 2*dx*ky    [R, 1]

        # X-major: ky == floor((2*kx*dy + dx) / D)
        #   <=> mD <= ax < mD + D   with ax = 2*kx*dy + dx, kx in [0, dx]
        #   (kx = sx*col in [0, dx] <=> col in [min(ex,0), max(ex,0)];
        #   the xmaj/valid gates fold in as an empty range — all gating
        #   is scalar: Mosaic can't relayout selects between 1-D masks).
        # Y-major: kx == floor((2*ky*dx + dy) / E)
        #   <=> nE <= ay < nE + E   with ay = 2*ky*dx + dy, ky in [0, dy]
        #   <=> ay <= nE + E - 1 < ay + E          (integer identity)
        # The Y form swaps so BOTH orientations share one broadcast
        # row <= lane < row + Dv compare pair; the 1-D operands select
        # by majorness.  Sentinels force non-membership: lane -> very
        # low for X, row -> very high for Y.
        okx = xmaj & val
        lo = jnp.where(okx, jnp.minimum(ex, 0), 1)
        hi = jnp.where(okx, jnp.maximum(ex, 0), 0)
        ax = jnp.where((cols >= lo) & (cols <= hi), nA + dx,
                       jnp.int32(_A_SENT))

        oky = (~xmaj) & val
        lo = jnp.where(oky, jnp.minimum(ey, 0), 1)
        hi = jnp.where(oky, jnp.maximum(ey, 0), 0)
        ay = jnp.where((rows >= lo) & (rows <= hi), mA + dy,
                       jnp.int32(-_A_SENT))

        lane_t = jnp.where(xmaj, ax, nE + (E - 1))      # [1, C]
        row_t = jnp.where(xmaj, mD, ay)                 # [R, 1]
        Dv = jnp.where(xmaj, D, E)
        member = (row_t <= lane_t) & (lane_t < row_t + Dv)
        # endpoint as ONE 2-D compare (broadcasting two 1-D masks would
        # need an unsupported mask relayout); val gates via the sentinel
        eyv = jnp.where(val, ey, 9999)
        is_end = (jnp.abs(rows - eyv) + jnp.abs(cols - ex)) == 0
        delta = jnp.where(member, jnp.where(is_end, ed, -free), 0)
        P = P + delta
        mx = jnp.maximum(mx, P)
        mn = jnp.minimum(mn, P)

    v0 = window.astype(jnp.int32)
    mid = v0 + P
    up = jnp.int32(cfg.lo_max) + P - mx
    lo = jnp.int32(cfg.lo_min) + P - mn
    return jnp.maximum(jnp.minimum(mid, up), lo).astype(jnp.int8)


def _recenter_in_vmem(vgrid, sy, sx, geom: GridGeom):
    """recenter_apply (ops/raycast.py) on the resident VMEM grid."""
    PR, PC = geom.prows, geom.pcols
    g = vgrid[...].astype(jnp.int32)    # pltpu.roll is 32-bit only
    g = pltpu.roll(g, _nn(sy, PR), 0)   # new[y, x] = old[y+sy, x+sx]
    g = pltpu.roll(g, _nn(sx, PC), 1).astype(jnp.int8)
    r_ids = lax.broadcasted_iota(jnp.int32, (PR, 1), 0)
    c_ids = lax.broadcasted_iota(jnp.int32, (1, PC), 1)
    in_log = ((r_ids >= geom.pad) & (r_ids < geom.pad + geom.height)
              & (c_ids >= geom.pad) & (c_ids < geom.pad + geom.width))
    src_in = ((r_ids + sy >= geom.pad)
              & (r_ids + sy < geom.pad + geom.height)
              & (c_ids + sx >= geom.pad)
              & (c_ids + sx < geom.pad + geom.width))
    vgrid[...] = jnp.where(in_log & src_in, g, jnp.int8(0))


def _windowed_update(vgrid, slab, sem_w, r0a, c0a, ry, rc,
                     geom: GridGeom, pass_fn):
    """Slab DMA -> roll-compact to a [win_rows, win_cols] window with the
    pose at the static center -> pass_fn -> roll back, blend, store."""
    AWR = geom.win_rows + _AWR_PAD
    AWC = _AWC
    cp = pltpu.make_async_copy(
        vgrid.at[pl.ds(r0a, AWR), pl.ds(c0a, AWC)], slab, sem_w)
    cp.start()
    cp.wait()

    w0 = slab[...]
    w32 = w0.astype(jnp.int32)              # pltpu.roll is 32-bit only
    comp = pltpu.roll(pltpu.roll(w32, _nn(ry, AWR), 0),
                      _nn(rc, AWC), 1).astype(jnp.int8)
    comp = comp[:geom.win_rows, :geom.win_cols]

    upd = pass_fn(comp)

    full = jnp.pad(
        upd, ((0, AWR - geom.win_rows), (0, AWC - geom.win_cols)),
    ).astype(jnp.int32)
    back = pltpu.roll(pltpu.roll(full, lax.rem(ry, AWR), 0),
                      lax.rem(rc, AWC), 1).astype(jnp.int8)
    ri = lax.broadcasted_iota(jnp.int32, (AWR, 1), 0)
    ci = lax.broadcasted_iota(jnp.int32, (1, AWC), 1)
    inw = ((ri >= ry) & (ri < ry + geom.win_rows)
           & (ci >= rc) & (ci < rc + geom.win_cols))
    slab[...] = jnp.where(inw, back, w0)

    cp = pltpu.make_async_copy(
        slab, vgrid.at[pl.ds(r0a, AWR), pl.ds(c0a, AWC)], sem_w)
    cp.start()
    cp.wait()


def _resident_kernel(ray_ref, grid_ref, out_ref, vgrid, slab,
                     sem_g, sem_w, sem_o, *, geom: GridGeom, cfg: MapConfig,
                     nt: int):
    """ray_ref: SMEM i32 [1, 1, 8, 128] (one (t, b) schedule block);
    grid_ref/out_ref: ANY i8 [B, prows, pcols] (aliased); vgrid: VMEM i8
    resident grid; slab: VMEM i8 (win_rows + 8, 256) aligned window."""
    t = pl.program_id(1)
    b = pl.program_id(0)

    def rw(w):
        return ray_ref[0, 0, w // 128, w % 128]

    @pl.when(t == 0)
    def _():
        cp = pltpu.make_async_copy(grid_ref.at[b], vgrid, sem_g)
        cp.start()
        cp.wait()

    # recenter (rare; real branch)
    @pl.when(rw(128 + _W_DO) != 0)
    def _():
        _recenter_in_vmem(vgrid, rw(128 + _W_SY), rw(128 + _W_SX), geom)

    r0a = pl.multiple_of(rw(128), 8)
    c0a = pl.multiple_of(rw(129), 128)
    ry = rw(130) - geom.win_r    # true window corner inside the slab
    rc = rw(131) - geom.win_r
    _windowed_update(vgrid, slab, sem_w, r0a, c0a, ry, rc, geom,
                     lambda comp: _ray_pass(comp, rw, geom, cfg))

    @pl.when(t == nt - 1)
    def _():
        cp = pltpu.make_async_copy(vgrid, out_ref.at[b], sem_o)
        cp.start()
        cp.wait()


def _cone_pass(window: jnp.ndarray, rw, fw, geom: GridGeom, cfg: MapConfig,
               tof, cone):
    """Dense inverse-model pass on the compact window: the SAME
    cone_cell_delta jnp code as the XLA path (bit-identical f32)."""
    from micro_quad_slam_tpu.ops.conemode import cone_cell_delta

    rowsf = lax.broadcasted_iota(
        jnp.int32, (geom.win_rows, 1), 0).astype(jnp.float32)
    colsf = lax.broadcasted_iota(
        jnp.int32, (1, geom.win_cols), 1).astype(jnp.float32)
    packed = [fw(i) for i in range(32)]
    fb = tuple(fw(32 + i) for i in range(18))
    delta = cone_cell_delta(rowsf, colsf, fw(50), fw(51), cfg.res_m,
                            fb, packed, tof, cone)

    # logical-grid bound + enable gate, as i32 products (1-D mask
    # broadcasts are unsupported relayouts in Mosaic)
    gy0 = rw(0) + (rw(2) - geom.win_r) - geom.pad   # logical y of row 0
    gx0 = rw(1) + (rw(3) - geom.win_r) - geom.pad
    rows = lax.broadcasted_iota(jnp.int32, (geom.win_rows, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, geom.win_cols), 1)
    gy = rows + gy0
    gx = cols + gx0
    row_ok = jnp.where((gy >= 0) & (gy < geom.height), 1, 0)
    col_ok = jnp.where((gx >= 0) & (gx < geom.width), 1, 0)
    delta = delta * (row_ok * col_ok) * rw(7)

    v0 = window.astype(jnp.int32)
    return jnp.clip(v0 + delta, cfg.lo_min, cfg.lo_max).astype(jnp.int8)


def _resident_cone_kernel(iw_ref, fw_ref, grid_ref, out_ref, vgrid, slab,
                          sem_g, sem_w, sem_o, *, geom: GridGeom,
                          cfg: MapConfig, tof, cone, nt: int):
    """Cone-mode twin of _resident_kernel.  iw_ref: SMEM i32
    [1, 1, 1, 128] (words 0-7 = r0a, c0a, cy, cx, do, sy, sx, en);
    fw_ref: SMEM f32 [1, 1, 1, 128] (see _pack_cone)."""
    t = pl.program_id(1)
    b = pl.program_id(0)

    def rw(w):
        return iw_ref[0, 0, 0, w]

    def fw(w):
        return fw_ref[0, 0, 0, w]

    @pl.when(t == 0)
    def _():
        cp = pltpu.make_async_copy(grid_ref.at[b], vgrid, sem_g)
        cp.start()
        cp.wait()

    @pl.when(rw(4) != 0)
    def _():
        _recenter_in_vmem(vgrid, rw(5), rw(6), geom)

    r0a = pl.multiple_of(rw(0), 8)
    c0a = pl.multiple_of(rw(1), 128)
    ry = rw(2) - geom.win_r
    rc = rw(3) - geom.win_r
    _windowed_update(vgrid, slab, sem_w, r0a, c0a, ry, rc, geom,
                     lambda comp: _cone_pass(comp, rw, fw, geom, cfg,
                                             tof, cone))

    @pl.when(t == nt - 1)
    def _():
        cp = pltpu.make_async_copy(vgrid, out_ref.at[b], sem_o)
        cp.start()
        cp.wait()


def pallas_replay_resident(frames: dict, cfg: PipelineConfig = UL_PROFILE,
                           geom: GridGeom = DEFAULT_GEOM,
                           interpret: bool | None = None,
                           mode: str = "exact", state0=None):
    """Whole-replay resident-grid kernel.  frames: dict of [B, T, ...]
    arrays (as replay_mapping_batched).  Returns (MappingState [B],
    outs [B, T]).  mode "exact" is bit-identical to the XLA replay /
    golden C model; mode "cone" is bit-identical to the XLA cone replay
    (the dense inverse-model production path).  state0 resumes a prior
    replay's MappingState (checkpoint-restart)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _check_vmem_fit(geom)
    # jit the whole pipeline: eager execution would dispatch the schedule
    # scan op-by-op (ruinous through a remote-TPU tunnel)
    return _replay_resident_jit(frames, cfg, geom, interpret, mode, state0)


def _check_vmem_fit(geom: GridGeom, limit_bytes: int = 4 << 20,
                    extra_bytes: int = 0):
    """The resident kernels keep one full padded grid in VMEM; refuse
    clearly for custom geometries that cannot fit (use the xla / mxu2 /
    per-step pallas kernels there).  extra_bytes: kernel-variant scratch
    beyond the grid (slab, double-buffered word scratch — see
    pallas_residentx._rx_scratch_bytes), so a geometry that only just
    fit the grid alone fails here with a clear message instead of at
    Mosaic compile (ADVICE round 4)."""
    need = geom.prows * geom.pcols + extra_bytes
    if need > limit_bytes:
        raise ValueError(
            f"resident kernel needs the padded grid in VMEM: "
            f"{geom.prows}x{geom.pcols} int8 + {extra_bytes/2**20:.2f} MiB "
            f"scratch = {need/2**20:.1f} MiB exceeds "
            f"the {limit_bytes/2**20:.0f} MiB budget; use kernel='xla' or "
            f"'mxu2' for this geometry")


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _replay_resident_jit(frames: dict, cfg: PipelineConfig, geom: GridGeom,
                         interpret: bool, mode: str = "exact", state0=None):
    from micro_quad_slam_tpu.replay.mapping import MappingState

    B, T = frames["x_m"].shape
    words, outs, (ox, oy, inited, filt) = _schedule(frames, cfg, geom,
                                                    mode, state0)

    if state0 is not None:
        grids = state0.grid
    else:
        grids = jnp.zeros((B, geom.prows, geom.pcols), jnp.int8)
    scratch = [
        pltpu.VMEM((geom.prows, geom.pcols), jnp.int8),
        pltpu.VMEM((geom.win_rows + _AWR_PAD, _AWC), jnp.int8),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if mode == "cone":
        from micro_quad_slam_tpu.ops.conemode import ConeConfig
        kernel = functools.partial(_resident_cone_kernel, geom=geom,
                                   cfg=cfg.map, tof=cfg.tof,
                                   cone=ConeConfig(), nt=T)
        in_specs = [
            pl.BlockSpec((1, 1, 1, 128), lambda b, t: (t, b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, 128), lambda b, t: (t, b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args = (*words, grids)
        alias = {2: 0}
    else:
        kernel = functools.partial(_resident_kernel, geom=geom,
                                   cfg=cfg.map, nt=T)
        in_specs = [
            pl.BlockSpec((1, 1, 8, 128), lambda b, t: (t, b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args = (words, grids)
        alias = {1: 0}
    grid_out = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(grids.shape, jnp.int8),
        scratch_shapes=scratch,
        input_output_aliases=alias,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*args)

    state = MappingState(grid=grid_out, origin_x=ox, origin_y=oy,
                         inited=inited, filt=filt)
    outs = {k: jnp.moveaxis(v, 0, 1) for k, v in outs.items()}
    return state, outs


def pallas_map_track(beams, x, y, yaw_deg, origin_x, origin_y,
                     cfg: PipelineConfig = UL_PROFILE,
                     geom: GridGeom = DEFAULT_GEOM,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Raster a full [B, T] pose track into fresh grids in ONE resident-
    kernel launch — the SLAM re-raster semantics (slam/pipeline._map_pass
    with match=False): every frame enabled, fixed per-flight origin, no
    recentering.  beams f32 [B, T, 4, 8]; x/y/yaw_deg f32 [B, T];
    origin_x/y f32 [B].  Bit-identical to scanning vmapped
    apply_scan_to_grid over T."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _check_vmem_fit(geom)
    return _map_track_jit(beams, x, y, yaw_deg, origin_x, origin_y,
                          cfg, geom, interpret)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _map_track_jit(beams, x, y, yaw_deg, origin_x, origin_y,
                   cfg: PipelineConfig, geom: GridGeom, interpret: bool):
    B, T = x.shape
    en = jnp.ones((B,), bool)
    words = jax.vmap(
        lambda b_, x_, y_, w_: _pack_rays(
            b_, x_, y_, w_, origin_x, origin_y, en, cfg.map, cfg.tof, geom),
        in_axes=(1, 1, 1, 1), out_axes=0,
    )(beams, x, y, yaw_deg)                    # [T, B, 8, 128] i32

    grids = jnp.zeros((B, geom.prows, geom.pcols), jnp.int8)
    kernel = functools.partial(_resident_kernel, geom=geom, cfg=cfg.map,
                               nt=T)
    return pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda b, t: (t, b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(grids.shape, jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((geom.prows, geom.pcols), jnp.int8),
            pltpu.VMEM((geom.win_rows + _AWR_PAD, _AWC), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(words, grids)
