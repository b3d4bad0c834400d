"""Resident-grid exact kernel v2: range-form membership + endpoint fix-up,
F frames per program.

Bit-identical to ops/raycast.py window_scan_update (and hence the golden C
model / uav_local_nav.c:241-306), restructured around measured facts about
the v1 resident kernel (ops/pallas_resident.py) on TPU v5e:

  *  the program launch floor is ~0.33 us/program, and per-frame work
     that is NOT proportional to ray count (one-hot scatter matmuls,
     the [R, R] pairwise block, the dynamic roll, block DMAs) costs
     several times the launch floor — so frames are processed in GROUPS
     of F per program, with ONE count surface, ONE pairwise block over
     the group's F*32 rays, ONE scatter, ONE roll per group;
  *  the XLA-side schedule must never materialize chained `.at[].set`
     updates of the word tensor, any [32, 32, T*B] pairwise tensor, or a
     [T*B, 32] table gather — the word blocks are laid out by ONE
     one-hot bf16 placement matmul on the MXU and the magic multipliers
     are recomputed exactly in-kernel (_magic_of).

Exactness of the merged group (same derivation as ops/raycast.py, over
the concatenated ray order of the group's frames):

  *  with lo_miss_end_dec == 0 semantics, a cell that is not a valid
     ray's endpoint anywhere in the group is monotone non-increasing
     through all F frames, so its exact sequentially-clamped value is
     max(v0 - free*count, LO_MIN) with count summed over the WHOLE group;
  *  an endpoint cell's exact final value is
     max(min(v0, lo_max - mx), lo_min - mn) + s, where s / mx / mn are
     the total and the prefix extrema of the cell's delta sequence over
     the group's rays in order — computed from one [R, R] pairwise block
     (R = F*32) with one inclusive-triangular matmul and sublane
     reductions.  Ray->cell membership uses the same closed-form
     Bresenham ranges as the count pass, with per-ray pose offsets
     (wx, wy) so frames with different pose cells coexist in one window.

A group takes this merged fast path when every frame's ray window fits
one [96, 128] lane window of one [96, 256] slab and no frame after the
first recenters; otherwise the kernel falls back to exact per-frame
processing (same primitives with 32-ray slices).  The schedule decides
per group and ships the decision in the aux words.

All window-domain results ride packed i32 bitfields through ONE roll per
group: W1 = cnt:10 | mask:1 | s+2048:12, W2 = mx:12 | -mn:12 (ranges
exact for <= 256 rays).  Scatter matmul operands are split into byte
pieces so every bf16 product is exact.

Frames with no valid rays skip their work behind scalar branches.
Bit-exactness vs the XLA path (and the golden C model) is asserted in
tests/test_pallas.py, recenters included; on-TPU parity is re-checked by
tools/check_all_tpu.py.
"""

from __future__ import annotations

import functools

import numpy as np
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
from micro_quad_slam_tpu.utils.config import MapConfig, PipelineConfig, TofConfig, UL_PROFILE

_MAGIC_SHIFT = 19
_INT_MIN = np.int32(-(2 ** 31))
GROUP_F = 8               # frames per program (static)

# Per-frame word block: f32 [32, 128] (the kernel converts to i32).
# Row params live at fixed rows, lanes 0..31; column params live at
# rows 0..31, one lane each, so the kernel gets [32, 1] columns by
# slicing — no transpose.  Aux scalars travel in a separate tiny i32
# SMEM tensor.  Every shipped value is within the bf16-exact integer
# range, so the one-hot placement matmul packs blocks exactly in plain
# bf16.
_R_DXS, _R_WX, _R_WY = 0, 1, 2
_R_EX, _R_EY = 6, 7
_C_DXS, _C_DY, _C_SX, _C_SY, _C_EX, _C_EY, _C_ED, _C_WX, _C_WY = \
    range(32, 41)

# aux lanes: per-frame octets f*8 + k, then a group header at F*8 + k
_A_R0A, _A_C0A, _A_CYS, _A_CXS, _A_DO, _A_RSY, _A_RSX, _A_ANY = range(8)
_G_FAST, _G_R0G, _G_C0G, _G_CWL, _G_ANY = range(5)


def _magic_table(max_d: int = 90, nmax: int = 4096) -> np.ndarray:
    """Per-divisor multipliers M with floor(n/D) == (n*M) >> 19 EXACT for
    all n in [0, nmax) (numerators here are < 2*44*44 + 88 < 4096).
    Validated exhaustively at import; re-asserted in tests."""
    mag = np.zeros(max_d, np.int32)
    n = np.arange(nmax, dtype=np.int64)
    for d in range(1, max_d):
        for m in (-(-(2 ** _MAGIC_SHIFT) // d), 2 ** _MAGIC_SHIFT // d + 1):
            if np.all((n * m) >> _MAGIC_SHIFT == n // d) and m * (nmax - 1) < 2 ** 31:
                mag[d] = m
                break
        else:  # pragma: no cover - would fail loudly at import
            raise AssertionError(f"no exact magic multiplier for divisor {d}")
    return mag


_MAGIC = _magic_table()


def _magic_of(d):
    """EXACT magic multiplier ceil(2^19 / d) for i32 d >= 1, branchless:
    one f32 divide + integer corrections (the f32 quotient is within 1 of
    the true floor, the multiplies stay far inside i32).  Bit-equal to
    _magic_table for every d in [1, 89] (asserted in tests/test_pallas).
    Computed IN-KERNEL on [R, 1] columns: a [T*B, 32] table gather in
    the schedule measured 95 ms — 70x the cost of these few ops."""
    q0 = (jnp.float32(2 ** _MAGIC_SHIFT) / d.astype(jnp.float32)).astype(jnp.int32)
    q0 = q0 - (q0 * d > 2 ** _MAGIC_SHIFT).astype(jnp.int32)
    mf = q0 + ((q0 + 1) * d <= 2 ** _MAGIC_SHIFT).astype(jnp.int32)
    return mf + (mf * d != 2 ** _MAGIC_SHIFT).astype(jnp.int32)


# ----------------------------------------------------------------------
# schedule side
# ----------------------------------------------------------------------

def _pack_words_x(beamsT, xT, yT, yawT, oxT, oyT, enabledT, doT, rsyT,
                  rsxT, cfg: MapConfig, tof: TofConfig, geom: GridGeom,
                  F: int = GROUP_F):
    """Vectorized schedule packer: all inputs [T, B] (beamsT
    [T, B, 4, 8]); T must be a multiple of F (callers pad with inert
    frames, see pad_frames_to_group).  Returns (aux i32 [g, B, 1, 8F+8],
    words f32 [g, B, F, 32, 128]) with g = T // F (see module
    layout)."""
    T, B = xT.shape
    assert T % F == 0, (T, F)
    g = T // F
    flat = lambda a: a.reshape((T * B,) + a.shape[2:])
    rays = jax.vmap(
        lambda b_, x_, y_, yaw_, ox_, oy_, en_: make_rays(
            b_, x_, y_, yaw_, ox_, oy_, en_, cfg, tof)
    )(flat(beamsT), flat(xT), flat(yT), flat(yawT), flat(oxT), flat(oyT),
      flat(enabledT))
    ex, ey = rays["ex"], rays["ey"]                      # i32 [TB, 32]
    val = rays["valid"]
    dx, dy = jnp.abs(ex), jnp.abs(ey)
    sx = jnp.where(ex > 0, 1, -1).astype(jnp.int32)
    sy = jnp.where(ey > 0, 1, -1).astype(jnp.int32)
    dxs = jnp.where(val, dx, -1)

    R = geom.win_r
    awc = 2 * geom.win_cols
    r0a = ((rays["pcy"] + geom.pad - R) // 8) * 8
    c0a = ((rays["pcx"] + geom.pad - R) // 128) * 128
    cy_s = rays["pcy"] + geom.pad - r0a                  # pose row in slab
    cx_s = rays["pcx"] + geom.pad - c0a                  # pose lane in slab

    anyv = val.any(axis=1).astype(jnp.int32)             # [TB]
    do_f = flat(doT).astype(jnp.int32)

    # --- group header: fast-path decision + group alignment -----------
    gview = lambda a: a.reshape(g, F, B)
    pcy, pcx = gview(rays["pcy"] + geom.pad), gview(rays["pcx"] + geom.pad)
    anyg = gview(anyv) != 0
    # group alignment from the lowest-aligned VALID frame (the fit
    # condition below validates whatever we pick)
    big = jnp.int32(1 << 20)
    r0g = jnp.min(jnp.where(anyg, gview(r0a), big), axis=1)       # [g, B]
    c0g = jnp.min(jnp.where(anyg, gview(c0a), big), axis=1)
    cyg = pcy - r0g[:, None]          # pose row in group slab  [g, F, B]
    cxg = pcx - c0g[:, None]          # pose lane in group slab
    rows_ok = (cyg >= R) & (cyg + R < geom.win_rows)
    mincx = jnp.min(jnp.where(anyg, cxg, big), axis=1)            # [g, B]
    maxcx = jnp.max(jnp.where(anyg, cxg, -big), axis=1)
    cwl = jnp.maximum(mincx - R, 0)                               # [g, B]
    lanes_ok = ((maxcx - mincx <= geom.win_cols - 2 * R - 1)
                & (mincx >= R) & (maxcx + R < awc)
                & (cwl <= geom.win_cols))    # rolled window must not wrap
    rows_all = jnp.all(rows_ok | ~anyg, axis=1)
    group_any = jnp.any(anyg, axis=1)
    no_late_rc = ~jnp.any(gview(do_f)[:, 1:] != 0, axis=1)
    fast = (rows_all & lanes_ok & no_late_rc & group_any).astype(jnp.int32)
    fast = jnp.where(group_any, fast, 1)   # empty groups: trivial fast

    # per-ray pose offsets in the group count window (fast path); the
    # fallback path substitutes win_r / cy_s in-kernel.  Clip keeps the
    # shipped values bf16-exact even when a garbage pose fails the fit
    # test (fast goes 0 then anyway).
    wx = jnp.clip(cxg - cwl[:, None], 0, 255).reshape(T * B)
    wy = jnp.clip(cyg, 0, 255).reshape(T * B)
    wx = jnp.broadcast_to(wx[:, None], (T * B, 32))
    wy = jnp.broadcast_to(wy[:, None], (T * B, 32))

    auxf = jnp.stack([r0a, c0a, cy_s, cx_s, do_f,
                      flat(rsyT), flat(rsxT), anyv], axis=-1)     # [TB, 8]
    auxf = jnp.moveaxis(auxf.reshape(g, F, B, 8), 1, 2).reshape(g, B, F * 8)
    z = jnp.zeros_like(fast)
    auxg = jnp.stack([fast, r0g, c0g, cwl,
                      group_any.astype(jnp.int32), z, z, z], axis=-1)
    aux = jnp.concatenate([auxf, auxg], axis=-1)[:, :, None, :]

    # --- word blocks: ONE one-hot placement matmul on the MXU ---------
    # (concat/pad/.at/select-chains all cost 10x+ more here — each
    # materializes or re-reads the multi-GB word tensor — while the
    # matmul writes it exactly once; every value is bf16-exact.)  The
    # (t, b) -> (g, b, f) regrouping happens on the SMALL params tensor;
    # transposing the 4+ GB output instead would cost more than the
    # whole kernel.
    bf = jnp.bfloat16
    params = jnp.concatenate(
        [a.astype(bf) for a in
         (dxs, dy, sx, sy, ex, ey, rays["end_delta"], wx, wy)],
        axis=-1)                                         # [TB, 288]
    params = jnp.moveaxis(params.reshape(g, F, B, 288), 1, 2)
    params = params.reshape(g * B * F, 288)
    w = lax.dot_general(params, jnp.asarray(_placement(), bf),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    return aux, w.reshape(g, B, F, 32, 128)


@functools.lru_cache(maxsize=1)
def _placement() -> np.ndarray:
    """One-hot [288, 4096] placement matrix: param-vector slot -> word
    slot(s) (row copies at fixed rows, lanes 0..31; column copies at
    rows 0..31, one lane each)."""
    dest = [(_R_DXS, _C_DXS), (None, _C_DY), (None, _C_SX), (None, _C_SY),
            (_R_EX, _C_EX), (_R_EY, _C_EY), (None, _C_ED),
            (_R_WX, _C_WX), (_R_WY, _C_WY)]
    P = np.zeros((9, 32, 32, 128), np.float32)
    for p, (r_idx, c_idx) in enumerate(dest):
        for i in range(32):
            if r_idx is not None:
                P[p, i, r_idx, i] = 1.0
            if c_idx is not None:
                P[p, i, i, c_idx] = 1.0
    return P.reshape(9 * 32, 4096)


def pad_frames_to_group(arrs, T: int, F: int = GROUP_F):
    """Pad [T, ...]-leading arrays with inert frames to a multiple of F
    (padded frames must carry enabled=False / do=False so they are
    no-ops).  Returns (padded arrays, pad count)."""
    padn = (-T) % F
    if padn == 0:
        return list(arrs), 0
    return [jnp.pad(a, ((0, padn),) + ((0, 0),) * (a.ndim - 1))
            for a in arrs], padn


# ----------------------------------------------------------------------
# kernel side: generic R-ray window update
# ----------------------------------------------------------------------

def _ray_ranges(wv2, wx_c, wy_c, geom: GridGeom):
    """Member-run bounds on the 128 window lanes for R rays at once:
    wv2 i32 [R, 128] stacked word rows; wx_c/wy_c i32 [R, 1] pose
    offsets in window coords.  Returns (lo_b, thr) i32 [R, 128] with
    member(row, lane) <=> rows - lo_b < thr (signed; INT_MIN bias)."""
    Rr = wv2.shape[0]
    c = lambda k: wv2[0:Rr, k:k + 1]                     # [R, 1] i32
    dxs, dy = c(_C_DXS), c(_C_DY)
    sx, sy = c(_C_SX), c(_C_SY)
    m = _magic_of(jnp.maximum(2 * dxs, 1))
    u = lax.broadcasted_iota(jnp.int32, (1, geom.win_cols), 1) - wx_c
    su = sx * u                                          # [R, 128]
    dm = jnp.maximum(2 * dxs, 1)
    e = 2 * dy
    # X-major: single member row per lane (closed-form Bresenham)
    q = (e * su + dxs) * m >> _MAGIC_SHIFT
    # Y-major: inverted interval  wlo <= w <= whi  (w = sy*(row-wy))
    nlo = jnp.maximum(e * su - dy, 0)
    wlo = (nlo + (dm - 1)) * m >> _MAGIC_SHIFT
    nhi = jnp.maximum(e * su + (e - 1 - dy), 0)
    whi = jnp.minimum(nhi * m >> _MAGIC_SHIFT, dy)
    vertical = dxs == 0              # [R, 1]: dy > 0 vertical ray
    wlo = jnp.where(vertical, 0, wlo)
    whi = jnp.where(vertical, dy, whi)
    xmaj = dxs >= dy
    lo_w = jnp.where(xmaj, q, wlo)
    hi_w = jnp.where(xmaj, q, whi)
    a = sy * lo_w + wy_c
    b = sy * hi_w + wy_c
    lo_v = jnp.minimum(a, b)
    hi_v = jnp.maximum(a, b)
    gate = (su >= 0) & (su <= dxs)   # dxs = -1 kills invalid rays
    # two-sided range as ONE signed compare via the INT_MIN bias:
    # (rows - lo) u< n  <=>  rows - (lo + INT_MIN)  s<  n + INT_MIN
    lo_b = lo_v + _INT_MIN
    thr = jnp.where(gate, hi_v - lo_v + 1 + _INT_MIN, _INT_MIN)
    return lo_b, thr


def _count_pass(wv2, wx_c, wy_c, geom: GridGeom):
    """Member-count accumulation on the [96, 128] window: per ray one
    subtract, one compare, one add."""
    lo_b, thr = _ray_ranges(wv2, wx_c, wy_c, geom)
    Rr = wv2.shape[0]
    rows_s = lax.broadcasted_iota(jnp.int32, (geom.win_rows, 1), 0)
    cnt = jnp.zeros((geom.win_rows, geom.win_cols), jnp.int32)
    for r in range(Rr):
        member = (rows_s - lo_b[r:r + 1, :]) < thr[r:r + 1, :]
        cnt = cnt + jnp.where(member, 1, 0)
    return cnt


def _pair_fixup(wv2, exa_r, eya_r, val_r, wx_c, wy_c, free: int,
                lo_min: int, lo_max: int):
    """Exact Skorokhod terms for every ray endpoint from one [R, R]
    all-i32 pairwise block (acting ray j on sublanes, endpoint i on
    lanes).  exa_r/eya_r [1, R]: endpoint cells in window coords;
    val_r [1, R] bool; wx_c/wy_c [R, 1] pose offsets.  Returns
    (yi_row, xi_col, s_row, mx_row, mn_row): endpoint window row [1, R]
    (keep-masked to 1000), window lane [R, 1] f32, and f32 rows with
    final_i = max(min(v0_i, lo_max - mx_i), lo_min - mn_i) + s_i.

    d[j, i] is ray j's delta at ray i's endpoint cell via the same
    closed-form membership the count pass uses (exact magic division, in
    ray j's pose-relative coordinates); prefix sums over the ray order
    come from one inclusive-triangular matmul, prefix extrema from
    sublane reductions (see ops/raycast.py's derivation)."""
    f32 = jnp.float32
    Rr = wv2.shape[0]
    c = lambda k: wv2[0:Rr, k:k + 1]                     # [R, 1] i32
    dxs_c, dy_c = c(_C_DXS), c(_C_DY)
    sx_c, sy_c = c(_C_SX), c(_C_SY)
    ed_c = c(_C_ED)
    exa_c = c(_C_EX) + wx_c
    eya_c = c(_C_EY) + wy_c
    m1_c = _magic_of(jnp.maximum(2 * dxs_c, 1))
    m2_c = _magic_of(jnp.maximum(2 * dy_c, 1))
    val_c = dxs_c >= 0

    kx = sx_c * (exa_r - wx_c)                           # [R, R] i32
    ky = sy_c * (eya_r - wy_c)
    xmaj = dxs_c >= dy_c
    q1 = (2 * kx * dy_c + dxs_c) * m1_c >> _MAGIC_SHIFT
    q2 = (2 * ky * dxs_c + dy_c) * m2_c >> _MAGIC_SHIFT
    ok_x = (kx >= 0) & (kx <= dxs_c) & xmaj & val_c
    ok_y = (ky >= 0) & (ky <= dy_c) & (~xmaj) & val_c
    member = (ok_x & (ky == q1)) | (ok_y & (kx == q2))
    is_end = (exa_c == exa_r) & (eya_c == eya_r) & val_c
    d = jnp.where(is_end, ed_c.astype(f32),
                  jnp.where(member, f32(-free), f32(0)))  # [R, R]

    jj = lax.broadcasted_iota(jnp.int32, (Rr, Rr), 0)
    ii = lax.broadcasted_iota(jnp.int32, (Rr, Rr), 1)
    tri = jnp.where(jj <= ii, f32(1), f32(0))            # inclusive prefix
    s_all = lax.dot_general(tri, d, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)  # [R(k), R(i)]
    s_row = s_all[Rr - 1:Rr, :]
    mx_row = jnp.maximum(jnp.max(s_all, axis=0, keepdims=True), f32(0))
    mn_row = jnp.minimum(jnp.min(s_all, axis=0, keepdims=True), f32(0))

    dup = jnp.any(is_end & val_r & (jj > ii), axis=0)[None, :]
    keep = val_r & ~dup
    yi_row = jnp.where(keep, eya_r, 1000)
    xi_col = exa_c.astype(f32)
    return yi_row, xi_col, s_row, mx_row, mn_row


def _fix_pass(wv2, exa_r, eya_r, val_r, wx_c, wy_c, cfg: MapConfig,
              geom: GridGeom):
    """Endpoint fix-up scatter on the [96, 128] window: returns
    (MASK, S, MX, MN) i32 — MASK != 0 marks valid-ray endpoint cells
    (deduped); there final = max(min(v0, lo_max-MX), lo_min-MN) + S — as
    independent one-hot matmuls.  Values can reach 6R+6, so each is
    split into byte pieces (products stay bf16-exact) and recombined."""
    yi_row, xi_col, s_row, mx_row, mn_row = _pair_fixup(
        wv2, exa_r, eya_r, val_r, wx_c, wy_c, cfg.lo_free_dec,
        cfg.lo_min, cfg.lo_max)
    f32 = jnp.float32
    Rr = wv2.shape[0]
    rows96 = lax.broadcasted_iota(jnp.int32, (geom.win_rows, 1), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (Rr, geom.win_cols),
                                 1).astype(f32)
    af = jnp.where(rows96 == yi_row, f32(1), f32(0))     # [96, R]
    m2f = jnp.where(lanes == xi_col, f32(1), f32(0))     # [R, 128]

    dot = lambda a: lax.dot_general(a, m2f, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
    sp = lambda v: (jnp.floor(v * f32(1 / 256)), v % f32(256))
    s_h, s_l = sp(s_row + f32(2048))
    mx_h, mx_l = sp(mx_row)
    mn_h, mn_l = sp(-mn_row)
    i32 = lambda a: a.astype(jnp.int32)
    mask = i32(dot(af))
    s_map = i32(dot(af * s_l)) + 256 * i32(dot(af * s_h)) - 2048
    mx_map = i32(dot(af * mx_l)) + 256 * i32(dot(af * mx_h))
    mn_map = -(i32(dot(af * mn_l)) + 256 * i32(dot(af * mn_h)))
    return mask, s_map, mx_map, mn_map


def _apply_rays(wv2, exa_r, eya_r, val_r, wx_c, wy_c, slab, cwl,
                cfg: MapConfig, geom: GridGeom):
    """Full window update for R rays on the [96, 256] aligned slab (in
    place): count + endpoint fix-up, packed into two i32 bitfield words
    (W1 = cnt:10 | mask:1 | s+2048:12; W2 = mx:12 | -mn:12 — ranges
    exact for R <= 256 rays) and moved to slab lane coordinates with ONE
    dynamic roll of the stacked [2*96, 256] pair.  cwl: window lane base
    within the slab (mask fields are positive, so the arithmetic >>
    unpacking stays exact)."""
    cnt = _count_pass(wv2, wx_c, wy_c, geom)
    mask, s_map, mx_map, mn_map = _fix_pass(wv2, exa_r, eya_r, val_r,
                                            wx_c, wy_c, cfg, geom)
    w1 = cnt | mask << 10 | (s_map + 2048) << 11
    w2 = mx_map | (-mn_map) << 12
    wr = geom.win_rows
    both = jnp.concatenate(
        [jnp.pad(w1, ((0, 0), (0, geom.win_cols))),
         jnp.pad(w2, ((0, 0), (0, geom.win_cols)))], axis=0)  # [192, 256]
    both = pltpu.roll(both, cwl, 1)
    w1r, w2r = both[0:wr], both[wr:2 * wr]

    slab0 = slab[...].astype(jnp.int32)
    cnt2 = w1r & 0x3FF
    s2 = ((w1r >> 11) & 0xFFF) - 2048
    mx2 = w2r & 0xFFF
    mn2 = -((w2r >> 12) & 0xFFF)
    base = jnp.maximum(slab0 - cnt2 * jnp.int32(cfg.lo_free_dec),
                       jnp.int32(cfg.lo_min))
    fix = (jnp.maximum(jnp.minimum(slab0, jnp.int32(cfg.lo_max) - mx2),
                       jnp.int32(cfg.lo_min) - mn2) + s2)
    out = jnp.where((w1r & 0x400) != 0, fix, base)
    slab[...] = out.astype(jnp.int8)


def _residentx_kernel(ws_ref, wv_ref, grid_ref, out_ref, vgrid, slab,
                      sem_g, sem_w, sem_o, *, geom: GridGeom,
                      cfg: MapConfig, ng: int, F: int):
    """ws_ref: SMEM i32 [1, 1, 1, 8F+8] (aux scalars); wv_ref: VMEM f32
    [1, 1, F, 32, 128] (word blocks; converted to i32 in-kernel);
    grid_ref/out_ref: ANY i8 [B, prows, pcols] (aliased); vgrid:
    resident VMEM grid; slab: VMEM i8 [96, 256] aligned window."""
    from micro_quad_slam_tpu.ops.pallas_resident import _recenter_in_vmem

    t = pl.program_id(1)
    b = pl.program_id(0)
    A = lambda f, k: ws_ref[0, 0, 0, 8 * f + k]
    G = lambda k: ws_ref[0, 0, 0, 8 * F + k]

    @pl.when(t == 0)
    def _():
        cp = pltpu.make_async_copy(grid_ref.at[b], vgrid, sem_g)
        cp.start()
        cp.wait()

    # frame-0 recenter applies before any of the group's rays (later-
    # frame recenters force the fallback path, which handles them inline)
    @pl.when(A(0, _A_DO) != 0)
    def _():
        _recenter_in_vmem(vgrid, A(0, _A_RSY), A(0, _A_RSX), geom)

    wr, wc = geom.win_rows, geom.win_cols
    awc = 2 * wc

    @pl.when((G(_G_FAST) != 0) & (G(_G_ANY) != 0))
    def _():
        r0g = pl.multiple_of(G(_G_R0G), 8)
        c0g = pl.multiple_of(G(_G_C0G), 128)
        cp = pltpu.make_async_copy(
            vgrid.at[pl.ds(r0g, wr), pl.ds(c0g, awc)], slab, sem_w)
        cp.start()
        cp.wait()
        wvi = wv_ref[0, 0].astype(jnp.int32)             # [F, 32, 128]
        wv2 = wvi.reshape(F * 32, 128)
        row = lambda r: jnp.concatenate(
            [wvi[f, r:r + 1, 0:32] for f in range(F)], axis=1)
        ex_r, ey_r = row(_R_EX), row(_R_EY)
        wx_r, wy_r = row(_R_WX), row(_R_WY)
        val_r = row(_R_DXS) >= 0
        _apply_rays(wv2, ex_r + wx_r, ey_r + wy_r, val_r,
                    wv2[:, _C_WX:_C_WX + 1], wv2[:, _C_WY:_C_WY + 1],
                    slab, G(_G_CWL), cfg, geom)
        cp = pltpu.make_async_copy(
            slab, vgrid.at[pl.ds(r0g, wr), pl.ds(c0g, awc)], sem_w)
        cp.start()
        cp.wait()

    @pl.when(G(_G_FAST) == 0)
    def _():
        for f in range(F):
            if f > 0:   # frame-0 recenter already applied above
                @pl.when(A(f, _A_DO) != 0)
                def _():
                    _recenter_in_vmem(vgrid, A(f, _A_RSY), A(f, _A_RSX),
                                      geom)

            @pl.when(A(f, _A_ANY) != 0)
            def _():
                r0a = pl.multiple_of(A(f, _A_R0A), 8)
                c0a = pl.multiple_of(A(f, _A_C0A), 128)
                cy_s = A(f, _A_CYS)
                cx_s = A(f, _A_CXS)
                cp = pltpu.make_async_copy(
                    vgrid.at[pl.ds(r0a, wr), pl.ds(c0a, awc)], slab,
                    sem_w)
                cp.start()
                cp.wait()
                wvi = wv_ref[0, 0, f].astype(jnp.int32)  # [32, 128]
                ones = jnp.ones((32, 1), jnp.int32)
                wx_c = ones * geom.win_r       # ignore shipped group wx/wy
                wy_c = ones * cy_s
                ex_r = wvi[_R_EX:_R_EX + 1, 0:32]
                ey_r = wvi[_R_EY:_R_EY + 1, 0:32]
                val_r = wvi[_R_DXS:_R_DXS + 1, 0:32] >= 0
                _apply_rays(wvi, ex_r + geom.win_r, ey_r + cy_s, val_r,
                            wx_c, wy_c, slab, cx_s - geom.win_r, cfg,
                            geom)
                cp = pltpu.make_async_copy(
                    slab, vgrid.at[pl.ds(r0a, wr), pl.ds(c0a, awc)],
                    sem_w)
                cp.start()
                cp.wait()

    @pl.when(t == ng - 1)
    def _():
        cp = pltpu.make_async_copy(vgrid, out_ref.at[b], sem_o)
        cp.start()
        cp.wait()


# ----------------------------------------------------------------------
# entry points
# ----------------------------------------------------------------------

def pallas_replay_residentx(frames: dict, cfg: PipelineConfig = UL_PROFILE,
                            geom: GridGeom = DEFAULT_GEOM,
                            interpret: bool | None = None, state0=None):
    """Whole-replay resident-grid kernel, v2 exact path.  Same contract as
    pallas_replay_resident(mode="exact"): frames dict of [B, T, ...]
    arrays; returns (MappingState [B], outs [B, T]); bit-identical to the
    XLA replay / golden C model, recenters and checkpoint-resume
    included."""
    from micro_quad_slam_tpu.ops.pallas_resident import _check_vmem_fit

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _check_vmem_fit(geom)
    return _replay_residentx_jit(frames, cfg, geom, interpret, state0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _replay_residentx_jit(frames: dict, cfg: PipelineConfig, geom: GridGeom,
                          interpret: bool, state0=None):
    from micro_quad_slam_tpu.ops.pallas_resident import _schedule
    from micro_quad_slam_tpu.replay.mapping import MappingState

    B, T = frames["x_m"].shape
    (aux, words), outs, (ox, oy, inited, filt) = _schedule(
        frames, cfg, geom, "exact2", state0)
    if state0 is not None:
        grids = state0.grid
    else:
        grids = jnp.zeros((B, geom.prows, geom.pcols), jnp.int8)

    grid_out = _residentx_call(aux, words, grids, cfg.map, geom,
                               interpret)
    state = MappingState(grid=grid_out, origin_x=ox, origin_y=oy,
                         inited=inited, filt=filt)
    outs = {k: jnp.moveaxis(v, 0, 1) for k, v in outs.items()}
    return state, outs


def _residentx_call(aux, words, grids, map_cfg: MapConfig, geom: GridGeom,
                    interpret: bool):
    """pallas_call wrapper shared by the replay and map-track entries.
    aux: i32 [g, B, 1, 8F+8]; words: f32 [g, B, F, 32, 128]; grids: i8
    [B, prows, pcols]."""
    B = grids.shape[0]
    g, F = words.shape[0], words.shape[2]
    kernel = functools.partial(_residentx_kernel, geom=geom, cfg=map_cfg,
                               ng=g, F=F)
    return pl.pallas_call(
        kernel,
        grid=(B, g),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 8 * F + 8), lambda b, t: (t, b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, F, 32, 128),
                         lambda b, t: (t, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(grids.shape, jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((geom.prows, geom.pcols), jnp.int8),
            pltpu.VMEM((geom.win_rows, 2 * geom.win_cols), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(aux, words, grids)


def pallas_map_track_x(beams, x, y, yaw_deg, origin_x, origin_y,
                       cfg: PipelineConfig = UL_PROFILE,
                       geom: GridGeom = DEFAULT_GEOM,
                       interpret: bool | None = None) -> jnp.ndarray:
    """v2 twin of pallas_map_track: raster a [B, T] pose track into fresh
    grids in one launch (the SLAM re-raster semantics -- every frame
    enabled, fixed origins, no recentering).  Bit-identical to scanning
    vmapped apply_scan_to_grid over T."""
    from micro_quad_slam_tpu.ops.pallas_resident import _check_vmem_fit

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _check_vmem_fit(geom)
    return _map_track_x_jit(beams, x, y, yaw_deg, origin_x, origin_y,
                            cfg, geom, interpret)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _map_track_x_jit(beams, x, y, yaw_deg, origin_x, origin_y,
                     cfg: PipelineConfig, geom: GridGeom, interpret: bool):
    B, T = x.shape
    sh = lambda a: jnp.moveaxis(a, 0, 1)                 # [B, T] -> [T, B]
    en = jnp.ones((T, B), bool)
    zi = jnp.zeros((T, B), jnp.int32)
    obt = jnp.broadcast_to(origin_x, (T, B))
    oyt = jnp.broadcast_to(origin_y, (T, B))
    args = [sh(beams), sh(x), sh(y), sh(yaw_deg), obt, oyt, en,
            zi != 0, zi, zi]
    # padded frames carry enabled=False -> all rays invalid -> inert
    args, _ = pad_frames_to_group(args, T)
    aux, words = _pack_words_x(*args, cfg.map, cfg.tof, geom)
    grids = jnp.zeros((B, geom.prows, geom.pcols), jnp.int8)
    return _residentx_call(aux, words, grids, cfg.map, geom, interpret)


def pallas_map_chunk(grids, beams, x, y, yaw_deg, origin_x, origin_y,
                     cfg: PipelineConfig = UL_PROFILE,
                     geom: GridGeom = DEFAULT_GEOM,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Apply [B, C] scans to EXISTING grids (map-track semantics: every
    frame enabled, fixed per-flight origins, no recentering), one pallas
    launch.  Bit-identical to scanning vmapped apply_scan_to_grid over C.
    Used by the SLAM pipeline's keyframe-chunked pass 1."""
    from micro_quad_slam_tpu.ops.pallas_resident import _check_vmem_fit

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _check_vmem_fit(geom)
    return _map_chunk_jit(grids, beams, x, y, yaw_deg, origin_x, origin_y,
                          cfg, geom, interpret)


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _map_chunk_jit(grids, beams, x, y, yaw_deg, origin_x, origin_y,
                   cfg: PipelineConfig, geom: GridGeom, interpret: bool):
    B, C = x.shape
    sh = lambda a: jnp.moveaxis(a, 0, 1)                 # [B, C] -> [C, B]
    en = jnp.ones((C, B), bool)
    zi = jnp.zeros((C, B), jnp.int32)
    obt = jnp.broadcast_to(origin_x, (C, B))
    oyt = jnp.broadcast_to(origin_y, (C, B))
    args = [sh(beams), sh(x), sh(y), sh(yaw_deg), obt, oyt, en,
            zi != 0, zi, zi]
    args, _ = pad_frames_to_group(args, C)
    aux, words = _pack_words_x(*args, cfg.map, cfg.tof, geom)
    return _residentx_call(aux, words, grids, cfg.map, geom, interpret)
