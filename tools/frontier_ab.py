"""Frontier-decision A/B: exact vs hybrid map (VERDICT round 3, weak 4).

The hybrid production mode fixes occupied cells bit-exactly (occ-IoU 1.0
vs the exact path) but its dense free-space carve diverges on FREE cells
(free-IoU floors ~0.60, tests/test_conemode.py) — and the reference's
frontier score is a 3-unknown + 1-free - 4-occupied count over exactly
those cells (frontier_score_dir, /root/reference/uav_local_nav.c:356-385).
This harness quantifies whether the divergence CHANGES BEHAVIOR: it
replays scenarios through both map updates simultaneously and compares,
tick for tick,

  * the EXPLORE tick's best frontier direction (argmax with the
    reference's F<R<L<B strict-greater tie order, uav_local_nav.c:2230-2243),
  * the EXPLORE->TURNING trigger predicate
    (best_dir != FRONT and best > front + frontier_side_margin)
    over the map-derived terms (the ToF side gates are map-independent
    and cancel in the A/B),
  * the TURNING direction choice (argmax of R/L/B scores with the same
    tie order; the ToF bias term is map-independent and omitted).

Both sides share poses, beams, and origin (fixed-origin replay; the
recenter path is map-content-independent).  Agreement is reported over
frames past a warmup (the first scans, where both maps are mostly
unknown and scores are all zero, would inflate agreement).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from micro_quad_slam_tpu.ops.beams import extract_beams
from micro_quad_slam_tpu.ops.conemode import hybrid_scan_update
from micro_quad_slam_tpu.ops.raycast import (DEFAULT_GEOM, apply_scan_to_grid,
                                             frontier_scores)
from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.utils.config import UL_PROFILE

GEOM = DEFAULT_GEOM
# reference query offsets: front, right, left, back (uav_local_nav.c:2230)
_OFFS = (0.0, -90.0, 90.0, 180.0)
D_FRONT, D_RIGHT, D_LEFT, D_BACK = range(4)


def _decide(scores, margin: int):
    """Reference decision terms from [.., 4] frontier scores (F, R, L, B):
    best_dir with the strict-greater tie order, the EXPLORE->TURNING
    map term, and the TURNING direction choice."""
    sF, sR, sL, sB = (scores[..., i] for i in range(4))
    best = jnp.maximum(jnp.maximum(sF, sR), jnp.maximum(sL, sB))
    best_dir = jnp.full(sF.shape, D_FRONT, jnp.int32)
    best_dir = jnp.where(sR > sF, D_RIGHT, best_dir)
    best_dir = jnp.where(sL > jnp.maximum(sF, sR), D_LEFT, best_dir)
    best_dir = jnp.where(sB > jnp.maximum(jnp.maximum(sF, sR), sL),
                         D_BACK, best_dir)
    fr_turn = (best_dir != D_FRONT) & (best > sF + margin)
    fdir = jnp.full(sF.shape, D_RIGHT, jnp.int32)
    fdir = jnp.where(sL > sR, D_LEFT, fdir)
    fdir = jnp.where(sB > jnp.maximum(sR, sL), D_BACK, fdir)
    return best_dir, fr_turn, fdir


import functools


@functools.partial(jax.jit, static_argnums=(1,))
def _ab_replay(frames: dict, cone=None):
    """Replay [B, T] frames through exact AND hybrid updates in one scan;
    returns per-frame frontier scores [B, T, 4] for both grids."""
    from micro_quad_slam_tpu.ops.conemode import ConeConfig
    if cone is None:
        cone = ConeConfig()
    cfg = UL_PROFILE
    B, T = frames["x_m"].shape
    beams, _ = extract_beams(frames["grid_mm"], cfg.tof)
    g0 = jnp.zeros((B, GEOM.prows, GEOM.pcols), jnp.int8)
    ox = frames["x_m"][:, 0]
    oy = frames["y_m"][:, 0]
    offs = np.asarray(_OFFS, np.float32)

    def step(carry, inp):
        ge, gh = carry
        b, x, y, yaw = inp
        en = jnp.ones((B,), bool)
        ge = jax.vmap(lambda gi, bb, xi, yi, wi, oxi, oyi, e:
                      apply_scan_to_grid(gi, bb, xi, yi, wi, oxi, oyi, e,
                                         cfg.map, cfg.tof, GEOM)
                      )(ge, b, x, y, yaw, ox, oy, en)
        gh = jax.vmap(lambda gi, bb, xi, yi, wi, oxi, oyi, e:
                      hybrid_scan_update(gi, bb, xi, yi, wi, oxi, oyi, e,
                                         cfg.map, cfg.tof, GEOM, cone)
                      )(gh, b, x, y, yaw, ox, oy, en)
        fs = lambda g: jax.vmap(
            lambda gi, xi, yi, wi, oxi, oyi: frontier_scores(
                gi, xi, yi, wi, offs, oxi, oyi, True, cfg.map, GEOM)
        )(g, x, y, yaw, ox, oy)
        return (ge, gh), (fs(ge), fs(gh))

    seq = (jnp.moveaxis(beams, 0, 1),
           jnp.moveaxis(frames["x_m"], 0, 1),
           jnp.moveaxis(frames["y_m"], 0, 1),
           jnp.moveaxis(frames["yaw_deg"], 0, 1))
    (_, _), (se, sh) = lax.scan(step, (g0, g0), seq)
    return jnp.moveaxis(se, 0, 1), jnp.moveaxis(sh, 0, 1)


def frontier_ab(frames: dict, warmup: int = 20, margin: int | None = None,
                cone=None):
    """-> dict of agreement fractions + mean |score delta| per direction."""
    margin = (UL_PROFILE.behavior.frontier_side_margin
              if margin is None else margin)
    se, sh = _ab_replay(frames, cone)
    se_w, sh_w = np.asarray(se)[:, warmup:], np.asarray(sh)[:, warmup:]
    be, te, fe = (np.asarray(v) for v in _decide(jnp.asarray(se_w), margin))
    bh, th, fh = (np.asarray(v) for v in _decide(jnp.asarray(sh_w), margin))
    # DECISIVE ticks: the exact map's best direction beats the runner-up
    # by more than one cell reclassification (|w_unknown - w_free| = 2
    # score points) — where the reference's own decision is not a
    # near-tie that a single probed cell flips
    s_sorted = np.sort(se_w, axis=-1)
    exact_margin = s_sorted[..., -1] - s_sorted[..., -2]
    dec = exact_margin > 2
    return {
        "best_dir_agree": float((be == bh).mean()),
        "best_dir_agree_decisive": float((be == bh)[dec].mean()),
        "decisive_frac": float(dec.mean()),
        "fr_turn_agree": float((te == th).mean()),
        "turning_dir_agree": float((fe == fh).mean()),
        "mean_abs_score_delta": float(np.abs(se_w - sh_w).mean()),
        "frames": int(be.size),
    }


def default_scenarios(T: int = 120):
    """The divergence-style scenarios: varied paths, an obstacle, noise
    and dropout (mirrors tests/test_conemode.py's suite shapes)."""
    specs = [
        dict(path="circle", seed=3, noise_mm=6.0, dropout_p=0.02),
        dict(path="fig8", seed=5, noise_mm=8.0, dropout_p=0.03),
        dict(path="hover", seed=7, yaw_rate_dps=40.0, noise_mm=5.0),
        dict(path="circle", seed=11, path_radius_m=1.6, noise_mm=10.0),
    ]
    logs = [synth_room_scanlog(n_frames=T, room=(-3, -2.5, 3, 2.5),
                               obstacles=[(1.0, -0.4, 1.8, 0.4)], **sp)
            for sp in specs]
    fr = [scanlog_to_arrays(lg) for lg in logs]
    return {k: np.stack([f[k] for f in fr]) for k in fr[0]}


if __name__ == "__main__":
    import sys
    from micro_quad_slam_tpu.ops.conemode import ConeConfig
    frames = default_scenarios()
    ws = ([float(w) for w in sys.argv[1:]]
          if len(sys.argv) > 1 else [0.0, 0.5, 0.7, 0.9])
    for w in ws:
        out = frontier_ab(frames, cone=ConeConfig(ray_match_w_cells=w))
        tag = "dense" if w == 0 else f"ray_match w={w}"
        print(f"--- hybrid carve: {tag} ---")
        for k, v in out.items():
            print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")
