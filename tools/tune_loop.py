"""Loop-closure accuracy harness (CPU): fig-8 revisit flight at a given
flow-scale drift -> tail error + wall IoU for the current SlamConfig
(plus optional key=value overrides, mqs-slam style).  The round-4
accuracy work iterates against this scenario (VERDICT round 3, ask 1:
tail err <= 5 cm AND wall IoU >= 0.85 at drift 1.12)."""
import dataclasses
import sys

import numpy as np

from micro_quad_slam_tpu.replay.fusion import fusion_arrays
from micro_quad_slam_tpu.replay.mapping import scanlog_to_arrays
from micro_quad_slam_tpu.ops.raycast import DEFAULT_GEOM as GEOM, logical_grid
from micro_quad_slam_tpu.sim import synth_room_scanlog
from micro_quad_slam_tpu.slam.pipeline import slam_replay
from micro_quad_slam_tpu.utils.config import UL_PROFILE
from micro_quad_slam_tpu.utils.obs import map_iou_vs_walls


def run(drift=1.12, seed=5, n_frames=160, overrides=()):
    room = (-2.5, -2.5, 2.5, 2.5)
    log = synth_room_scanlog(n_frames=n_frames, path="fig8",
                             path_radius_m=1.4, room=room, with_flow=True,
                             seed=seed)
    log.of_rate_x[:] *= drift
    log.of_rate_y[:] *= drift
    f = {**scanlog_to_arrays(log), **fusion_arrays(log)}
    frames = {k: v[None] for k, v in f.items()}

    slam = UL_PROFILE.slam
    kw = {}
    for ov in overrides:
        k, v = ov.split("=")
        cur = getattr(slam, k)
        if isinstance(cur, tuple):
            kw[k] = tuple(float(x) for x in v.split(","))
        elif isinstance(cur, bool):
            kw[k] = v in ("1", "true", "True")
        else:
            kw[k] = type(cur)(float(v))
    cfg = UL_PROFILE.replace(slam=dataclasses.replace(slam, **kw))

    res = slam_replay(frames, cfg, GEOM, 10, None)  # honor gn_iters overrides
    truth = np.stack([log.x_m, log.y_m], -1)
    odo_err = np.hypot(*(np.asarray(res.odo_track)[0, :, :2] - truth).T)
    slam_err = np.hypot(*(np.asarray(res.track)[0, :, :2] - truth).T)
    g_slam = np.asarray(logical_grid(res.grid))[0]
    iou = map_iou_vs_walls(g_slam, float(res.origin[0][0]),
                           float(res.origin[1][0]), room)
    print(f"drift={drift} seed={seed} overrides={dict(kw)}")
    print(f"  odo tail err : {odo_err[-20:].mean()*100:6.2f} cm")
    print(f"  slam tail err: {slam_err[-20:].mean()*100:6.2f} cm")
    print(f"  wall IoU     : {iou:.3f}")
    return slam_err[-20:].mean(), iou


if __name__ == "__main__":
    drift = float(sys.argv[1]) if len(sys.argv) > 1 else 1.12
    run(drift, overrides=sys.argv[2:])
