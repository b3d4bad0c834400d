"""Checkpoint/resume for long batch jobs (SURVEY.md §5.4).

The reference has no program-state checkpointing — logs are append-mode
and the map is rebuilt in RAM after a restart (uav_local_nav.c:1483,1498).
The rebuild runs hours-long batched replays/sims, so full state
(grids, poses, EKF covariances, filters, behavior timers, RNG keys,
frame index) checkpoints via orbax with a plain-pytree fallback.
"""

from __future__ import annotations

import logging
import os
import pickle
import shutil
from typing import Any, Optional

import numpy as np
import jax

_log = logging.getLogger(__name__)


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, step: int = 0) -> str:
    """Save a pytree checkpoint.  Uses orbax when importable, else a
    pickle of host numpy arrays.  Returns the written path.

    Orbax runtime failures (disk-full, schema mismatch, ...) are logged
    loudly, the partial orbax directory is removed, and the save falls
    back to the pickle format so a single step never leaves both a
    partial `step_N/` and a `step_N.pkl` behind.
    """
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        ocp = None
    if ocp is not None:
        target = os.path.join(os.path.abspath(path), f"step_{step}")
        try:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(target, _to_host(state), force=True)
            ckptr.wait_until_finished()
            return target
        except Exception as exc:  # noqa: BLE001 - orbax runtime failure
            _log.error("orbax save of %s failed (%s); falling back to "
                       "pickle", target, exc)
            shutil.rmtree(target, ignore_errors=True)
    target = os.path.join(path, f"step_{step}.pkl")
    with open(target, "wb") as f:
        pickle.dump(_to_host(state), f)
    return target


def restore_checkpoint(target: str, like: Optional[Any] = None) -> Any:
    """Restore a checkpoint written by save_checkpoint.  `like` provides
    the pytree structure for orbax restores."""
    if target.endswith(".pkl"):
        with open(target, "rb") as f:
            return pickle.load(f)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(target), _to_host(like))
    return ckptr.restore(os.path.abspath(target))


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    best, best_key = None, (-1, -1)
    for name in sorted(os.listdir(path)):
        if name.startswith("step_"):
            try:
                step = int(name.split("_")[1].split(".")[0])
            except (IndexError, ValueError):
                continue
            # On a step tie prefer the orbax directory over the pickle
            # (save_checkpoint never leaves both, but be deterministic).
            fmt = 0 if name.endswith(".pkl") else 1
            if (step, fmt) > best_key:
                best, best_key = os.path.join(path, name), (step, fmt)
    return best
