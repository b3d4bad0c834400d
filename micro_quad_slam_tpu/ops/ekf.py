"""Explicit EKF: optical-flow velocity + position dead-reckoning fusion.

The reference consumed a pose estimated ONBOARD the flight controller
(ArduPilot EKF3 fusing IMU + optical flow + rangefinder) via
LOCAL_POSITION_NED (uav_local_nav.c:1168-1195) — the estimator itself
lives in firmware outside the repo.  The rebuild brings that capability
inside the framework as an explicit, jittable EKF so pose tracks can be
*recomputed* from the raw logged sensor streams (scanrec carries flow
rates, quality, rangefinder and attitude — uav_local_nav.c:1522-1547) and
batched over thousands of replays.

Model (per quad, all float32, batched over any leading dims):

  state   s = [x, y, vx, vy]  (world NED, m / m/s)
  predict s' = F s,  F = [[I, dt I], [0, I]];  P' = F P F^T + Q(dt)
  update  flow-derived world velocity measurement z = R(yaw) @ v_body,
          v_body = flow_rate * ground_distance  (the reference's own
          displacement convention: of_comp_m = integrated * ground,
          uav_local_nav.c:1159-1165), H = [0 I], Joseph-form covariance.

Measurement gating mirrors the reference's flow-quality thresholds
(quality >= 50, uav_local_nav.c:943): a bad-flow frame gets no velocity
update (pure dead-reckoning), exactly like EKF3 rejecting a bad flow
sample.  4x4 matrix algebra stays tiny; batched over B quads it maps to
batched matmuls XLA handles natively.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from micro_quad_slam_tpu.utils.config import EkfConfig

_F32 = np.float32


class EkfState(NamedTuple):
    mean: jnp.ndarray   # f32 [..., 4]  (x, y, vx, vy)
    cov: jnp.ndarray    # f32 [..., 4, 4]


def ekf_init(batch: tuple = (), x0=0.0, y0=0.0, pos_var=1e-4,
             vel_var=1e-2) -> EkfState:
    mean = jnp.zeros(batch + (4,), jnp.float32)
    mean = mean.at[..., 0].set(x0).at[..., 1].set(y0)
    cov = jnp.zeros(batch + (4, 4), jnp.float32)
    cov = cov.at[..., 0, 0].set(pos_var).at[..., 1, 1].set(pos_var)
    cov = cov.at[..., 2, 2].set(vel_var).at[..., 3, 3].set(vel_var)
    return EkfState(mean, cov)


def _transition(dt):
    """F(dt) [..., 4, 4] for the constant-velocity model."""
    dt = jnp.asarray(dt, jnp.float32)
    z = jnp.zeros_like(dt)
    o = jnp.ones_like(dt)
    return jnp.stack([
        jnp.stack([o, z, dt, z], axis=-1),
        jnp.stack([z, o, z, dt], axis=-1),
        jnp.stack([z, z, o, z], axis=-1),
        jnp.stack([z, z, z, o], axis=-1),
    ], axis=-2)


def ekf_predict(state: EkfState, dt, cfg: EkfConfig = EkfConfig()) -> EkfState:
    """Constant-velocity predict with dt-scaled process noise."""
    dt = jnp.asarray(dt, jnp.float32)
    F = _transition(dt)
    mean = jnp.einsum("...ij,...j->...i", F, state.mean)
    q = jnp.stack([
        jnp.broadcast_to(_F32(cfg.q_pos) * dt, dt.shape),
        jnp.broadcast_to(_F32(cfg.q_pos) * dt, dt.shape),
        jnp.broadcast_to(_F32(cfg.q_vel) * dt, dt.shape),
        jnp.broadcast_to(_F32(cfg.q_vel) * dt, dt.shape),
    ], axis=-1)
    Q = jnp.einsum("...i,ij->...ij", q, jnp.eye(4, dtype=jnp.float32))
    cov = jnp.einsum("...ij,...jk,...lk->...il", F, state.cov, F) + Q
    return EkfState(mean, cov)


def flow_world_velocity(of_rate_x, of_rate_y, ground_m, yaw_rad):
    """Flow rates (rad/s) + ground distance -> world-frame velocity [..., 2].

    Body velocity = rate * ground (reference displacement convention,
    uav_local_nav.c:1159-1165), rotated to world by yaw.
    """
    vbx = of_rate_x * ground_m
    vby = of_rate_y * ground_m
    c, s = jnp.cos(yaw_rad), jnp.sin(yaw_rad)
    vwx = c * vbx - s * vby
    vwy = s * vbx + c * vby
    return jnp.stack([vwx, vwy], axis=-1)


def ekf_update_velocity(
    state: EkfState, z_vel, valid, r_vel,
) -> tuple:
    """Joseph-form EKF update with H = [0 I] (velocity-only measurement).

    z_vel: [..., 2] measured world velocity; valid: [...] bool mask —
    invalid frames leave (mean, cov) untouched; r_vel: scalar or [...]
    measurement variance.  Returns (state, innovation [...,2]).
    """
    mean, cov = state.mean, state.cov
    r_vel = jnp.asarray(r_vel, jnp.float32)

    innov = z_vel - mean[..., 2:4]
    # S = H P H^T + R  (2x2, the velocity block)
    S = cov[..., 2:4, 2:4] + r_vel[..., None, None] * jnp.eye(2, dtype=jnp.float32)
    # K = P H^T S^-1  -> [..., 4, 2]; 2x2 inverse in closed form
    a = S[..., 0, 0]
    b = S[..., 0, 1]
    c = S[..., 1, 0]
    d = S[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack([
        jnp.stack([d, -b], axis=-1),
        jnp.stack([-c, a], axis=-1),
    ], axis=-2) / det[..., None, None]
    PHt = cov[..., :, 2:4]
    K = jnp.einsum("...ij,...jk->...ik", PHt, inv)

    new_mean = mean + jnp.einsum("...ij,...j->...i", K, innov)
    # Joseph form: (I - K H) P (I - K H)^T + K R K^T
    eye = jnp.eye(4, dtype=jnp.float32)
    KH = jnp.zeros(cov.shape, jnp.float32)
    KH = KH.at[..., :, 2:4].set(K)
    IKH = eye - KH
    new_cov = (
        jnp.einsum("...ij,...jk,...lk->...il", IKH, cov, IKH)
        + r_vel[..., None, None]
        * jnp.einsum("...ij,...kj->...ik", K, K)
    )

    v = valid[..., None]
    mean = jnp.where(v, new_mean, mean)
    cov = jnp.where(valid[..., None, None], new_cov, cov)
    return EkfState(mean, cov), jnp.where(v, innov, 0.0)


def ekf_step(
    state: EkfState,
    dt,
    of_rate_x, of_rate_y, of_q, ground_m, yaw_rad,
    cfg: EkfConfig = EkfConfig(),
):
    """One predict+update cycle from raw scanrec sensor fields.

    Gating: flow rates finite, quality >= cfg.min_flow_quality, ground
    distance finite and > cfg.min_ground_m (mirrors the reference's flow
    gates, uav_local_nav.c:942-944).  Returns (state, diag dict).
    """
    v_prev = state.mean[..., 2:4]
    state = ekf_predict(state, dt, cfg)
    valid = (
        jnp.isfinite(of_rate_x) & jnp.isfinite(of_rate_y)
        & (of_q >= cfg.min_flow_quality)
        & jnp.isfinite(ground_m) & (ground_m > _F32(cfg.min_ground_m))
        & jnp.isfinite(yaw_rad)
    )
    z = flow_world_velocity(
        jnp.where(valid, of_rate_x, 0.0),
        jnp.where(valid, of_rate_y, 0.0),
        jnp.where(valid, ground_m, 0.0),
        jnp.where(valid, yaw_rad, 0.0),
    )
    state, innov = ekf_update_velocity(state, z, valid, _F32(cfg.r_flow_vel))
    # trapezoidal position refinement: the predict used the backward
    # velocity over [t-1, t]; upgrade the Euler increment to the
    # trapezoid 0.5*(v_prev + v_new)*dt.  When the update was gated off,
    # v_new == v_prev and this is a no-op.
    v_new = state.mean[..., 2:4]
    dt_arr = jnp.asarray(dt, jnp.float32)[..., None]
    corr = _F32(0.5) * (v_new - v_prev) * dt_arr
    mean = state.mean.at[..., 0:2].add(corr)
    state = EkfState(mean, state.cov)
    return state, {"flow_used": valid, "innovation": innov}
