"""Explicit full-pose EKF: optical flow + rangefinder + attitude fusion.

The reference consumed a pose estimated ONBOARD the flight controller
(ArduPilot EKF3 fusing IMU + optical flow + rangefinder) via
LOCAL_POSITION_NED (uav_local_nav.c:1168-1195) — the estimator itself
lives in firmware outside the repo.  The rebuild brings that capability
inside the framework as an explicit, jittable EKF so pose tracks can be
*recomputed* from the raw logged sensor streams (scanrec carries flow
rates, quality, rangefinder and attitude — uav_local_nav.c:1522-1547) and
batched over thousands of replays.

Model (per quad, all float32, batched over any leading dims):

  state   s = [x, y, vx, vy, z, vz, yaw, wz]
          (world NED xy + up-positive altitude z, yaw in rad, wz rad/s;
          indices 0-3 deliberately match the historical 4-state layout)
  predict constant-velocity / constant-yaw-rate; P' = F P F^T + Q(dt)
  updates (each gated independently, Joseph-form covariance):
    yaw   <- logged ATTITUDE yaw as a direct measurement with a
             wrap-aware innovation (EKF3 fuses the AHRS quaternion;
             here the logged attitude stands in for it)
    z     <- rangefinder distance (DISTANCE_SENSOR orient 25 /
             RANGEFINDER, uav_local_nav.c:1197-1242)
    v_xy  <- flow-derived BODY-frame velocity z_b = flow_rate * ground
             (the reference's displacement convention, of_comp_m =
             integrated * ground, uav_local_nav.c:1159-1165), with the
             full measurement Jacobian h(s) = R(-yaw) [vx, vy]^T —
             including the d/dyaw column, so yaw uncertainty feeds the
             velocity gain instead of the logged yaw being trusted
             verbatim.

Measurement gating mirrors the reference's flow-quality thresholds
(quality >= 50, uav_local_nav.c:943): a bad-flow frame gets no velocity
update (pure dead-reckoning), exactly like EKF3 rejecting a bad flow
sample.  8x8 matrix algebra stays tiny; batched over B quads it maps to
batched matmuls XLA handles natively.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from micro_quad_slam_tpu.utils.config import EkfConfig

_F32 = np.float32
_N = 8
_IX, _IY, _IVX, _IVY, _IZ, _IVZ, _IYAW, _IWZ = range(_N)


class EkfState(NamedTuple):
    mean: jnp.ndarray   # f32 [..., 8]  (x, y, vx, vy, z, vz, yaw, wz)
    cov: jnp.ndarray    # f32 [..., 8, 8]


def ekf_init(batch: tuple = (), x0=0.0, y0=0.0, pos_var=1e-4,
             vel_var=1e-2, z0=0.0, yaw0=0.0, yaw_var=1e-2) -> EkfState:
    mean = jnp.zeros(batch + (_N,), jnp.float32)
    mean = mean.at[..., _IX].set(x0).at[..., _IY].set(y0)
    mean = mean.at[..., _IZ].set(z0).at[..., _IYAW].set(yaw0)
    cov = jnp.zeros(batch + (_N, _N), jnp.float32)
    for i in (_IX, _IY, _IZ):
        cov = cov.at[..., i, i].set(pos_var)
    for i in (_IVX, _IVY, _IVZ):
        cov = cov.at[..., i, i].set(vel_var)
    cov = cov.at[..., _IYAW, _IYAW].set(yaw_var)
    cov = cov.at[..., _IWZ, _IWZ].set(1e-2)
    return EkfState(mean, cov)


def _transition(dt):
    """F(dt) [..., 8, 8]: x+=vx dt, y+=vy dt, z+=vz dt, yaw+=wz dt."""
    dt = jnp.asarray(dt, jnp.float32)
    F = jnp.broadcast_to(jnp.eye(_N, dtype=jnp.float32),
                         dt.shape + (_N, _N))
    for pos, vel in ((_IX, _IVX), (_IY, _IVY), (_IZ, _IVZ), (_IYAW, _IWZ)):
        F = F.at[..., pos, vel].set(dt)
    return F


def ekf_predict(state: EkfState, dt, cfg: EkfConfig = EkfConfig()) -> EkfState:
    """Constant-velocity / constant-yaw-rate predict, dt-scaled noise."""
    dt = jnp.asarray(dt, jnp.float32)
    F = _transition(dt)
    mean = jnp.einsum("...ij,...j->...i", F, state.mean)
    qdiag = [cfg.q_pos, cfg.q_pos, cfg.q_vel, cfg.q_vel,
             cfg.q_pos, cfg.q_vz, cfg.q_yaw, cfg.q_wz]
    q = jnp.stack([jnp.broadcast_to(_F32(v) * dt, dt.shape)
                   for v in qdiag], axis=-1)
    Q = jnp.einsum("...i,ij->...ij", q, jnp.eye(_N, dtype=jnp.float32))
    cov = jnp.einsum("...ij,...jk,...lk->...il", F, state.cov, F) + Q
    return EkfState(mean, cov)


def flow_world_velocity(of_rate_x, of_rate_y, ground_m, yaw_rad):
    """Flow rates (rad/s) + ground distance -> world-frame velocity [..., 2].

    Body velocity = rate * ground (reference displacement convention,
    uav_local_nav.c:1159-1165), rotated to world by yaw."""
    vbx = of_rate_x * ground_m
    vby = of_rate_y * ground_m
    c, s = jnp.cos(yaw_rad), jnp.sin(yaw_rad)
    vwx = c * vbx - s * vby
    vwy = s * vbx + c * vby
    return jnp.stack([vwx, vwy], axis=-1)


def _joseph(cov, K, H, R):
    """(I - K H) P (I - K H)^T + K R K^T for H [..., m, n]."""
    eye = jnp.eye(_N, dtype=jnp.float32)
    IKH = eye - jnp.einsum("...im,...mj->...ij", K, H)
    KRK = jnp.einsum("...im,...mk,...jk->...ij",
                     K, R, K)
    return jnp.einsum("...ij,...jk,...lk->...il", IKH, cov, IKH) + KRK


def _update_scalar(state: EkfState, idx: int, innov, valid, r) -> EkfState:
    """Scalar measurement on state component idx with given innovation."""
    mean, cov = state.mean, state.cov
    r = jnp.asarray(r, jnp.float32)
    S = cov[..., idx, idx] + r
    K = cov[..., :, idx] / S[..., None]                       # [..., 8]
    new_mean = mean + K * innov[..., None]
    H = jnp.zeros(mean.shape[:-1] + (1, _N), jnp.float32)
    H = H.at[..., 0, idx].set(1.0)
    R = jnp.broadcast_to(r, mean.shape[:-1])[..., None, None]
    new_cov = _joseph(cov, K[..., None], H, R)
    v = valid[..., None]
    return EkfState(jnp.where(v, new_mean, mean),
                    jnp.where(valid[..., None, None], new_cov, cov))


def wrap_pi(a):
    """Wrap radians to [-pi, pi)."""
    two_pi = _F32(2.0 * np.pi)
    return a - two_pi * jnp.floor((a + _F32(np.pi)) / two_pi)


def ekf_update_yaw(state: EkfState, yaw_meas, valid, r_yaw) -> EkfState:
    """Attitude yaw as a direct measurement, wrap-aware innovation."""
    innov = wrap_pi(jnp.where(valid, yaw_meas, 0.0)
                    - state.mean[..., _IYAW])
    return _update_scalar(state, _IYAW, innov, valid, r_yaw)


def ekf_update_rangefinder(state: EkfState, rf_m, valid, r_rf) -> EkfState:
    """Rangefinder distance as a direct altitude measurement."""
    innov = jnp.where(valid, rf_m, 0.0) - state.mean[..., _IZ]
    return _update_scalar(state, _IZ, innov, valid, r_rf)


def ekf_update_velocity(state: EkfState, z_body, valid, r_vel) -> tuple:
    """Flow body-velocity update with the full EKF Jacobian.

    h(s) = R(-yaw) [vx, vy]^T; H has nonzero columns at (vx, vy, yaw).
    z_body: [..., 2] measured body velocity.  Returns (state, world-frame
    innovation [..., 2] for diagnostics)."""
    mean, cov = state.mean, state.cov
    r_vel = jnp.asarray(r_vel, jnp.float32)
    c = jnp.cos(mean[..., _IYAW])
    s = jnp.sin(mean[..., _IYAW])
    vx, vy = mean[..., _IVX], mean[..., _IVY]

    # h(s) and Jacobian rows
    hb = jnp.stack([c * vx + s * vy, -s * vx + c * vy], axis=-1)
    H = jnp.zeros(mean.shape[:-1] + (2, _N), jnp.float32)
    H = H.at[..., 0, _IVX].set(c).at[..., 0, _IVY].set(s)
    H = H.at[..., 1, _IVX].set(-s).at[..., 1, _IVY].set(c)
    # d/dyaw R(-yaw) v = [-s vx + c vy, -c vx - s vy]
    H = H.at[..., 0, _IYAW].set(-s * vx + c * vy)
    H = H.at[..., 1, _IYAW].set(-c * vx - s * vy)

    innov_b = z_body - hb
    PHt = jnp.einsum("...ij,...mj->...im", cov, H)            # [..., 8, 2]
    S = jnp.einsum("...mi,...ik->...mk", H, PHt) \
        + r_vel[..., None, None] * jnp.eye(2, dtype=jnp.float32)
    a = S[..., 0, 0]
    b = S[..., 0, 1]
    c2 = S[..., 1, 0]
    d = S[..., 1, 1]
    det = a * d - b * c2
    inv = jnp.stack([
        jnp.stack([d, -b], axis=-1),
        jnp.stack([-c2, a], axis=-1),
    ], axis=-2) / det[..., None, None]
    K = jnp.einsum("...im,...mk->...ik", PHt, inv)            # [..., 8, 2]

    new_mean = mean + jnp.einsum("...ij,...j->...i", K, innov_b)
    R = r_vel[..., None, None] * jnp.eye(2, dtype=jnp.float32)
    R = jnp.broadcast_to(R, mean.shape[:-1] + (2, 2))
    new_cov = _joseph(cov, K, H, R)

    v = valid[..., None]
    mean = jnp.where(v, new_mean, mean)
    cov = jnp.where(valid[..., None, None], new_cov, cov)
    # world-frame innovation for diagnostics (back-rotate)
    innov_w = jnp.stack([c * innov_b[..., 0] - s * innov_b[..., 1],
                         s * innov_b[..., 0] + c * innov_b[..., 1]],
                        axis=-1)
    return EkfState(mean, cov), jnp.where(v, innov_w, 0.0)


def ekf_step(
    state: EkfState,
    dt,
    of_rate_x, of_rate_y, of_q, ground_m, yaw_rad,
    cfg: EkfConfig = EkfConfig(),
):
    """One predict + (yaw, rangefinder, flow) update cycle from raw
    scanrec sensor fields.

    Gating: flow rates finite, quality >= cfg.min_flow_quality, ground
    distance finite and > cfg.min_ground_m (mirrors the reference's flow
    gates, uav_local_nav.c:942-944); the rangefinder fuses into z under
    the same freshness proxy; logged attitude yaw fuses whenever finite.
    Returns (state, diag dict)."""
    v_prev = state.mean[..., _IVX:_IVY + 1]
    state = ekf_predict(state, dt, cfg)

    yaw_ok = jnp.isfinite(yaw_rad)
    state = ekf_update_yaw(state, yaw_rad, yaw_ok, _F32(cfg.r_yaw))

    rf_ok = jnp.isfinite(ground_m) & (ground_m > _F32(cfg.min_ground_m)) \
        & (ground_m < _F32(10.0))
    state = ekf_update_rangefinder(state, ground_m, rf_ok, _F32(cfg.r_rf))

    valid = (
        jnp.isfinite(of_rate_x) & jnp.isfinite(of_rate_y)
        & (of_q >= cfg.min_flow_quality)
        & jnp.isfinite(ground_m) & (ground_m > _F32(cfg.min_ground_m))
    )
    z_body = jnp.stack([jnp.where(valid, of_rate_x * ground_m, 0.0),
                        jnp.where(valid, of_rate_y * ground_m, 0.0)],
                       axis=-1)
    state, innov = ekf_update_velocity(state, z_body, valid,
                                       _F32(cfg.r_flow_vel))
    # trapezoidal position refinement: the predict used the backward
    # velocity over [t-1, t]; upgrade the Euler increment to the
    # trapezoid 0.5*(v_prev + v_new)*dt.  When the update was gated off,
    # v_new == v_prev and this is a no-op.
    v_new = state.mean[..., _IVX:_IVY + 1]
    dt_arr = jnp.asarray(dt, jnp.float32)[..., None]
    corr = _F32(0.5) * (v_new - v_prev) * dt_arr
    mean = state.mean.at[..., _IX:_IY + 1].add(corr)
    state = EkfState(mean, state.cov)
    return state, {"flow_used": valid, "innovation": innov}
