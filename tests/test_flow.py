"""Pyramidal LK optical flow tests: sub-pixel accuracy, large shifts via
the pyramid, batching, quality gating, and the velocity conversion chain.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from micro_quad_slam_tpu.ops.flow import (
    flow_to_rates,
    lk_flow,
    lk_flow_batched,
    rates_to_velocity,
    render_ground_patch,
)


def _texture(seed=0, n=256):
    rng = np.random.default_rng(seed)
    # smooth random texture: random field blurred twice
    t = rng.normal(0, 1, (n, n))
    k = np.ones((5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view
    for _ in range(2):
        pad = np.pad(t, 2, mode="reflect")
        t = (sliding_window_view(pad, (5, 5)) * k).sum(axis=(-1, -2))
    return jnp.asarray(100.0 + 40.0 * t, jnp.float32)


@pytest.mark.parametrize("shift", [(0.0, 0.0), (0.6, -0.4), (2.3, 1.1),
                                   (-5.7, 3.9)])
def test_lk_recovers_shift(shift):
    tex = _texture()
    a = render_ground_patch(tex, 128.0, 128.0, 64)
    b = render_ground_patch(tex, 128.0 + shift[0], 128.0 + shift[1], 64)
    res = jax.jit(lk_flow)(a, b)
    assert abs(float(res.dx_px) - shift[0]) < 0.1, float(res.dx_px)
    assert abs(float(res.dy_px) - shift[1]) < 0.1, float(res.dy_px)
    assert float(res.quality) > 100


def test_lk_textureless_low_quality():
    a = jnp.full((64, 64), 50.0)
    b = jnp.full((64, 64), 50.0)
    res = lk_flow(a, b)
    assert float(res.quality) < 10


def test_lk_batched():
    tex = _texture(1)
    shifts = [(1.5, -0.5), (-2.0, 2.0), (0.0, 4.0)]
    a = jnp.stack([render_ground_patch(tex, 128.0, 128.0, 64)] * 3)
    b = jnp.stack([render_ground_patch(tex, 128.0 + s[0], 128.0 + s[1], 64)
                   for s in shifts])
    res = lk_flow_batched(a, b)
    for i, s in enumerate(shifts):
        assert abs(float(res.dx_px[i]) - s[0]) < 0.12
        assert abs(float(res.dy_px[i]) - s[1]) < 0.12


def test_flow_velocity_chain():
    # quad at 0.5 m moving 0.35 m/s, 30 fps camera, f=120 px:
    # px shift/frame = v/h * f * dt
    v, h, f, dt = 0.35, 0.5, 120.0, 1.0 / 30.0
    px = v / h * f * dt
    rx, ry = flow_to_rates(jnp.float32(px), jnp.float32(0.0), dt, f)
    vx, vy = rates_to_velocity(rx, ry, jnp.float32(h))
    assert abs(float(vx) - v) < 1e-5
    assert abs(float(vy)) < 1e-6


def test_lk_end_to_end_velocity():
    # simulate a moving camera over the texture and recover velocity
    tex = _texture(2)
    h, f, dt = 0.5, 100.0, 0.05
    v_true = (0.3, -0.2)  # m/s
    px = (v_true[0] / h * f * dt, v_true[1] / h * f * dt)
    a = render_ground_patch(tex, 100.0, 140.0, 64)
    b = render_ground_patch(tex, 100.0 + px[0], 140.0 + px[1], 64)
    res = lk_flow(a, b)
    rx, ry = flow_to_rates(res.dx_px, res.dy_px, dt, f)
    vx, vy = rates_to_velocity(rx, ry, jnp.float32(h))
    assert abs(float(vx) - v_true[0]) < 0.02
    assert abs(float(vy) - v_true[1]) < 0.02
