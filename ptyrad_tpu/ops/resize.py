"""Resampling ops: bilinear (intensity-conserving) and area downsampling.

Used for on-the-fly measurement resampling (reference models.py:407-409,
which bilinearly rescales diffraction patterns then divides by the product of
scale factors so integrated intensity is conserved) and for the loss_simlar
'area' downsample (reference losses.py:127,136).

Both resamplers are SEPARABLE MATMULS (y = Wy @ x @ Wx^T) with weight
matrices built host-side at trace time:
- exact torch semantics for ANY scale factor — torch maps coordinates with
  the PASSED scale factor (src = (dst+0.5)/s - 0.5), not the out/in ratio
  jax.image.resize uses, and its output size is floor(n*s);
- the contraction runs on the MXU instead of gather lanes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _out_size(n: int, s: float) -> int:
    # torch F.interpolate(scale_factor=s): output = floor(n * s). The
    # initializer (initialization.py meas_resample) and Geometry.dp_shape
    # must agree with this, or the resampled measurements disagree with the
    # probe/dp grid by one pixel for fractional parts >= 0.5.
    return int(math.floor(n * s))


def _linear_weights(n: int, out: int, scale: float) -> np.ndarray:
    """(out, n) bilinear weights, torch align_corners=False semantics with
    the passed scale factor and clamped (edge-replicate) borders."""
    w = np.zeros((out, n), np.float32)
    for i in range(out):
        src = max((i + 0.5) / scale - 0.5, 0.0)
        j0 = min(int(math.floor(src)), n - 1)
        j1 = min(j0 + 1, n - 1)
        t = src - j0
        w[i, j0] += 1.0 - t
        w[i, j1] += t
    return w


def _area_weights(n: int, out: int) -> np.ndarray:
    """(out, n) adaptive average-pool weights: window i covers input rows
    [floor(i*n/out), ceil((i+1)*n/out)) — exactly torch mode='area'
    (adaptive_avg_pool2d), including non-divisible sizes."""
    w = np.zeros((out, n), np.float32)
    for i in range(out):
        a = (i * n) // out
        b = -((-(i + 1) * n) // out)  # ceil division
        w[i, a:b] = 1.0 / (b - a)
    return w


def _apply_separable(x: jnp.ndarray, wy: np.ndarray, wx: np.ndarray) -> jnp.ndarray:
    wy = jnp.asarray(wy, dtype=x.dtype)
    wx = jnp.asarray(wx, dtype=x.dtype)
    return jnp.einsum("ab,...bc,dc->...ad", wy, x, wx)


def bilinear_resize(x: jnp.ndarray, scale_factor: tuple[float, float]) -> jnp.ndarray:
    """Bilinear resize of the last two axes by (sy, sx).

    Matches torch F.interpolate(mode='bilinear', align_corners=False) with a
    scale_factor argument bit-for-bit in its conventions: floor output size,
    coordinates mapped with the passed scale (NOT the out/in ratio), no
    antialiasing (measured parity ~1e-5 on unit-normal data incl.
    non-divisible sizes; reference models.py:407-409).
    """
    sy, sx = scale_factor
    ny, nx = _out_size(x.shape[-2], sy), _out_size(x.shape[-1], sx)
    if (ny, nx) == x.shape[-2:] and sy == 1.0 and sx == 1.0:
        return x
    return _apply_separable(
        x, _linear_weights(x.shape[-2], ny, sy), _linear_weights(x.shape[-1], nx, sx)
    )


def bilinear_resize_conserve(x: jnp.ndarray, scale_factor: tuple[float, float]) -> jnp.ndarray:
    """Bilinear resize then divide by prod(scale) to conserve total intensity."""
    sy, sx = scale_factor
    return bilinear_resize(x, scale_factor) / jnp.asarray(sy * sx, dtype=x.dtype)


def area_downsample(x: jnp.ndarray, scale_factor: tuple[float, float]) -> jnp.ndarray:
    """Area downsample of the last two axes: torch mode='area' = adaptive
    average pooling to floor(n*s), exact for non-divisible sizes too
    (reference losses.py:127,136 — each output pixel averages the adaptive
    window [floor(i*n/out), ceil((i+1)*n/out)))."""
    sy, sx = scale_factor
    ny, nx = _out_size(x.shape[-2], sy), _out_size(x.shape[-1], sx)
    return _apply_separable(
        x, _area_weights(x.shape[-2], ny), _area_weights(x.shape[-1], nx)
    )
