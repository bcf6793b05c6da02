"""Resampling ops: bilinear (intensity-conserving) and area downsampling.

Used for on-the-fly measurement resampling (reference models.py:407-409,
which bilinearly rescales diffraction patterns then divides by the product of
scale factors so integrated intensity is conserved) and for the loss_simlar
'area' downsample (reference losses.py:127,136).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_resize(x: jnp.ndarray, scale_factor: tuple[float, float]) -> jnp.ndarray:
    """Bilinear resize of the last two axes by (sy, sx), half-pixel centers.

    Matches torch F.interpolate(mode='bilinear', align_corners=False)
    conventions (jax.image.resize 'linear' uses the same half-pixel sampling).
    """
    sy, sx = scale_factor
    ny = int(round(x.shape[-2] * sy))
    nx = int(round(x.shape[-1] * sx))
    shape = (*x.shape[:-2], ny, nx)
    # antialias=False: torch's F.interpolate(mode='bilinear') does NOT
    # antialias, and jax.image.resize defaults to antialias=True when
    # downsampling — measured max abs diff 0.49 on unit-normal 16->8 data
    # vs 6e-8 with it off (reference models.py:407-409 parity)
    return jax.image.resize(x, shape, method="linear", antialias=False)


def bilinear_resize_conserve(x: jnp.ndarray, scale_factor: tuple[float, float]) -> jnp.ndarray:
    """Bilinear resize then divide by prod(scale) to conserve total intensity."""
    sy, sx = scale_factor
    return bilinear_resize(x, scale_factor) / jnp.asarray(sy * sx, dtype=x.dtype)


def area_downsample(x: jnp.ndarray, scale_factor: tuple[float, float]) -> jnp.ndarray:
    """Area (average-pool) downsample of the last two axes.

    For integer-reciprocal factors (e.g. 0.5 -> 2x pooling) uses an exact
    reshape-mean, identical to torch's 'area' mode; otherwise falls back to
    linear resize.
    """
    sy, sx = scale_factor
    inv_y, inv_x = 1.0 / sy, 1.0 / sx
    if abs(inv_y - round(inv_y)) < 1e-9 and abs(inv_x - round(inv_x)) < 1e-9:
        fy, fx = int(round(inv_y)), int(round(inv_x))
        ny, nx = x.shape[-2] // fy, x.shape[-1] // fx
        trimmed = x[..., : ny * fy, : nx * fx]
        pooled = trimmed.reshape(*x.shape[:-2], ny, fy, nx, fx)
        return pooled.mean(axis=(-3, -1))
    return bilinear_resize(x, scale_factor)
