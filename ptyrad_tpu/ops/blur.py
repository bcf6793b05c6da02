"""Separable Gaussian blurs (device-side, jnp).

Matches the sampled-Gaussian kernels used by the reference (torchvision
gaussian_blur with reflect padding for 2D, reference constraints.py:94-113;
replicate-padded 1D convolution for the z-direction blur, reference
utils/image_proc.py:443-455).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=64)
def _kernel_np(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_kernel_1d(size: int, sigma: float) -> jnp.ndarray:
    """Normalized 1D Gaussian kernel sampled at integer offsets."""
    return jnp.asarray(_kernel_np(int(size), float(sigma)))


def _conv_last_axis(x: jnp.ndarray, kernel: jnp.ndarray, pad_mode: str) -> jnp.ndarray:
    """Convolve the last axis of x with a 1D kernel under the given padding."""
    size = kernel.shape[0]
    lo = (size - 1) // 2
    hi = size - 1 - lo
    pad = [(0, 0)] * (x.ndim - 1) + [(lo, hi)]
    xp = jnp.pad(x, pad, mode=pad_mode)
    flat = xp.reshape(-1, 1, xp.shape[-1])  # (N, C=1, W)
    out = lax.conv_general_dilated(
        flat,
        kernel.reshape(1, 1, size).astype(x.dtype),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(*x.shape[:-1], x.shape[-1])


def gaussian_blur_1d(
    x: jnp.ndarray, kernel_size: int = 5, sigma: float = 0.5, pad_mode: str = "edge"
) -> jnp.ndarray:
    """Gaussian blur along the last axis with replicate ('edge') padding."""
    if sigma is None or sigma == 0:
        return x
    return _conv_last_axis(x, gaussian_kernel_1d(kernel_size, sigma), pad_mode)


def gaussian_blur_2d(
    x: jnp.ndarray, kernel_size: int = 5, sigma: float = 0.5, pad_mode: str = "reflect"
) -> jnp.ndarray:
    """Separable Gaussian blur over the last two axes with reflect padding.

    Accepts any leading batch shape; float32 input. XLA fuses the two 1D
    convolutions with surrounding elementwise work.
    """
    if sigma is None or sigma == 0:
        return x
    k = gaussian_kernel_1d(kernel_size, sigma)
    out = _conv_last_axis(x, k, pad_mode)  # blur x
    out = jnp.swapaxes(out, -1, -2)
    out = _conv_last_axis(out, k, pad_mode)  # blur y
    return jnp.swapaxes(out, -1, -2)
