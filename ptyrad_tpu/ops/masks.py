"""Circular masks with soft edges (sigmoid / Gaussian-blurred).

Parity with reference src/ptyrad/utils/math_ops.py:52-130. The sigmoid mask is
used by the probe k-space amplitude constraint and the kr object filter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def make_sigmoid_mask(
    npix: int,
    relative_radius: float = 2.0 / 3.0,
    relative_width: float = 0.2,
    center: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """2D circular mask falling from 1 to 0 through a sigmoid transition.

    The sigmoid hits 0.5 at radius npix*relative_radius/2; the transition
    takes roughly relative_width*npix pixels. Matches reference
    utils/math_ops.py:52-95 (sigmoid scaled by 10/scale).
    """
    if center is None:
        center = (npix // 2, npix // 2)
    ky = jnp.arange(npix, dtype=jnp.float32)
    kx = jnp.arange(npix, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ky, kx, indexing="ij")
    kr = jnp.sqrt((gy - center[0]) ** 2 + (gx - center[1]) ** 2)
    offset = npix * relative_radius / 2.0
    scale = relative_width * npix
    return 1.0 / (1.0 + jnp.exp((kr - offset) / scale * 10.0))


def make_gaussian_mask(
    npix: int,
    radius: float,
    std: float,
    center: Optional[Tuple[float, float]] = None,
) -> np.ndarray:
    """Binary circular mask blurred by a Gaussian (host-side NumPy)."""
    from scipy.ndimage import gaussian_filter

    if center is None:
        center = (npix / 2, npix / 2)
    y = np.arange(npix, dtype=np.float64)
    x = np.arange(npix, dtype=np.float64)
    gy, gx = np.meshgrid(y, x, indexing="ij")
    r = np.sqrt((gy - center[0]) ** 2 + (gx - center[1]) ** 2)
    circ = (r <= radius).astype(np.float64)
    return gaussian_filter(circ, sigma=std)
