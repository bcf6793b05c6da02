"""Sub-pixel Fourier shifting of image batches (complex-pair arithmetic).

Replaces reference src/ptyrad/utils/image_proc.py:495-537 (imshift_batch): a
shift by (sy, sx) pixels is a linear phase ramp in k-space. Used for the
optimizable sub-pixel probe position shifts in the forward model.
"""

from __future__ import annotations

import jax.numpy as jnp

from ptyrad_tpu.ops.cplx import Cplx, expi
from ptyrad_tpu.ops.fourier import fft2, ifft2


def shift_grid(ny: int, nx: int) -> jnp.ndarray:
    """Signed-frequency grid (cycles/pixel), shape (2, Ny, Nx), corner layout.

    grid[0] = fftfreq(Ny), grid[1] = fftfreq(Nx), broadcast to 2D. Values lie
    in [-1/2, 1/2), so the phase ramp uses true signed frequencies with no
    Nyquist wraparound.
    """
    fy = jnp.fft.fftfreq(ny).astype(jnp.float32)
    fx = jnp.fft.fftfreq(nx).astype(jnp.float32)
    gy, gx = jnp.meshgrid(fy, fx, indexing="ij")
    return jnp.stack([gy, gx], axis=0)


def fourier_shift(img, shifts: jnp.ndarray, grid: jnp.ndarray | None = None) -> Cplx:
    """Shift `img` by a batch of sub-pixel displacements via k-space phase ramps.

    Args:
      img: Cplx or real array, (..., Ny, Nx). Broadcast over the batch of
        shifts.
      shifts: (B, 2) pixel shifts, each row (shift_y, shift_x); positive shifts
        move the image down/right.
      grid: optional precomputed shift_grid(Ny, Nx).

    Returns:
      Cplx of shape (B, ..., Ny, Nx). For real input take `.re`.

    Convention note: this uses the exact signed-frequency phase ramp
    w = exp(-2i*pi*(sy*fy + sx*fx)) (scipy.ndimage.fourier_shift convention):
    integer shifts reduce to exact rolls and real images stay real. The
    reference's imshift_batch (utils/image_proc.py:495-537) instead applies a
    [0,1) index ramp to the centered spectrum, which equals this result times
    a shift-dependent global phase exp(-i*pi*(sy+sx)); since probes enter the
    forward model through |FFT(psi)|^2, the two are loss- and
    gradient-equivalent.
    """
    return ifft2(fourier_shift_kspace(img, shifts, grid))


def fourier_shift_kspace(img, shifts: jnp.ndarray, grid: jnp.ndarray | None = None,
                         scale=None) -> Cplx:
    """The shifted SPECTRUM (fourier_shift without the final ifft2):
    fft2(img) times the phase ramp, (B, ..., Ny, Nx) corner layout.

    Used by the fused multislice kernel's probe_kspace mode: the final
    inverse transform runs inside the kernel (VMEM-resident, ~2-3x cheaper
    than the XLA DFT), so only the tiny shared-probe fft2 and the ramp
    stay outside — along with their autodiff, which keeps position-shift
    gradients exact with no custom adjoint.

    scale: optional real scalar folded into the ramp (e.g. sqrt(omode_occu)
    for the loss-folded kernel) — fuses into the existing elementwise ramp
    product instead of a separate (B, pmode, Ny, Nx) pass over the output."""
    if not isinstance(img, Cplx):
        img = jnp.asarray(img)
    ny, nx = img.shape[-2], img.shape[-1]
    ndim = img.ndim
    if grid is not None:
        gy, gx = grid[0], grid[1]
    else:
        g = shift_grid(ny, nx)
        gy, gx = g[0], g[1]

    # shifts -> (B, 2, 1...1) with ndim trailing singletons
    s = shifts.reshape(shifts.shape[0], 2, *([1] * ndim))
    sy, sx = s[:, 0], s[:, 1]  # (B, 1...1), ndim singletons
    # grids -> (1...1, Ny, Nx) broadcastable against (B, ..., Ny, Nx)
    gy = gy.reshape(*([1] * (ndim - 1)), ny, nx)
    gx = gx.reshape(*([1] * (ndim - 1)), ny, nx)

    w = expi(-2.0 * jnp.pi * (sx * gx + sy * gy))  # Cplx (B, 1..., Ny, Nx)
    if scale is not None:
        w = w * scale
    return fft2(img) * w
