"""Fresnel / angular-spectrum propagators (host-side NumPy initialization).

Parity with reference src/ptyrad/utils/physics.py:475-488 (near_field_evolution)
and src/ptyrad/models.py:152-185 (propagator k-grids).

The k-grid uses a half-bin shift so the exact zero frequency is avoided: with
an even N, (arange(-N//2, N//2) + 0.5)/N never hits 0, which keeps
sqrt(k^2 - Kx^2 - Ky^2) finite for every bin and makes the ASM propagator safe
to differentiate with respect to slice thickness.
"""

from __future__ import annotations

import numpy as np


def propagator_kgrid(npix_shape, dx: float):
    """Half-bin-shifted angular k-grids (corner-centered), returns (Ky, Kx).

    Each axis grid is 2*pi*((arange(-N//2, N//2)+0.5)/N)/dx, ifftshifted so the
    (near-)zero frequency sits at the corner, matching FFT layout.
    """
    ny, nx = npix_shape
    # lower bound is floor(-N/2) == -((N+1)//2), matching the reference's
    # arange(-N//2, N//2); for odd N the naive -(N//2) would shift by one bin
    ygrid = (np.arange(-((ny + 1) // 2), ny - (ny + 1) // 2) + 0.5) / ny
    xgrid = (np.arange(-((nx + 1) // 2), nx - (nx + 1) // 2) + 0.5) / nx
    ky = np.fft.ifftshift(2.0 * np.pi * ygrid / dx)
    kx = np.fft.ifftshift(2.0 * np.pi * xgrid / dx)
    Ky, Kx = np.meshgrid(ky, kx, indexing="ij")
    return Ky, Kx


def near_field_evolution(npix_shape, dx: float, dz: float, lambd: float) -> np.ndarray:
    """Angular-spectrum (ASM) propagator for one slice step of thickness dz.

    H = exp(i * dz * sqrt(k^2 - Kx^2 - Ky^2)), corner-centered (zero frequency
    at [0,0]); multiply in k-space between slices: psi <- ifft2(H * fft2(psi)).
    Equivalent to the paraxial exp(-i*pi*lambda*dz*k^2) for small angles.
    """
    Ky, Kx = propagator_kgrid(npix_shape, dx)
    k = 2.0 * np.pi / lambd
    kz = np.sqrt(k**2 - Kx**2 - Ky**2)
    return np.exp(1j * dz * kz).astype(np.complex64)
