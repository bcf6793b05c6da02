"""Fourier transforms as MXU matrix products, in real (re, im) arithmetic.

TPUs have no FFT hardware, and the targeted TPU backend lowers neither
jnp.fft.* nor complex dtypes. Both constraints dissolve with the same move:
the DFT of a small axis is a dense matrix product,

    FFT2(x) = F_y @ x @ F_x^T,

evaluated in real arithmetic with the 3-multiplication complex-product
decomposition (see ops/cplx.py). For the transform sizes that dominate
ptychography (64-256 pixels), the O(N^3) matmul form maps onto the 128x128
MXU systolic array and batches over (batch, pmode, omode) as one large GEMM —
on TPU this is faster than a VPU-executed O(N^2 log N) FFT would be, and it
is exactly differentiable.

The DFT matrices (F_re, F_im, F_re+F_im) are host-precomputed constants per
(N, direction), cached and closed over into jit.

Replaces torch.fft.fft2/ifft2 in the reference hot loop (src/ptyrad/
forward.py:63,79, src/ptyrad/utils/image_proc.py:524-532).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ptyrad_tpu.ops.cplx import Cplx, matmul_const

_MAX_DFT_N = 4096  # guard against accidentally huge dense DFTs

# DFT matmul input precision: 'float32' (exact) or 'bfloat16' (inputs cast to
# bf16, accumulation stays f32 via preferred_element_type — ~4x MXU rate on
# v5e at ~0.4% relative error per transform). Read at trace time; set before
# building jitted functions.
_MATMUL_DTYPE = "float32"
_MM_TRACED = False  # set when a jitted program reads _MATMUL_DTYPE at trace time


def set_matmul_dtype(dtype: str, silent: bool = False) -> None:
    """Select DFT matmul input precision: 'float32' or 'bfloat16'.

    Read at TRACE time only (same contract as pallas_chain.set_far_field):
    jitted programs built before the toggle keep the dtype they were traced
    with. Toggling after a program consumed the setting warns — rebuild the
    jitted closures or jax.clear_caches() for it to take effect. A/B
    harnesses that DO rebuild per toggle pass silent=True."""
    global _MATMUL_DTYPE
    if dtype not in ("float32", "bfloat16"):
        raise ValueError(f"Unsupported matmul dtype '{dtype}'")
    if dtype != _MATMUL_DTYPE and _MM_TRACED and not silent:
        import warnings

        warnings.warn(
            f"set_matmul_dtype('{dtype}') after a DFT program was already "
            f"traced: existing jitted programs keep '{_MATMUL_DTYPE}' — "
            "rebuild them (fresh closure) or jax.clear_caches() for the "
            "toggle to take effect",
            stacklevel=2,
        )
    _MATMUL_DTYPE = dtype


def mark_matmul_dtype_traced() -> None:
    """Record that a jitted program consumed the matmul-dtype switch (called
    from the trace-time read sites here and in ops.kernel_util)."""
    global _MM_TRACED
    _MM_TRACED = True


def get_matmul_dtype() -> str:
    return _MATMUL_DTYPE


@functools.lru_cache(maxsize=64)
def _dft_consts(n: int, inverse: bool):
    """(F_re, F_im, F_re + F_im) float32 for F[j,k] = exp(-+2i*pi*j*k/n)."""
    if n > _MAX_DFT_N:
        raise ValueError(f"Dense DFT of size {n} exceeds the {_MAX_DFT_N} guard")
    j = np.arange(n, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(j, j) / n
    if not inverse:
        phase = -phase
    fr = np.cos(phase).astype(np.float32)
    fi = np.sin(phase).astype(np.float32)
    return fr, fi, (fr + fi).astype(np.float32)


def _as_cplx(x) -> Cplx:
    if isinstance(x, Cplx):
        return x
    x = jnp.asarray(x)
    return Cplx(x, jnp.zeros_like(x))


def _gemm_and_out_dtype(x: Cplx, exact: bool = False):
    """(GEMM operand dtype, output dtype) for a DFT of x.

    bf16 INPUT (the compute_dtype=bfloat16 policy keeps the wavefield in
    bf16 between ops) stays bf16 on output so downstream elementwise math
    remains half-width; accumulation inside the matmul is always f32
    (preferred_element_type in matmul_const). f32 input follows the
    set_matmul_dtype switch for operands but always returns f32; exact=True
    pins f32 operands regardless of the global switch (used for the
    detector-plane transform under the bf16 policy, which feeds the data
    loss directly).
    """
    if x.dtype == jnp.bfloat16:
        return jnp.bfloat16, jnp.bfloat16
    if exact:
        return jnp.float32, jnp.float32
    mark_matmul_dtype_traced()
    return (jnp.bfloat16 if _MATMUL_DTYPE == "bfloat16" else jnp.float32), jnp.float32


def _dft_last_axis(x: Cplx, inverse: bool, exact: bool = False) -> Cplx:
    dt, out_dt = _gemm_and_out_dtype(x, exact)
    fr, fi, frpi = (jnp.asarray(m, dtype=dt) for m in _dft_consts(x.shape[-1], inverse))
    return matmul_const(fr, fi, frpi, x.astype(dt), side="right").astype(out_dt)


def _dft_row_axis(x: Cplx, inverse: bool, exact: bool = False) -> Cplx:
    dt, out_dt = _gemm_and_out_dtype(x, exact)
    fr, fi, frpi = (jnp.asarray(m, dtype=dt) for m in _dft_consts(x.shape[-2], inverse))
    return matmul_const(fr, fi, frpi, x.astype(dt), side="left").astype(out_dt)


def fft2(x, norm: str | None = None, exact: bool = False) -> Cplx:
    """2D DFT over the last two axes. Accepts Cplx or a real array.

    exact=True forces f32 GEMM operands for f32 inputs even when the
    global matmul dtype is bf16 (no effect on bf16 inputs)."""
    x = _as_cplx(x)
    out = _dft_last_axis(_dft_row_axis(x, False, exact), False, exact)
    if norm == "ortho":
        out = out * float(1.0 / np.sqrt(x.shape[-2] * x.shape[-1]))  # weak type: keeps bf16 bf16
    return out


def ifft2(x, norm: str | None = None) -> Cplx:
    """2D inverse DFT over the last two axes."""
    x = _as_cplx(x)
    out = _dft_last_axis(_dft_row_axis(x, True), True)
    if norm == "ortho":
        out = out * float(1.0 / np.sqrt(x.shape[-2] * x.shape[-1]))  # weak type: keeps bf16 bf16
    else:
        out = out * float(1.0 / (x.shape[-2] * x.shape[-1]))
    return out


def dft_axis(x: Cplx, axis: int, inverse: bool = False) -> Cplx:
    """DFT along one arbitrary axis (unnormalized forward, 1/N inverse)."""
    x = _as_cplx(x)
    moved = Cplx(jnp.moveaxis(x.re, axis, -1), jnp.moveaxis(x.im, axis, -1))
    out = _dft_last_axis(moved, inverse)
    if inverse:
        out = out * float(1.0 / x.shape[axis])
    return Cplx(jnp.moveaxis(out.re, -1, axis), jnp.moveaxis(out.im, -1, axis))


def fftn3(x, inverse: bool = False) -> Cplx:
    """3D DFT over the last three axes (kz-filter constraint)."""
    x = _as_cplx(x)
    out = dft_axis(x, -3, inverse)
    out = _dft_row_axis(out, inverse)
    out = _dft_last_axis(out, inverse)
    if inverse:
        out = out * float(1.0 / (x.shape[-2] * x.shape[-1]))
    return out


def fftshift2(x):
    """fftshift over the last two axes; works on Cplx and real arrays."""
    if isinstance(x, Cplx):
        return Cplx(fftshift2(x.re), fftshift2(x.im))
    return jnp.roll(x, (x.shape[-2] // 2, x.shape[-1] // 2), axis=(-2, -1))


def ifftshift2(x):
    """ifftshift over the last two axes (differs from fftshift for odd N)."""
    if isinstance(x, Cplx):
        return Cplx(ifftshift2(x.re), ifftshift2(x.im))
    return jnp.roll(x, (-(x.shape[-2] // 2), -(x.shape[-1] // 2)), axis=(-2, -1))


def mfft2(im: np.ndarray):
    """Periodic-plus-smooth decomposition FFT (Moisan), host-side NumPy.

    Reduces periodic boundary artifacts in FFTs of full-field images
    (reference utils/math_ops.py:28-50). Returns (P, S): FFTs of the periodic
    and smooth components, with fft2(im) = P + S.
    """
    rows, cols = im.shape
    s = np.zeros_like(im, dtype=np.float64)
    s[0, :] = im[0, :] - im[rows - 1, :]
    s[rows - 1, :] = -s[0, :]
    s[:, 0] += im[:, 0] - im[:, cols - 1]
    s[:, cols - 1] -= im[:, 0] - im[:, cols - 1]

    cx, cy = np.meshgrid(
        2 * np.pi * np.arange(cols) / cols, 2 * np.pi * np.arange(rows) / rows
    )
    denom = 2.0 * (2.0 - np.cos(cx) - np.cos(cy))
    denom[0, 0] = np.inf  # enforce zero mean
    S = np.fft.fft2(s) / denom
    P = np.fft.fft2(im) - S
    return P, S
