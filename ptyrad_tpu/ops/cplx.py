"""Complex arithmetic as explicit (re, im) float32 pairs — the device-side
complex representation for the whole framework.

Rationale (TPU-first): TPUs have no complex ALU; XLA decomposes complex64
into real pairs during lowering, and experimental TPU backends (including the
one this framework targets) reject complex dtypes outright. Carrying the
decomposition explicitly in the program

  * keeps every operation a native f32 VPU/MXU op,
  * lets complex matrix products use the 3-multiplication (Karatsuba) form,
  * allows per-component precision choices (e.g. bf16 wavefields),
  * makes the same code run identically on CPU (tests) and TPU.

`Cplx` is a registered pytree dataclass with struct-of-arrays layout: two
separate float arrays rather than a trailing interleaved axis, so matmuls and
convolutions see contiguous (..., N, N) blocks.

This also subsumes the reference's torch.view_as_real NCCL workaround
(reference src/ptyrad/models.py:103): parameters are real pytrees natively.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

Scalar = Union[int, float]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Cplx:
    """A complex array as a pair of equally-shaped real arrays."""

    re: jax.Array
    im: jax.Array

    # -- shape/dtype plumbing -------------------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    def __getitem__(self, idx):
        return Cplx(self.re[idx], self.im[idx])

    def reshape(self, *shape):
        return Cplx(self.re.reshape(*shape), self.im.reshape(*shape))

    def astype(self, dtype):
        return Cplx(self.re.astype(dtype), self.im.astype(dtype))

    # -- arithmetic -----------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re + other.re, self.im + other.im)
        re = self.re + other
        # keep the re/im-equally-shaped invariant when `other` broadcasts
        return Cplx(re, jnp.broadcast_to(self.im, re.shape))

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re - other.re, self.im - other.im)
        re = self.re - other
        return Cplx(re, jnp.broadcast_to(self.im, re.shape))

    def __rsub__(self, other):
        return (-self).__add__(other)

    def __mul__(self, other):
        if isinstance(other, Cplx):
            return Cplx(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        return Cplx(self.re * other, self.im * other)  # real scalar/array

    def __rmul__(self, other):
        return self.__mul__(other)

    def __truediv__(self, other):
        if isinstance(other, Cplx):
            denom = other.re**2 + other.im**2
            return Cplx(
                (self.re * other.re + self.im * other.im) / denom,
                (self.im * other.re - self.re * other.im) / denom,
            )
        return Cplx(self.re / other, self.im / other)

    def __rtruediv__(self, other):
        # real / z = real * conj(z) / |z|^2
        denom = self.abs2()
        return Cplx(other * self.re / denom, -other * self.im / denom)

    def __neg__(self):
        return Cplx(-self.re, -self.im)

    def conj(self) -> "Cplx":
        return Cplx(self.re, -self.im)

    def abs2(self) -> jax.Array:
        """|z|^2 as a real array (no sqrt — preferred in intensity models)."""
        return self.re**2 + self.im**2

    def abs(self) -> jax.Array:
        return jnp.sqrt(self.abs2())

    def angle(self) -> jax.Array:
        return jnp.arctan2(self.im, self.re)

    def sum(self, axis=None, keepdims=False) -> "Cplx":
        return Cplx(
            jnp.sum(self.re, axis=axis, keepdims=keepdims),
            jnp.sum(self.im, axis=axis, keepdims=keepdims),
        )


# ---------------------------------------------------------------------------
# Constructors / converters
# ---------------------------------------------------------------------------

def from_numpy(arr: np.ndarray, dtype=jnp.float32) -> Cplx:
    """Host complex (or real) ndarray -> device Cplx pair."""
    arr = np.asarray(arr)
    return Cplx(
        jnp.asarray(np.real(arr), dtype=dtype),
        jnp.asarray(np.imag(arr), dtype=dtype),
    )


def to_numpy(z: Cplx) -> np.ndarray:
    """Device Cplx -> host complex64 ndarray."""
    return np.asarray(z.re) + 1j * np.asarray(z.im)


def zeros(shape, dtype=jnp.float32) -> Cplx:
    return Cplx(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def ones(shape, dtype=jnp.float32) -> Cplx:
    return Cplx(jnp.ones(shape, dtype), jnp.zeros(shape, dtype))


def polar(amplitude: jax.Array, phase: jax.Array) -> Cplx:
    """a * exp(i*phi) (the reference's torch.polar, forward.py:53)."""
    return Cplx(amplitude * jnp.cos(phase), amplitude * jnp.sin(phase))


def expi(phase: jax.Array) -> Cplx:
    """exp(i*phase) for real phase."""
    return Cplx(jnp.cos(phase), jnp.sin(phase))


def broadcast_to(z: Cplx, shape) -> Cplx:
    return Cplx(jnp.broadcast_to(z.re, shape), jnp.broadcast_to(z.im, shape))


def where(cond: jax.Array, a: Cplx, b: Cplx) -> Cplx:
    return Cplx(jnp.where(cond, a.re, b.re), jnp.where(cond, a.im, b.im))


def stack(zs, axis=0) -> Cplx:
    return Cplx(
        jnp.stack([z.re for z in zs], axis=axis),
        jnp.stack([z.im for z in zs], axis=axis),
    )


def concatenate(zs, axis=0) -> Cplx:
    return Cplx(
        jnp.concatenate([z.re for z in zs], axis=axis),
        jnp.concatenate([z.im for z in zs], axis=axis),
    )


def moveaxis(z: Cplx, src, dst) -> Cplx:
    return Cplx(jnp.moveaxis(z.re, src, dst), jnp.moveaxis(z.im, src, dst))


# ---------------------------------------------------------------------------
# Linear algebra
# ---------------------------------------------------------------------------

def matmul_const(fr: jax.Array, fi: jax.Array, frpi: jax.Array, x: Cplx, side: str = "left") -> Cplx:
    """Complex matmul against a constant matrix F = fr + i*fi using the
    3-real-multiplication (Karatsuba) decomposition.

    frpi must be the precomputed fr + fi. For y = F @ x:
        t1 = fr @ xr;  t2 = fi @ xi;  t3 = frpi @ (xr + xi)
        yr = t1 - t2;  yi = t3 - t1 - t2
    side='left'  contracts F with the second-to-last axis of x (rows),
    side='right' computes x @ F^T over the last axis (columns).
    Three MXU matmuls instead of four; the adds fuse into the epilogue.
    """
    if side == "left":
        def mm(mat, v):
            return jnp.einsum("jk,...kx->...jx", mat, v, preferred_element_type=jnp.float32)
    else:
        def mm(mat, v):
            return jnp.einsum("...yk,jk->...yj", v, mat, preferred_element_type=jnp.float32)

    t1 = mm(fr, x.re)
    t2 = mm(fi, x.im)
    t3 = mm(frpi, x.re + x.im)
    return Cplx(t1 - t2, t3 - t1 - t2)


def matmul(a: Cplx, b: Cplx) -> Cplx:
    """General complex matmul a @ b (both variable), 4 real matmuls."""
    rr = a.re @ b.re
    ii = a.im @ b.im
    ri = a.re @ b.im
    ir = a.im @ b.re
    return Cplx(rr - ii, ri + ir)


def eigh(z: Cplx):
    """Hermitian eigendecomposition via the real symmetric embedding.

    For Hermitian A = Ar + i*Ai (Ar symmetric, Ai antisymmetric), the real
    2n x 2n matrix M = [[Ar, -Ai], [Ai, Ar]] is symmetric with each eigenvalue
    of A doubled; ANY real eigenvector [x; y] of M maps to the complex
    eigenvector x + i*y of A.

    Degeneracy care: taking simply every second real eigenvector is only
    valid for simple spectra — inside a multiplicity-k eigenvalue's 2k-dim
    real eigenspace, jnp.linalg.eigh returns an arbitrary real-orthonormal
    basis whose every-other columns can be complex-linearly DEPENDENT
    (observed: V^H V with 0.66i off-diagonals for A with a doubled
    eigenvalue). Instead, each eigenvalue pair contributes the better of its
    TWO candidate columns after Gram-Schmidt against the accepted vectors
    (jit-safe select by residual norm). This is provably complete: if both
    candidates of a pair lay in the accepted span, the remaining columns
    could real-span at most 2k-2 of the eigenspace's 2k real dimensions —
    contradiction with eigh returning a full basis.

    Returns (eigenvalues (n,), eigenvectors Cplx (n, n) column-wise),
    ascending — the complex-free TPU substitute for jnp.linalg.eigh on
    complex input (used by probe-mode orthogonalization).
    """
    n = z.shape[-1]
    m = jnp.block([[z.re, -z.im], [z.im, z.re]])
    w, v = jnp.linalg.eigh(m)
    w_half = w[0::2]
    cand_re, cand_im = v[:n, :], v[n:, :]

    qs_re: list = []
    qs_im: list = []
    for j in range(n):
        best_r = best_i = best_norm = None
        for col in (2 * j, 2 * j + 1):
            ur, ui = cand_re[:, col], cand_im[:, col]
            for qr, qi in zip(qs_re, qs_im):
                # u -= q <q, u>  with <q, u> = conj(q) . u
                pr = qr @ ur + qi @ ui
                pi = qr @ ui - qi @ ur
                ur = ur - (qr * pr - qi * pi)
                ui = ui - (qr * pi + qi * pr)
            nrm = jnp.sqrt(ur @ ur + ui @ ui)
            if best_norm is None:
                best_r, best_i, best_norm = ur, ui, nrm
            else:
                take = nrm > best_norm
                best_r = jnp.where(take, ur, best_r)
                best_i = jnp.where(take, ui, best_i)
                best_norm = jnp.where(take, nrm, best_norm)
        scale = 1.0 / jnp.maximum(best_norm, jnp.asarray(1e-12, best_norm.dtype))
        qs_re.append(best_r * scale)
        qs_im.append(best_i * scale)
    return w_half, Cplx(jnp.stack(qs_re, axis=1), jnp.stack(qs_im, axis=1))
