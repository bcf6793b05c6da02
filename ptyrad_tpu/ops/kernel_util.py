"""Shared helpers for the Pallas TPU kernels (pallas_multislice, pallas_chain,
patches) — one home for the pieces that must stay in lockstep across kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ptyrad_tpu.ops.fourier import get_matmul_dtype, mark_matmul_dtype_traced

# Per-kernel VMEM ceiling passed to Mosaic. XLA's default *scoped* vmem limit
# is 16 MiB — well under the physical VMEM of current TPUs (v5e/v6e:
# 128 MiB) — and a kernel whose live set lands at 16.06 MiB fails compile by
# 64 KiB (observed on the mega chain backward). Each kernel module's
# _VMEM_BUDGET governs what its block planner actually asks for and must
# stay under this with headroom for Mosaic's own temporaries.
VMEM_LIMIT_BYTES = 96 * 1024 * 1024

# Raising the scoped limit changes Mosaic's scheduling even for kernels
# whose live set fits the 16 MiB default, and measures ~2-3% SLOWER on the
# tBL-scale fused multislice kernel (r4 A/B on-chip: 1.95 vs 1.99 ms
# fwd+bwd). Kernels whose modeled working set stays under this threshold
# therefore keep the default limit; only plans that genuinely need the
# headroom (the chain/mega kernels, large patch canvases) raise it.
_SMALL_KERNEL_BYTES = 14 * 1024 * 1024


def compiler_params(need_bytes: int | None = None):
    """Mosaic CompilerParams for a kernel whose modeled working set is
    `need_bytes` (None = unknown: raise the ceiling to be safe)."""
    from jax.experimental.pallas import tpu as pltpu

    if need_bytes is not None and need_bytes <= _SMALL_KERNEL_BYTES:
        return pltpu.CompilerParams()  # XLA's default scoped-vmem limit
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def gemm_dtype():
    """DFT-GEMM operand dtype at trace time (ops.fourier.set_matmul_dtype):
    bf16 operands with f32 accumulation, or plain f32."""
    mark_matmul_dtype_traced()
    return jnp.bfloat16 if get_matmul_dtype() == "bfloat16" else jnp.float32


def cpass(fr, fi, frpi, xr, xi, dt):
    """One transpose-free complex DFT pass: contract dim -2 of (M, N, N)
    against the (symmetric) DFT matrix, transformed axis appended last.
    Karatsuba 3-mult complex product ((fr, fi, fr+fi) constant triple);
    f32 accumulation via preferred_element_type."""
    def mm(v, mat):
        return jax.lax.dot_general(
            v.astype(dt), mat.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    t1 = mm(xr, fr)
    t2 = mm(xi, fi)
    t3 = mm(xr + xi, frpi)
    return t1 - t2, t3 - t1 - t2


def dft2_dense(xr, xi, mats, dt, scale=None):
    """2D DFT of (M, N, N) pairs with a dense (fr, fi, fr+fi) triple: two
    contract-dim--2 cpass applications; orientation is standard after the
    second pass. The radix-split variant (pallas_chain._dft2) must keep this
    two-pass / trailing-scale contract — change both together."""
    fr, fi, frpi = mats
    xr, xi = cpass(fr, fi, frpi, xr, xi, dt)
    xr, xi = cpass(fr, fi, frpi, xr, xi, dt)
    if scale is not None:
        xr, xi = xr * scale, xi * scale
    return xr, xi


def load_h(hr_ref, hi_ref, h_shared):
    """Propagator block load: (N, N) when shared, (blk, N, N) per-position."""
    if h_shared:
        return hr_ref[0], hi_ref[0]
    return hr_ref[...], hi_ref[...]


def load_h_scaled(hr_ref, hi_ref, h_shared, n):
    """Propagator load with the inverse DFT's 1/(N*N) normalization folded
    in: scaling the (tiny) propagator replaces two full-wavefield VPU
    multiplies per propagation. THE CONTRACT (shared by both kernel
    families): any dH cotangent a backward kernel accumulates is then
    w.r.t. the SCALED h — wrappers that expose dH must undo the fold with
    unscale_dh before returning it."""
    h_r, h_i = load_h(hr_ref, hi_ref, h_shared)
    inv_scale = np.float32(1.0 / (n * n))
    return h_r * inv_scale, h_i * inv_scale


def unscale_dh(dhr, dhi, n):
    """Map a dH cotangent taken w.r.t. the load_h_scaled propagator back to
    the caller's unscaled h (chain rule through h_scaled = h / (N*N))."""
    inv_scale = np.float32(1.0 / (n * n))
    return dhr * inv_scale, dhi * inv_scale


def tmul(psi_r, psi_i, tr, ti, blk, pc, n):
    """psi (blk*pc, N, N) times per-sample (blk, N, N) complex multiplier
    (transmission function or per-position propagator)."""
    pr = psi_r.reshape(blk, pc, n, n)
    pi = psi_i.reshape(blk, pc, n, n)
    outr = pr * tr[:, None] - pi * ti[:, None]
    outi = pr * ti[:, None] + pi * tr[:, None]
    return outr.reshape(blk * pc, n, n), outi.reshape(blk * pc, n, n)


def hmul(kr, ki, h_r, h_i, conj, blk, pc, n):
    """k-field times the propagator — h is (N, N) when shared or (blk, N, N)
    per-position (broadcast over the pmode chunk)."""
    hi = -h_i if conj else h_i
    if h_r.ndim == 2:
        return kr * h_r - ki * hi, kr * hi + ki * h_r
    return tmul(kr, ki, h_r, hi, blk, pc, n)
