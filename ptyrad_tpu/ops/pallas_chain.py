"""Segmented multislice chain for workloads too large for the fused kernel.

The fused kernel (ops/pallas_multislice.py) keeps the ENTIRE wavefield chain
plus its backward rematerialization stack in VMEM — impossible once
nz*pmode*N^2 grows past ~16 MB (e.g. the reference's PSO demo: 21 slices,
256^2 patches, 4 probe modes; reference demo/params/PSO_reconstruct.yml,
forward.py:63 runs it through cuFFT with no such cliff). This module covers
that regime with a two-level checkpointing design, composed at the XLA level:

  psi0 -> [segment of Sg slices] -> psi1 -> [segment] -> ... -> exit wave

Each segment is ONE Pallas op (`chain_segment`) with a custom VJP:

  forward   T-multiply + angular-spectrum propagation for Sg slices, the
            wavefield resident in VMEM; psi enters/leaves through HBM
            ((B, pmode, N, N) pairs — ~0.2 ms/boundary at PSO scale vs a
            ~40 ms step, <2% overhead).
  backward  recomputes the segment's Sg wavefield states from the saved
            entry psi (segment-level rematerialization) and walks the chain
            in reverse: object-patch cotangents, entry-psi cotangents, and
            (need_dh) propagator cotangents.

Grid = (batch blocks, pmode chunks), pmode innermost: probe modes are
independent through the chain (they only meet in |FFT|^2 and in the
pmode-summed dT), so chunking pmode shrinks every VMEM buffer by
pmode/pc while the object-patch cotangent accumulates across the pm steps
in its (revisited, consecutive) output block. The transmission function
cos/sin is computed once per batch block (pm == 0) into scratch and reused.

The driver `multislice_dp_chain` unrolls the segments (same shapes -> one
compiled program reused), runs the final far-field transform INSIDE the tail
segment's kernel (far_field: dense fftshift-folded DFT matrices in VMEM, so
the intensity emerges centered in natural order), and is what
models/forward.py dispatches to when `fused_path_applicable` declines on
size. Probe-shift/shared-probe gradients flow through XLA's adjoint of
the psi0 construction; shared-H cotangents psum over a registered kernel
mesh exactly like the fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ptyrad_tpu.ops.cplx import Cplx
from ptyrad_tpu.ops.fourier import _dft_consts
from ptyrad_tpu.ops.kernel_util import (
    VMEM_LIMIT_BYTES as _VMEM_LIMIT_BYTES,
    compiler_params as _compiler_params,
    cpass as _cpass,
    gemm_dtype as _gemm_dtype,
    hmul as _mul_h,
    load_h_scaled as _load_h_scaled,
    tmul as _mul_t,
    unscale_dh as _unscale_dh,
)
from ptyrad_tpu.ops.mesh_env import DATA_AXIS, get_kernel_mesh, kernel_mesh_size

_INTERPRET = False

# Cooley-Tukey leaf size: DFTs of length R*M (R in {2,4}) factor into R
# M-point GEMMs plus an O(N) butterfly, cutting pass FLOPs by R while every
# GEMM stays a full (., 128)x(128, 128) MXU tile. 128 is both the MXU edge
# and the flagship patch size; tests shrink it to exercise the radix path on
# tiny shapes.
_RADIX_M = 128


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def set_radix_m(m: int) -> None:
    """Test hook: leaf size for the radix factorization (default 128)."""
    global _RADIX_M
    _RADIX_M = m


def _radix_of(n: int) -> int:
    """Radix R for an n-point pass: R M-point GEMMs replace one n-point GEMM
    when n = R*M with R in {2, 4}; 1 means dense."""
    if n % _RADIX_M == 0 and n // _RADIX_M in (2, 4):
        return n // _RADIX_M
    return 1


def radix_perm(n: int) -> np.ndarray:
    """Kernel k-space order -> natural order map for radix-R passes.

    A decimation-in-frequency pass emits [X[j::R] for j in range(R)]
    concatenated: kernel position p = j*M + r holds natural frequency
    k = R*r + j. Anything multiplied in k-space inside the kernel (the
    propagator H) must be pre-permuted with this map on both axes."""
    r = _radix_of(n)
    m = n // r
    p = np.arange(n)
    return (p % m) * r + p // m


@functools.lru_cache(maxsize=32)
def _radix_consts(n: int, m: int, inverse: bool):
    """Twiddle-folded M-point DFT matrices for one radix-R pass of length n.

    Forward (DIF): branch j multiplies the butterflied input u_j by
    F_j[p, r] = exp(-2i*pi*p*j/n) * exp(-2i*pi*p*r/m)  (twiddle on rows).
    Inverse: branch j multiplies X_j by
    C_j[r, p] = exp(+2i*pi*r*p/m) * exp(+2i*pi*p*j/n)  (twiddle on columns),
    followed by the output butterfly. Each complex matrix is returned as the
    (re, im, re+im) float32 triple of the 3-multiplication product."""
    r = n // m
    sign = 1.0 if inverse else -1.0
    p = np.arange(m, dtype=np.float64)
    base = np.exp(sign * 2j * np.pi * np.outer(p, p) / m)
    mats = []
    for j in range(r):
        tw = np.exp(sign * 2j * np.pi * p * j / n)
        fj = base * (tw[:, None] if not inverse else tw[None, :])
        fr = fj.real.astype(np.float32)
        fi = fj.imag.astype(np.float32)
        mats += [fr, fi, (fr + fi).astype(np.float32)]
    return tuple(mats)


def _consts(n: int):
    """All DFT constant matrices for one kernel: (list of jnp arrays, radix).
    Dense: 6 (n, n) mats [fwd 3, inv 3]. Radix-R: 6R (M, M) mats
    [fwd branch 0..R-1, inv branch 0..R-1], 3 per branch."""
    r = _radix_of(n)
    if r == 1:
        mats = list(_dft_consts(n, inverse=False)) + list(_dft_consts(n, inverse=True))
    else:
        m = n // r
        mats = list(_radix_consts(n, m, False)) + list(_radix_consts(n, m, True))
    return [jnp.asarray(a) for a in mats], r


@functools.lru_cache(maxsize=8)
def _ff_consts(n: int):
    """Dense far-field matrices for the in-kernel detector transform.

    fwd: F with fftshift folded into the OUTPUT index (columns — _cpass puts
    the transformed axis on mat columns), so the exit spectrum emerges dense,
    natural AND centered: no un-decimating gather/relayout, no XLA roll.
    adj: its real-pair VJP transpose conj(Fs)^T = roll(conj(F), n//2, rows).
    Dense costs 2x the radix pass MACs — for the ONE far-field DFT2 that is
    far cheaper than any lane permutation of the (B, N, N) intensity."""
    k = np.arange(n)
    F = np.exp(-2j * np.pi * np.outer(k, k) / n)
    Fs = np.roll(F, n // 2, axis=1)
    As = np.roll(F.conj(), n // 2, axis=0)
    out = []
    for M in (Fs, As):
        mr = M.real.astype(np.float32)
        mi = M.imag.astype(np.float32)
        out.append((mr, mi, (mr + mi).astype(np.float32)))
    return tuple(out)


def _bfly(parts, inverse):
    """Length-R DFT butterfly across R (re, im) pairs: y_j = sum_q x_q w^(qj),
    w = exp(-+2i*pi/R). R in {2, 4}; the R=4 roots are {1, -+i, -1, +-i}, so
    every term is an add/sub/component swap (no multiplies)."""
    if len(parts) == 2:
        (x0r, x0i), (x1r, x1i) = parts
        return [(x0r + x1r, x0i + x1i), (x0r - x1r, x0i - x1i)]
    (x0r, x0i), (x1r, x1i), (x2r, x2i), (x3r, x3i) = parts
    s02r, s02i = x0r + x2r, x0i + x2i
    d02r, d02i = x0r - x2r, x0i - x2i
    s13r, s13i = x1r + x3r, x1i + x3i
    d13r, d13i = x1r - x3r, x1i - x3i
    y0 = (s02r + s13r, s02i + s13i)
    y2 = (s02r - s13r, s02i - s13i)
    if not inverse:  # w = -i: y1 = d02 - i*d13, y3 = d02 + i*d13
        y1 = (d02r + d13i, d02i - d13r)
        y3 = (d02r - d13i, d02i + d13r)
    else:
        y1 = (d02r - d13i, d02i + d13r)
        y3 = (d02r + d13i, d02i - d13r)
    return [y0, y1, y2, y3]


def _pass(xr, xi, bundle, dt):
    """One DFT pass over axis 1 of (B, n, c), emitting (B, c, n).

    bundle = (mats, radix, inverse). Dense: one n-point complex GEMM.
    Radix-R: butterfly + R twiddle-folded M-point GEMMs (forward/DIF) or
    R GEMMs + butterfly (inverse/DIT); output k-order is decimated — see
    radix_perm. The forward pass is exactly multiply-by-F_n and the inverse
    exactly multiply-by-conj(F_n), so the adjoint role swap used by the
    backward kernel (transpose of F = unnormalized inverse) is unchanged."""
    mats, radix, inverse = bundle
    if radix == 1:
        return _cpass(mats[0], mats[1], mats[2], xr, xi, dt)
    m = xr.shape[1] // radix
    parts = [(xr[:, q * m:(q + 1) * m], xi[:, q * m:(q + 1) * m]) for q in range(radix)]
    if not inverse:
        parts = _bfly(parts, inverse=False)
        outs = [
            _cpass(mats[3 * j], mats[3 * j + 1], mats[3 * j + 2], pr, pi, dt)
            for j, (pr, pi) in enumerate(parts)
        ]
    else:
        outs = [
            _cpass(mats[3 * j], mats[3 * j + 1], mats[3 * j + 2], pr, pi, dt)
            for j, (pr, pi) in enumerate(parts)
        ]
        outs = _bfly(outs, inverse=True)
    return (
        jnp.concatenate([o[0] for o in outs], axis=-1),
        jnp.concatenate([o[1] for o in outs], axis=-1),
    )


def _dft2(xr, xi, bundle, dt, scale=None):
    # radix-split twin of kernel_util.dft2_dense — same two-pass /
    # trailing-scale contract; change both together
    xr, xi = _pass(xr, xi, bundle, dt)
    xr, xi = _pass(xr, xi, bundle, dt)
    if scale is not None:
        xr, xi = xr * scale, xi * scale
    return xr, xi


def _bundles(mat_refs, radix):
    """Split the flat matrix-ref list into (fwd, inv) _dft2 bundles."""
    vals = [r[...] for r in mat_refs]
    half = len(vals) // 2
    return (vals[:half], radix, False), (vals[half:], radix, True)


def _seg_fwd_kernel(sg, n, pc, blk, last, far_field, h_shared, dt, radix,
                    n_mats,
                    pr_ref, pi_ref, a_ref, p_ref, hr_ref, hi_ref,
                    *refs):
    """One (batch block, pmode chunk) step: Sg T-mult/propagate slices.

    far_field (static, requires last): the chain-final segment also applies
    the UNNORMALIZED forward DFT2 to the detector plane in VMEM via the
    dense fftshift-folded matrices (_ff_consts) — the exit is the centered
    far-field spectrum in NATURAL order, saving the XLA dense-DFT pair, the
    fftshift roll, and an exit-wavefield HBM round trip. The caller folds
    the ortho 1/(N*N) into the intensity (multislice_dp_chain)."""
    if far_field:
        mats, ff, (or_ref, oi_ref, tr_scr, ti_scr) = (
            refs[:n_mats], refs[n_mats:n_mats + 3], refs[n_mats + 3:])
        ff_bundle = ([r[...] for r in ff], 1, False)
    else:
        mats, (or_ref, oi_ref, tr_scr, ti_scr) = refs[:n_mats], refs[n_mats:]
    pm = pl.program_id(1)
    fwd, inv = _bundles(mats, radix)
    h_r, h_i = _load_h_scaled(hr_ref, hi_ref, h_shared, n)

    @pl.when(pm == 0)
    def _():
        # transmission cos/sin once per batch block, reused by later pm steps
        tr_scr[...] = a_ref[...] * jnp.cos(p_ref[...])
        ti_scr[...] = a_ref[...] * jnp.sin(p_ref[...])

    psi_r, psi_i = pr_ref[...].reshape(blk * pc, n, n), pi_ref[...].reshape(blk * pc, n, n)
    for s in range(sg):
        psi_r, psi_i = _mul_t(psi_r, psi_i, tr_scr[:, s], ti_scr[:, s], blk, pc, n)
        if not (last and s == sg - 1):
            kr, ki = _dft2(psi_r, psi_i, fwd, dt)
            kr, ki = _mul_h(kr, ki, h_r, h_i, False, blk, pc, n)
            psi_r, psi_i = _dft2(kr, ki, inv, dt)
    if far_field:
        psi_r, psi_i = _dft2(psi_r, psi_i, ff_bundle, dt)
    or_ref[...] = psi_r.reshape(blk, pc, n, n)
    oi_ref[...] = psi_i.reshape(blk, pc, n, n)


def _seg_bwd_kernel(sg, n, pc, blk, last, far_field, h_shared, need_dh, dt,
                    radix, n_mats,
                    gr_ref, gi_ref, pr_ref, pi_ref, a_ref, p_ref, hr_ref, hi_ref,
                    *refs):
    """Segment-level rematerialization: rebuild the Sg entry states from the
    saved segment-entry psi, then reverse the chain (adjoint DFT rule: the
    transpose of multiply-by-F_fwd is the unnormalized inverse matrices;
    the transpose of the scaled inverse pass is F_fwd * 1/(N*N) — both hold
    for the radix passes too, layout included; see _pass)."""
    mats, rest = refs[:n_mats], refs[n_mats:]
    if far_field:
        # adjoint triple of the fftshift-folded far-field DFT (_ff_consts)
        ff, rest = rest[:3], rest[3:]
        ff_adj = ([r[...] for r in ff], 1, False)
    if need_dh:
        da_ref, dp_ref, dpr_ref, dpi_ref, dhr_ref, dhi_ref = rest
    else:
        # no propagator cotangents requested: the dH outputs do not exist at
        # all (the driver returns zeros), saving their VMEM blocks
        da_ref, dp_ref, dpr_ref, dpi_ref = rest
        dhr_ref = dhi_ref = None
    i = pl.program_id(0)
    pm = pl.program_id(1)
    fwd, inv = _bundles(mats, radix)
    h_r, h_i = _load_h_scaled(hr_ref, hi_ref, h_shared, n)

    def t_of(s):
        # transmission cos/sin recomputed per use — a few VPU transcendentals
        # per slice vs keeping a (blk, sg, n, n) scratch pair resident
        return a_ref[:, s] * jnp.cos(p_ref[:, s]), a_ref[:, s] * jnp.sin(p_ref[:, s])

    # forward recompute: entry state of every slice in this segment
    psi_r, psi_i = pr_ref[...].reshape(blk * pc, n, n), pi_ref[...].reshape(blk * pc, n, n)
    stack = []
    for s in range(sg):
        stack.append((psi_r, psi_i))
        if s < sg - 1:
            psi_r, psi_i = _mul_t(psi_r, psi_i, *t_of(s), blk, pc, n)
            kr, ki = _dft2(psi_r, psi_i, fwd, dt)
            kr, ki = _mul_h(kr, ki, h_r, h_i, False, blk, pc, n)
            psi_r, psi_i = _dft2(kr, ki, inv, dt)

    dchi_r = gr_ref[...].reshape(blk * pc, n, n)
    dchi_i = gi_ref[...].reshape(blk * pc, n, n)
    if far_field:
        # adjoint of the exit's unnormalized shift-folded forward DFT2
        dchi_r, dchi_i = _dft2(dchi_r, dchi_i, ff_adj, dt)
    if not last:
        # cotangent arrives at the segment EXIT, i.e. after the trailing
        # propagation of slice sg-1: undo that adjoint first
        ur, ui = _dft2(dchi_r, dchi_i, fwd, dt)
        if need_dh:
            czr, czi = _mul_t(*stack[sg - 1], *t_of(sg - 1), blk, pc, n)
            kzr, kzi = _dft2(czr, czi, fwd, dt)
            _acc_dh(ur, ui, kzr, kzi, dhr_ref, dhi_ref, h_shared, i, pm,
                    blk, pc, n, first=True)
        ur, ui = _mul_h(ur, ui, h_r, h_i, True, blk, pc, n)
        dchi_r, dchi_i = _dft2(ur, ui, inv, dt)
        first_dh = False
    else:
        first_dh = True

    for s in range(sg - 1, -1, -1):
        psi_r, psi_i = stack[s]
        # one cos/sin per slice, shared by the transmission adjoint and dT
        cosp = jnp.cos(p_ref[:, s])
        sinp = jnp.sin(p_ref[:, s])
        tr, ti = a_ref[:, s] * cosp, a_ref[:, s] * sinp
        # dT = sum_pc dchi * conj(psi); accumulated over pm chunks in the
        # (consecutively revisited) output block
        prod_r = (dchi_r * psi_r + dchi_i * psi_i).reshape(blk, pc, n, n)
        prod_i = (dchi_i * psi_r - dchi_r * psi_i).reshape(blk, pc, n, n)
        dtr = jnp.sum(prod_r, axis=1)
        dti = jnp.sum(prod_i, axis=1)
        da_s = dtr * cosp + dti * sinp
        dp_s = a_ref[:, s] * (dti * cosp - dtr * sinp)

        @pl.when(pm == 0)
        def _():
            da_ref[:, s] = da_s
            dp_ref[:, s] = dp_s

        @pl.when(pm > 0)
        def _():
            da_ref[:, s] += da_s
            dp_ref[:, s] += dp_s

        dpsi_r, dpsi_i = _mul_t(dchi_r, dchi_i, tr, -ti, blk, pc, n)
        if s > 0:
            ur, ui = _dft2(dpsi_r, dpsi_i, fwd, dt)
            if need_dh:
                czr, czi = _mul_t(*stack[s - 1], *t_of(s - 1), blk, pc, n)
                kzr, kzi = _dft2(czr, czi, fwd, dt)
                _acc_dh(ur, ui, kzr, kzi, dhr_ref, dhi_ref, h_shared, i, pm,
                        blk, pc, n, first=first_dh and s == sg - 1)
            ur, ui = _mul_h(ur, ui, h_r, h_i, True, blk, pc, n)
            dchi_r, dchi_i = _dft2(ur, ui, inv, dt)
        else:
            dchi_r, dchi_i = dpsi_r, dpsi_i

    if need_dh and last and sg == 1:
        # no inter-slice boundary touched this segment: still zero the output
        if h_shared:
            @pl.when((i == 0) & (pm == 0))
            def _():
                dhr_ref[0] = jnp.zeros((n, n), jnp.float32)
                dhi_ref[0] = jnp.zeros((n, n), jnp.float32)
        else:
            @pl.when(pm == 0)
            def _():
                dhr_ref[...] = jnp.zeros_like(dhr_ref)
                dhi_ref[...] = jnp.zeros_like(dhi_ref)

    dpr_ref[...] = dchi_r.reshape(blk, pc, n, n)
    dpi_ref[...] = dchi_i.reshape(blk, pc, n, n)


def _acc_dh(ur, ui, kzr, kzi, dhr_ref, dhi_ref, h_shared, i, pm, blk, pc, n, first):
    """dH += sum_pc dM ∘ conj(K) — accumulated across grid steps.

    Shared H: one (1, N, N) block revisited by every step (zero at the very
    first). Per-position H: (blk, N, N) block per batch index, zeroed at
    pm == 0 of each batch block; `first` marks the first boundary processed
    within this kernel invocation (the zeroing must precede the first add of
    THIS grid step, and adds accumulate across s within the step anyway)."""
    contrib_r = (ur * kzr + ui * kzi).reshape(blk, pc, n, n).sum(1)
    contrib_i = (ui * kzr - ur * kzi).reshape(blk, pc, n, n).sum(1)
    if h_shared:
        if first:
            @pl.when((i == 0) & (pm == 0))
            def _():
                dhr_ref[0] = jnp.zeros((n, n), jnp.float32)
                dhi_ref[0] = jnp.zeros((n, n), jnp.float32)

        dhr_ref[0] += jnp.sum(contrib_r, axis=0)
        dhi_ref[0] += jnp.sum(contrib_i, axis=0)
    else:
        if first:
            @pl.when(pm == 0)
            def _():
                dhr_ref[...] = jnp.zeros_like(dhr_ref)
                dhi_ref[...] = jnp.zeros_like(dhi_ref)

        dhr_ref[...] += contrib_r
        dhi_ref[...] += contrib_i


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _specs(sg, n, pc, blk, h_shared, radix):
    psi = pl.BlockSpec((blk, pc, n, n), lambda i, p: (i, p, 0, 0),
                       memory_space=pltpu.VMEM)
    pat = pl.BlockSpec((blk, sg, n, n), lambda i, p: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    h = (
        pl.BlockSpec((1, n, n), lambda i, p: (0, 0, 0), memory_space=pltpu.VMEM)
        if h_shared
        else pl.BlockSpec((blk, n, n), lambda i, p: (i, 0, 0), memory_space=pltpu.VMEM)
    )
    m = n // radix
    mat = pl.BlockSpec((m, m), lambda i, p: (0, 0), memory_space=pltpu.VMEM)
    return psi, pat, h, mat


# ---------------------------------------------------------------------------
# Mega-chain: the whole uniform part of the multislice chain as ONE
# pallas_call per direction, with the wavefield carried across segments in
# VMEM scratch instead of HBM round-trips, and the per-segment XLA glue
# (patch slices, gradient concats, 2x11 kernel launches) gone.
#
#   forward  grid (nb, npm, S)  — segments innermost; psi chunk lives in
#            scratch for the whole (i, pm) sweep; the only HBM residual is
#            the stack of segment-ENTRY wavefields (stack[0] = psi0), one
#            block written per step; the chain exit flushes once per (i, pm).
#   backward grid (nb, S, npm)  — pmode innermost so the dT output blocks
#            (i, S-1-s) accumulate over pm chunks in consecutively revisited
#            blocks; the running cotangent holds ALL pmode chunks in scratch
#            (it must survive the pm sweep between segment steps); g and the
#            dpsi0 output use s-parked index maps so they stream once per
#            (i, pm) instead of every step.
#
# The ragged tail (nz % sg slices) still runs through chain_segment.
# ---------------------------------------------------------------------------


def _mega_fwd_kernel(sg, n, pc, blk, S, last_mega, h_shared, dt, radix, n_mats,
                     pr_ref, pi_ref, a_ref, p_ref, hr_ref, hi_ref, *refs):
    """Grid (nb, npm, S): advance one (batch block, pmode chunk) through
    segment s, carrying psi in scratch; write the segment ENTRY to the stack
    and (at s == S-1) the chain exit."""
    mats, (stk_r, stk_i, or_ref, oi_ref, sr_scr, si_scr) = refs[:n_mats], refs[n_mats:]
    s = pl.program_id(2)
    fwd, inv = _bundles(mats, radix)
    h_r, h_i = _load_h_scaled(hr_ref, hi_ref, h_shared, n)

    def t_of(j):
        return a_ref[:, j] * jnp.cos(p_ref[:, j]), a_ref[:, j] * jnp.sin(p_ref[:, j])

    @pl.when(s == 0)
    def _():
        sr_scr[...] = pr_ref[...]
        si_scr[...] = pi_ref[...]

    psi_r = sr_scr[...].reshape(blk * pc, n, n)
    psi_i = si_scr[...].reshape(blk * pc, n, n)
    stk_r[...] = psi_r.reshape(blk, 1, pc, n, n)
    stk_i[...] = psi_i.reshape(blk, 1, pc, n, n)

    for j in range(sg):
        psi_r, psi_i = _mul_t(psi_r, psi_i, *t_of(j), blk, pc, n)
        if j < sg - 1:
            kr, ki = _dft2(psi_r, psi_i, fwd, dt)
            kr, ki = _mul_h(kr, ki, h_r, h_i, False, blk, pc, n)
            psi_r, psi_i = _dft2(kr, ki, inv, dt)

    def store(r, im, also_exit):
        sr_scr[...] = r.reshape(blk, pc, n, n)
        si_scr[...] = im.reshape(blk, pc, n, n)
        if also_exit:
            or_ref[...] = r.reshape(blk, pc, n, n)
            oi_ref[...] = im.reshape(blk, pc, n, n)

    def propagate():
        kr, ki = _dft2(psi_r, psi_i, fwd, dt)
        kr, ki = _mul_h(kr, ki, h_r, h_i, False, blk, pc, n)
        return _dft2(kr, ki, inv, dt)

    if last_mega:
        # the chain ends inside this kernel: no propagation after the final
        # slice of the final segment
        @pl.when(s < S - 1)
        def _():
            store(*propagate(), also_exit=False)

        @pl.when(s == S - 1)
        def _():
            store(psi_r, psi_i, also_exit=True)
    else:
        # a ragged tail follows: every segment (incl. the last) propagates
        r, im = propagate()
        store(r, im, also_exit=False)

        @pl.when(s == S - 1)
        def _():
            or_ref[...] = r.reshape(blk, pc, n, n)
            oi_ref[...] = im.reshape(blk, pc, n, n)


def _mega_bwd_kernel(sg, n, pc, blk, S, last_mega, h_shared, need_dh, dt,
                     radix, n_mats,
                     gr_ref, gi_ref, stk_r_ref, stk_i_ref, a_ref, p_ref,
                     hr_ref, hi_ref, *refs):
    """Grid (nb, S, npm): process segment srev = S-1-s — rematerialize its
    slice-entry states from the stacked entry psi, walk the adjoint chain,
    accumulate dT over pm chunks, carry the cotangent in scratch."""
    if need_dh:
        mats, (da_ref, dp_ref, d0r_ref, d0i_ref, dhr_ref, dhi_ref,
               cr_scr, ci_scr) = refs[:n_mats], refs[n_mats:]
    else:
        mats, (da_ref, dp_ref, d0r_ref, d0i_ref,
               cr_scr, ci_scr) = refs[:n_mats], refs[n_mats:]
        dhr_ref = dhi_ref = None
    i = pl.program_id(0)
    s = pl.program_id(1)
    pm = pl.program_id(2)
    fwd, inv = _bundles(mats, radix)
    h_r, h_i = _load_h_scaled(hr_ref, hi_ref, h_shared, n)

    def t_of(j):
        return a_ref[:, j] * jnp.cos(p_ref[:, j]), a_ref[:, j] * jnp.sin(p_ref[:, j])

    if need_dh:
        # zero the (revisited) dH block before ANY add: at the very first
        # grid step for shared H, at each batch block's first visit otherwise
        zero_now = ((i == 0) & (s == 0) & (pm == 0)) if h_shared else ((s == 0) & (pm == 0))

        @pl.when(zero_now)
        def _():
            if h_shared:
                dhr_ref[0] = jnp.zeros((n, n), jnp.float32)
                dhi_ref[0] = jnp.zeros((n, n), jnp.float32)
            else:
                dhr_ref[...] = jnp.zeros_like(dhr_ref)
                dhi_ref[...] = jnp.zeros_like(dhi_ref)

    # remat: slice-entry states of this segment from the stacked entry psi
    psi_r = stk_r_ref[...].reshape(blk * pc, n, n)
    psi_i = stk_i_ref[...].reshape(blk * pc, n, n)
    stack = []
    for j in range(sg):
        stack.append((psi_r, psi_i))
        if j < sg - 1:
            psi_r, psi_i = _mul_t(psi_r, psi_i, *t_of(j), blk, pc, n)
            kr, ki = _dft2(psi_r, psi_i, fwd, dt)
            kr, ki = _mul_h(kr, ki, h_r, h_i, False, blk, pc, n)
            psi_r, psi_i = _dft2(kr, ki, inv, dt)

    # incoming cotangent: the exit cotangent g seeds the carry scratch at the
    # first step (srev = S-1); afterwards the scratch carries it — a one-time
    # predicated copy instead of a full-size select on every grid step
    @pl.when(s == 0)
    def _():
        cr_scr[:, pl.ds(pm * pc, pc)] = gr_ref[...]
        ci_scr[:, pl.ds(pm * pc, pc)] = gi_ref[...]

    dchi_r = cr_scr[:, pl.ds(pm * pc, pc)].reshape(blk * pc, n, n)
    dchi_i = ci_scr[:, pl.ds(pm * pc, pc)].reshape(blk * pc, n, n)

    # undo the trailing propagation's adjoint — present for every segment
    # except the chain-final one (srev == S-1 i.e. s == 0, when last_mega)
    undo_needed = (s > 0) if last_mega else None  # None => always
    ur, ui = _dft2(dchi_r, dchi_i, fwd, dt)
    if need_dh:
        czr, czi = _mul_t(*stack[sg - 1], *t_of(sg - 1), blk, pc, n)
        kzr, kzi = _dft2(czr, czi, fwd, dt)
        _acc_dh_mega(ur, ui, kzr, kzi, dhr_ref, dhi_ref, h_shared,
                     blk, pc, n, undo_needed)
    ur, ui = _mul_h(ur, ui, h_r, h_i, True, blk, pc, n)
    ur, ui = _dft2(ur, ui, inv, dt)
    if undo_needed is not None:
        dchi_r = jnp.where(undo_needed, ur, dchi_r)
        dchi_i = jnp.where(undo_needed, ui, dchi_i)
    else:
        dchi_r, dchi_i = ur, ui

    for j in range(sg - 1, -1, -1):
        psi_r, psi_i = stack[j]
        # one cos/sin per slice, shared by the transmission adjoint and dT
        cosp = jnp.cos(p_ref[:, j])
        sinp = jnp.sin(p_ref[:, j])
        tr, ti = a_ref[:, j] * cosp, a_ref[:, j] * sinp
        prod_r = (dchi_r * psi_r + dchi_i * psi_i).reshape(blk, pc, n, n)
        prod_i = (dchi_i * psi_r - dchi_r * psi_i).reshape(blk, pc, n, n)
        dtr = jnp.sum(prod_r, axis=1)
        dti = jnp.sum(prod_i, axis=1)
        da_s = dtr * cosp + dti * sinp
        dp_s = a_ref[:, j] * (dti * cosp - dtr * sinp)

        @pl.when(pm == 0)
        def _():
            da_ref[:, j] = da_s
            dp_ref[:, j] = dp_s

        @pl.when(pm > 0)
        def _():
            da_ref[:, j] += da_s
            dp_ref[:, j] += dp_s

        dpsi_r, dpsi_i = _mul_t(dchi_r, dchi_i, tr, -ti, blk, pc, n)
        if j > 0:
            ur, ui = _dft2(dpsi_r, dpsi_i, fwd, dt)
            if need_dh:
                czr, czi = _mul_t(*stack[j - 1], *t_of(j - 1), blk, pc, n)
                kzr, kzi = _dft2(czr, czi, fwd, dt)
                _acc_dh_mega(ur, ui, kzr, kzi, dhr_ref, dhi_ref, h_shared,
                             blk, pc, n, pred=None)
            ur, ui = _mul_h(ur, ui, h_r, h_i, True, blk, pc, n)
            dchi_r, dchi_i = _dft2(ur, ui, inv, dt)
        else:
            dchi_r, dchi_i = dpsi_r, dpsi_i

    cr_scr[:, pl.ds(pm * pc, pc)] = dchi_r.reshape(blk, pc, n, n)
    ci_scr[:, pl.ds(pm * pc, pc)] = dchi_i.reshape(blk, pc, n, n)

    @pl.when(s == S - 1)
    def _():
        d0r_ref[...] = dchi_r.reshape(blk, pc, n, n)
        d0i_ref[...] = dchi_i.reshape(blk, pc, n, n)


def _acc_dh_mega(ur, ui, kzr, kzi, dhr_ref, dhi_ref, h_shared, blk, pc, n,
                 pred):
    """dH accumulation for the mega backward (the block is zeroed at its
    first visit by the kernel prologue); gate the add on `pred` (the dynamic
    undo-needed predicate) when given."""
    contrib_r = (ur * kzr + ui * kzi).reshape(blk, pc, n, n).sum(1)
    contrib_i = (ui * kzr - ur * kzi).reshape(blk, pc, n, n).sum(1)

    def add():
        if h_shared:
            dhr_ref[0] += jnp.sum(contrib_r, axis=0)
            dhi_ref[0] += jnp.sum(contrib_i, axis=0)
        else:
            dhr_ref[...] += contrib_r
            dhi_ref[...] += contrib_i

    if pred is None:
        add()
    else:
        @pl.when(pred)
        def _():
            add()


def _mega_plan(b_local, sg, n, pmode, h_shared, need_dh):
    """(blk, pc) for the mega kernels — the per-segment model plus the
    full-pmode cotangent scratch of the backward."""
    radix = _radix_of(n)
    mats = 6 * radix * (n // radix) ** 2 * 4
    for pc in (8, 4, 2, 1):
        if pmode % pc or pc > pmode:
            continue
        for blk in (4, 2, 1):
            if b_local % blk:
                continue
            chunk = 2 * blk * pc * n * n * 4
            pat_blk = 2 * blk * sg * n * n * 4
            h_blk = 2 * (1 if h_shared else blk) * n * n * 4
            carry = 2 * blk * pmode * n * n * 4          # full-pmode scratch
            bwd = (
                2 * chunk          # stack in (dbuf)
                + 2 * chunk        # g in (parked)
                + 2 * chunk        # dpsi0 out (parked)
                + carry            # cotangent carry scratch
                + (sg - 1) * chunk # remat stack
                + 3 * chunk        # DFT temps
                + 2 * pat_blk + 2 * pat_blk
                + h_blk + mats
                + ((2 * chunk + h_blk) if need_dh else 0)
            )
            fwd = (
                chunk              # psi carry scratch
                + 2 * chunk        # probe in (dbuf)
                + 2 * chunk        # stack out (dbuf)
                + 2 * chunk        # exit out
                + 3 * chunk        # DFT temps
                + 2 * pat_blk
                + h_blk + mats
            )
            if bwd <= _MEGA_VMEM_BUDGET and fwd <= _MEGA_VMEM_BUDGET:
                return blk, pc
    return None


# Planner budget for the mega kernels, sized against _VMEM_LIMIT_BYTES with
# ~36 MB headroom for Mosaic's own temporaries (the additive model below
# overcounts what Mosaic actually allocates). Measured at PSO scale
# (B=32, nz=21, N=256, pmode=4): plans (1,2)/(1,4)/(2,4) land within 5% of
# each other (20.6/20.3/19.7 ms fwd+bwd) — the kernel is compute-bound on
# this chip, so the budget mainly controls how much VMEM we risk, not speed.
_MEGA_VMEM_BUDGET = (_VMEM_LIMIT_BYTES * 5) // 8  # 60 MB at the 96 MiB ceiling

# s-parked index maps for the backward's g/dpsi0 blocks (see _chain_stack_bwd)
_PARK_MAPS = True

# In-kernel far-field exit (see _seg_fwd_kernel far_field). Default OFF:
# an interleaved on-chip A/B at PSO scale (B=32, nz=21, N=256, pmode=4,
# scratch/pso_chain_time.py --ab-ff, 2026-08-18) measured the in-kernel exit
# 0.58 ms/step SLOWER (17.20 vs 16.62 ms chain fwd+bwd) — the XLA dense
# detector DFT pipelines with the surrounding elementwise/update ops, while
# the monolithic tail kernel serializes the same MACs. Kept as a measured
# negative result + hook: the trade may flip on backends with slower XLA
# fusion or pricier HBM round trips.
_FAR_FIELD = False
_FF_TRACED = False  # set when a chain program reads _FAR_FIELD at trace time


def set_far_field(flag: bool, silent: bool = False) -> None:
    """Toggle the in-kernel far-field detector exit for the chain tail.

    Read at TRACE time only (same contract as fourier.set_matmul_dtype):
    jitted programs built before the toggle keep the setting they were
    traced with — jax's cache is keyed on function identity and arguments,
    not on this flag. Set it before building jitted functions; toggling
    after one has been traced warns (re-jit with a fresh closure or
    jax.clear_caches() to apply — a measured A/B must rebuild its programs,
    see scratch/pso_chain_time.py). Callers that DO rebuild their closures
    per toggle pass silent=True."""
    global _FAR_FIELD
    if flag != _FAR_FIELD and _FF_TRACED and not silent:
        import warnings

        warnings.warn(
            "set_far_field({}) after a chain program was already traced: "
            "existing jitted programs keep far_field={} — rebuild them "
            "(fresh closure) or jax.clear_caches() for the toggle to take "
            "effect".format(flag, _FAR_FIELD),
            RuntimeWarning,
            stacklevel=2,
        )
    _FAR_FIELD = flag


def set_park_maps(flag: bool) -> None:
    global _PARK_MAPS
    _PARK_MAPS = flag


def _mega_fwd_impl(psi0_r, psi0_i, a_main, p_main, h_r, h_i, sg, last_mega,
                   need_dh):
    b, pmode, n, _ = psi0_r.shape
    nz_main = a_main.shape[1]
    if nz_main % sg:
        # S = nz_main // sg below would silently DROP the trailing slices
        raise ValueError(
            f"chain_stack: nz_main ({nz_main}) must be divisible by sg ({sg});"
            " route the ragged tail through chain_segment"
        )
    S = nz_main // sg
    h_shared = h_r.shape[0] == 1
    mesh = get_kernel_mesh()
    b_local = b // kernel_mesh_size()
    plan = _mega_plan(b_local, sg, n, pmode, h_shared, need_dh)
    if plan is None:
        raise ValueError("chain_stack: no feasible mega plan")
    blk, pc = plan
    mats, radix = _consts(n)
    n_mats = len(mats)
    m = n // radix

    def run(psi0_r, psi0_i, a_main, p_main, h_r, h_i, *mats):
        bl = psi0_r.shape[0]
        probe = pl.BlockSpec((blk, pc, n, n), lambda i, p, s: (i, p, 0, 0),
                             memory_space=pltpu.VMEM)
        pat = pl.BlockSpec((blk, sg, n, n), lambda i, p, s: (i, s, 0, 0),
                           memory_space=pltpu.VMEM)
        h = (
            pl.BlockSpec((1, n, n), lambda i, p, s: (0, 0, 0), memory_space=pltpu.VMEM)
            if h_shared
            else pl.BlockSpec((blk, n, n), lambda i, p, s: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        )
        mat = pl.BlockSpec((m, m), lambda i, p, s: (0, 0), memory_space=pltpu.VMEM)
        stk = pl.BlockSpec((blk, 1, pc, n, n), lambda i, p, s: (i, s, p, 0, 0),
                           memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _mega_fwd_kernel, sg, n, pc, blk, S, bool(last_mega), h_shared,
            _gemm_dtype(), radix, n_mats,
        )
        stk_r, stk_i, out_r, out_i = pl.pallas_call(
            kernel,
            grid=(bl // blk, pmode // pc, S),
            in_specs=[probe, probe, pat, pat, h, h] + [mat] * n_mats,
            out_specs=[stk, stk, probe, probe],
            out_shape=[
                jax.ShapeDtypeStruct((bl, S, pmode, n, n), jnp.float32),
                jax.ShapeDtypeStruct((bl, S, pmode, n, n), jnp.float32),
                jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32),
                jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((blk, pc, n, n), jnp.float32),
                pltpu.VMEM((blk, pc, n, n), jnp.float32),
            ],
            interpret=_INTERPRET,
            compiler_params=_compiler_params(),
        )(psi0_r, psi0_i, a_main, p_main, h_r, h_i, *mats)
        return stk_r, stk_i, out_r, out_i

    if mesh is not None:
        d = P(DATA_AXIS)
        h_spec = P() if h_shared else d
        run = jax.shard_map(
            run, mesh=mesh, in_specs=(d, d, d, d, h_spec, h_spec) + (P(),) * n_mats,
            out_specs=(d, d, d, d), check_vma=False,
        )
    return run(psi0_r, psi0_i, a_main, p_main, h_r, h_i, *mats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def chain_stack(psi0_r, psi0_i, a_main, p_main, h_r, h_i, sg, last_mega=True,
                need_dh=False):
    """Advance psi0 through the uniform part of the chain (S = nz_main/sg
    segments of exactly sg slices) in ONE kernel per direction (under AD).

    a_main/p_main: (B, nz_main, N, N) with nz_main % sg == 0. h in KERNEL
    k-order (see chain_segment). last_mega: the chain ends here (no
    propagation after the final slice); False when a ragged chain_segment
    tail follows. Returns the exit wavefield (B, pmode, N, N) pair.

    PRIMAL-only calls (no grad: validation dp, exports) run the per-segment
    kernels instead of the mega kernel: the mega forward always emits the
    backward's segment-entry remat stack to HBM (~134 MB at PSO scale),
    which is pure waste when nothing will differentiate it.
    """
    nz_main = a_main.shape[1]
    if nz_main % sg:
        raise ValueError(
            f"chain_stack: nz_main ({nz_main}) must be divisible by sg ({sg})"
        )
    psi_r, psi_i = psi0_r, psi0_i
    for z0 in range(0, nz_main, sg):
        last = last_mega and (z0 + sg >= nz_main)
        psi_r, psi_i = chain_segment(
            psi_r, psi_i, a_main[:, z0:z0 + sg], p_main[:, z0:z0 + sg],
            h_r, h_i, last, need_dh,
        )
    return psi_r, psi_i


def _chain_stack_fwd(psi0_r, psi0_i, a_main, p_main, h_r, h_i, sg, last_mega,
                     need_dh):
    stk_r, stk_i, out_r, out_i = _mega_fwd_impl(
        psi0_r, psi0_i, a_main, p_main, h_r, h_i, sg, last_mega, need_dh)
    return (out_r, out_i), (stk_r, stk_i, a_main, p_main, h_r, h_i)


def _chain_stack_bwd(sg, last_mega, need_dh, residuals, g):
    stk_r, stk_i, a_main, p_main, h_r, h_i = residuals
    g_r, g_i = g
    b, S, pmode, n, _ = stk_r.shape
    h_shared = h_r.shape[0] == 1
    mesh = get_kernel_mesh()
    b_local = b // kernel_mesh_size()
    plan = _mega_plan(b_local, sg, n, pmode, h_shared, need_dh)
    if plan is None:
        raise ValueError("chain_stack backward: no feasible mega plan")
    blk, pc = plan
    mats, radix = _consts(n)
    n_mats = len(mats)
    m = n // radix

    def run(g_r, g_i, stk_r, stk_i, a_main, p_main, h_r, h_i, *mats):
        bl = stk_r.shape[0]
        # g and dpsi0 park on pm-block 0 while s sweeps, streaming once per
        # (i, pm) instead of every grid step
        if _PARK_MAPS:
            gspec = pl.BlockSpec(
                (blk, pc, n, n),
                lambda i, s, p: (i, jnp.where(s == 0, p, 0), 0, 0),
                memory_space=pltpu.VMEM,
            )
            d0spec = pl.BlockSpec(
                (blk, pc, n, n),
                lambda i, s, p: (i, jnp.where(s == S - 1, p, 0), 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            gspec = pl.BlockSpec((blk, pc, n, n), lambda i, s, p: (i, p, 0, 0),
                                 memory_space=pltpu.VMEM)
            d0spec = gspec
        stk = pl.BlockSpec((blk, 1, pc, n, n),
                           lambda i, s, p: (i, S - 1 - s, p, 0, 0),
                           memory_space=pltpu.VMEM)
        pat = pl.BlockSpec((blk, sg, n, n), lambda i, s, p: (i, S - 1 - s, 0, 0),
                           memory_space=pltpu.VMEM)
        h = (
            pl.BlockSpec((1, n, n), lambda i, s, p: (0, 0, 0), memory_space=pltpu.VMEM)
            if h_shared
            else pl.BlockSpec((blk, n, n), lambda i, s, p: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        )
        mat = pl.BlockSpec((m, m), lambda i, s, p: (0, 0), memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _mega_bwd_kernel, sg, n, pc, blk, S, bool(last_mega), h_shared,
            bool(need_dh), _gemm_dtype(), radix, n_mats,
        )
        out_specs = [pat, pat, d0spec, d0spec]
        out_shape = [
            jax.ShapeDtypeStruct((bl, S * sg, n, n), jnp.float32),
            jax.ShapeDtypeStruct((bl, S * sg, n, n), jnp.float32),
            jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32),
            jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32),
        ]
        if need_dh:
            dh_shape = (
                jax.ShapeDtypeStruct((1, n, n), jnp.float32) if h_shared
                else jax.ShapeDtypeStruct((bl, n, n), jnp.float32)
            )
            out_specs += [h, h]
            out_shape += [dh_shape, dh_shape]
        outs = pl.pallas_call(
            kernel,
            grid=(bl // blk, S, pmode // pc),
            in_specs=[gspec, gspec, stk, stk, pat, pat, h, h] + [mat] * n_mats,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((blk, pmode, n, n), jnp.float32),
                pltpu.VMEM((blk, pmode, n, n), jnp.float32),
            ],
            interpret=_INTERPRET,
            compiler_params=_compiler_params(),
        )(g_r, g_i, stk_r, stk_i, a_main, p_main, h_r, h_i, *mats)
        if need_dh:
            da, dp, d0r, d0i, dhr, dhi = outs
            # the kernel accumulates dH w.r.t. the load_h_scaled propagator
            dhr, dhi = _unscale_dh(dhr, dhi, n)
            if mesh is not None and h_shared:
                dhr = jax.lax.psum(dhr, DATA_AXIS)
                dhi = jax.lax.psum(dhi, DATA_AXIS)
        else:
            da, dp, d0r, d0i = outs
            dh_b = 1 if h_shared else bl
            dhr = jnp.zeros((dh_b, n, n), jnp.float32)
            dhi = jnp.zeros((dh_b, n, n), jnp.float32)
        return da, dp, d0r, d0i, dhr, dhi

    if mesh is not None:
        d = P(DATA_AXIS)
        h_spec = P() if h_shared else d
        run = jax.shard_map(
            run, mesh=mesh,
            in_specs=(d, d, d, d, d, d, h_spec, h_spec) + (P(),) * n_mats,
            out_specs=(d, d, d, d, h_spec, h_spec), check_vma=False,
        )
    da, dp, d0r, d0i, dhr, dhi = run(
        g_r, g_i, stk_r, stk_i, a_main, p_main, h_r, h_i, *mats
    )
    return d0r, d0i, da, dp, dhr, dhi


chain_stack.defvjp(_chain_stack_fwd, _chain_stack_bwd)


def _seg_fwd_impl(psi_r, psi_i, a_seg, p_seg, h_r, h_i, last, need_dh,
                  far_field=False):
    if far_field and not last:
        raise ValueError("chain_segment: far_field requires last=True")
    b, pmode, n, _ = psi_r.shape
    sg = a_seg.shape[1]
    h_shared = h_r.shape[0] == 1
    mesh = get_kernel_mesh()
    b_local = b // kernel_mesh_size()
    plan = _pick_plan(b_local, sg, n, pmode, backward=False, h_shared=h_shared,
                      need_dh=need_dh, far_field=far_field)
    if plan is None:
        raise ValueError(
            f"chain_segment: (B={b_local}, Sg={sg}, N={n}, pmode={pmode}) "
            "exceeds VMEM even at blk=1/pc=1 — chain_applicable would decline"
        )
    blk, pc = plan
    mats, radix = _consts(n)
    n_mats = len(mats)
    if far_field:
        ff_mats = [jnp.asarray(m) for m in _ff_consts(n)[0]]
        mats = mats + ff_mats

    def run(psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats):
        bl = psi_r.shape[0]
        psi, pat, h, mat = _specs(sg, n, pc, blk, h_shared, radix)
        ffm = [pl.BlockSpec((n, n), lambda i, p: (0, 0),
                            memory_space=pltpu.VMEM)] * (3 if far_field else 0)
        kernel = functools.partial(
            _seg_fwd_kernel, sg, n, pc, blk, bool(last), bool(far_field),
            h_shared, _gemm_dtype(), radix, n_mats,
        )
        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(bl // blk, pmode // pc),
            in_specs=[psi, psi, pat, pat, h, h] + [mat] * n_mats + ffm,
            out_specs=[psi, psi],
            out_shape=[jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32)] * 2,
            scratch_shapes=[
                pltpu.VMEM((blk, sg, n, n), jnp.float32),
                pltpu.VMEM((blk, sg, n, n), jnp.float32),
            ],
            interpret=_INTERPRET,
            compiler_params=_compiler_params(),
        )(psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats)
        return out_r, out_i

    if mesh is not None:
        d = P(DATA_AXIS)
        h_spec = P() if h_shared else d
        run = jax.shard_map(
            run, mesh=mesh,
            in_specs=(d, d, d, d, h_spec, h_spec) + (P(),) * len(mats),
            out_specs=(d, d), check_vma=False,
        )
    return run(psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def chain_segment(psi_r, psi_i, a_seg, p_seg, h_r, h_i, last=False,
                  need_dh=False, far_field=False):
    """Advance the wavefield through one segment of Sg object slices.

    psi: (B, pmode, N, N) float32 pair, the wavefield at the segment entry.
    a_seg/p_seg: (B, Sg, N, N) object amplitude/phase slices (omode sliced
      out by the caller). h: (1 or B, N, N) propagator pair — in KERNEL
      k-order: when _radix_of(N) > 1 the caller must pre-permute both h
      planes with radix_perm(N) on the last two axes (multislice_dp_chain
      does); the dH cotangent comes back in the same order.
    last (static): this segment ends the chain — no propagation after its
      final slice.
    need_dh (static): also produce propagator cotangents in the backward.
    far_field (static, requires last): additionally apply the UNNORMALIZED
      fftshift-folded forward DFT2 in VMEM (dense _ff_consts matrices) —
      the return is then the CENTERED detector-plane spectrum in natural
      order; the caller owns the ortho 1/(N*N) (see _seg_fwd_kernel).

    Returns the exit wavefield (B, pmode, N, N) pair.
    """
    return _seg_fwd_impl(psi_r, psi_i, a_seg, p_seg, h_r, h_i, last, need_dh,
                         far_field)


def _chain_fwd(psi_r, psi_i, a_seg, p_seg, h_r, h_i, last, need_dh, far_field):
    out = _seg_fwd_impl(psi_r, psi_i, a_seg, p_seg, h_r, h_i, last, need_dh,
                        far_field)
    return out, (psi_r, psi_i, a_seg, p_seg, h_r, h_i)


def _chain_bwd(last, need_dh, far_field, residuals, g):
    psi_r, psi_i, a_seg, p_seg, h_r, h_i = residuals
    g_r, g_i = g
    b, pmode, n, _ = psi_r.shape
    sg = a_seg.shape[1]
    h_shared = h_r.shape[0] == 1
    mesh = get_kernel_mesh()
    b_local = b // kernel_mesh_size()
    plan = _pick_plan(b_local, sg, n, pmode, backward=True, h_shared=h_shared,
                      need_dh=need_dh, far_field=far_field)
    if plan is None:
        raise ValueError(
            f"chain_segment backward: (B={b_local}, Sg={sg}, N={n}, "
            f"pmode={pmode}) exceeds VMEM — chain_applicable would decline"
        )
    blk, pc = plan
    mats, radix = _consts(n)
    n_mats = len(mats)
    if far_field:
        ff_adj = [jnp.asarray(m) for m in _ff_consts(n)[1]]
        mats = mats + ff_adj

    def run(g_r, g_i, psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats):
        bl = psi_r.shape[0]
        psi, pat, h, mat = _specs(sg, n, pc, blk, h_shared, radix)
        ffm = [pl.BlockSpec((n, n), lambda i, p: (0, 0),
                            memory_space=pltpu.VMEM)] * (3 if far_field else 0)
        kernel = functools.partial(
            _seg_bwd_kernel, sg, n, pc, blk, bool(last), bool(far_field),
            h_shared, bool(need_dh), _gemm_dtype(), radix, n_mats,
        )
        out_specs = [pat, pat, psi, psi]
        out_shape = [
            jax.ShapeDtypeStruct((bl, sg, n, n), jnp.float32),
            jax.ShapeDtypeStruct((bl, sg, n, n), jnp.float32),
            jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32),
            jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32),
        ]
        if need_dh:
            dh_shape = (
                jax.ShapeDtypeStruct((1, n, n), jnp.float32) if h_shared
                else jax.ShapeDtypeStruct((bl, n, n), jnp.float32)
            )
            out_specs += [h, h]
            out_shape += [dh_shape, dh_shape]
        outs = pl.pallas_call(
            kernel,
            grid=(bl // blk, pmode // pc),
            in_specs=[psi, psi, psi, psi, pat, pat, h, h] + [mat] * n_mats + ffm,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=_INTERPRET,
            compiler_params=_compiler_params(),
        )(g_r, g_i, psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats)
        if need_dh:
            da, dp, dpr, dpi, dhr, dhi = outs
            # the kernel accumulates dH w.r.t. the load_h_scaled propagator
            dhr, dhi = _unscale_dh(dhr, dhi, n)
            if mesh is not None and h_shared:
                dhr = jax.lax.psum(dhr, DATA_AXIS)
                dhi = jax.lax.psum(dhi, DATA_AXIS)
        else:
            da, dp, dpr, dpi = outs
            dh_b = 1 if h_shared else bl
            dhr = jnp.zeros((dh_b, n, n), jnp.float32)
            dhi = jnp.zeros((dh_b, n, n), jnp.float32)
        return da, dp, dpr, dpi, dhr, dhi

    if mesh is not None:
        d = P(DATA_AXIS)
        h_spec = P() if h_shared else d
        dh_out = P() if h_shared else d
        run = jax.shard_map(
            run, mesh=mesh,
            in_specs=(d, d, d, d, d, d, h_spec, h_spec) + (P(),) * len(mats),
            out_specs=(d, d, d, d, dh_out, dh_out), check_vma=False,
        )
    da, dp, dpr, dpi, dhr, dhi = run(
        g_r, g_i, psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats
    )
    return dpr, dpi, da, dp, dhr, dhi


chain_segment.defvjp(_chain_fwd, _chain_bwd)


# ---------------------------------------------------------------------------
# VMEM planning
# ---------------------------------------------------------------------------

# Planner budget for the per-segment kernels. Historically pinned to the
# 16 MiB default scoped-vmem limit; now that pallas raises the Mosaic
# ceiling (_VMEM_LIMIT_BYTES) the budget sits at 60 MB with ~36 MB headroom
# for Mosaic's own temporaries. pc-major search kept: at the old 16 MiB
# ceiling bwd (1,2) measured 1.36x bwd (1,1) at PSO scale — widening the
# pmode chunk grows GEMM rows with less real VMEM than widening the batch
# block. Anything Mosaic still rejects degrades through the solver's
# Mosaic-OOM fallback to the XLA path (engine/solver._mosaic_vmem_error).
_VMEM_BUDGET = (_VMEM_LIMIT_BYTES * 5) // 8  # tracks the Mosaic ceiling


def _pick_plan(b, sg, n, pmode, backward, h_shared, need_dh, far_field=False):
    """Largest (pc, blk) whose working set fits VMEM; None if nothing fits.
    pc-major: growing the pmode chunk widens the GEMMs with less real VMEM
    growth than widening the batch block (see budget note above)."""
    radix = _radix_of(n)
    mats = 6 * radix * (n // radix) ** 2 * 4
    if far_field:
        # the dense fftshift-folded detector DFT adds 3 full (n, n) f32
        # matrices (fwd triple or adjoint triple); its pass temps are
        # chunk-sized and covered by the DFT-temp terms below
        mats += 3 * n * n * 4
    for pc in (8, 4, 2, 1):
        if pmode % pc or pc > pmode:
            continue
        for blk in (4, 2, 1):
            if b % blk:
                continue
            chunk = 2 * blk * pc * n * n * 4            # one psi-chunk pair
            pat_blk = 2 * blk * sg * n * n * 4           # a+p patch block
            t_scr = pat_blk                              # cos/sin scratch
            h_blk = 2 * (1 if h_shared else blk) * n * n * 4
            if backward:
                live = (
                    2 * chunk            # psi in (dbuf)
                    + 2 * chunk          # g in (dbuf)
                    + 2 * chunk          # dpsi out (dbuf)
                    + (sg - 1) * chunk   # remat stack (entry 0 aliases psi in)
                    + 3 * chunk          # DFT temps / dchi / dpsi values
                    + 2 * pat_blk        # patch blocks (dbuf)
                    + 2 * pat_blk        # da/dp out blocks
                    + h_blk              # H in (cos/sin recomputed, no scratch)
                    + mats
                )
                if need_dh:
                    live += 2 * chunk + h_blk  # K recompute temps + dH out
            else:
                live = (
                    2 * chunk            # psi in (dbuf)
                    + 2 * chunk          # psi out (dbuf)
                    + 3 * chunk          # DFT temps
                    + 2 * pat_blk
                    + t_scr
                    + h_blk
                    + mats
                )
            if live <= _VMEM_BUDGET:
                return blk, pc
    return None


def _best_sg(b, nz, n, pmode, h_shared, need_dh):
    """Segment length whose plans fit VMEM, preferring the one whose BACKWARD
    plan keeps the most batch*pmode rows per GEMM (measured to matter more
    than fewer HBM psi boundaries: at PSO scale bwd (1,2)@sg=2 is 1.36x
    bwd (1,1)@sg=2, while sg=3@(1,1) only trims ~10% of boundary traffic);
    ties break toward larger sg. 0 if even Sg=1 does not fit. When the
    far-field exit is globally enabled, every segment is budgeted with the
    ff extras (only the tail segment pays them, but one shared sg must fit
    both — the over-reserve is 3 (n, n) f32 planes out of a 60 MB budget)."""
    best, best_key = 0, (0, 0)
    for sg in range(min(nz, 8), 0, -1):
        pb = _pick_plan(b, sg, n, pmode, backward=True, h_shared=h_shared,
                        need_dh=need_dh, far_field=_FAR_FIELD)
        pf = _pick_plan(b, sg, n, pmode, backward=False, h_shared=h_shared,
                        need_dh=need_dh, far_field=_FAR_FIELD)
        if pb is not None and pf is not None:
            # sg=1 puts EVERY slice boundary through HBM (nz-1 psi-pair
            # round-trips) — only take it when nothing longer fits at all
            key = (0, 1) if (sg == 1 and nz > 1) else (pb[0] * pb[1], sg)
            if key > best_key:
                best_key, best = key, sg
    return best


def chain_applicable_shapes(b, omode, nz, ny, nx, pmode, h_b, need_dh=False) -> bool:
    """Can the segmented chain run these shapes? (any omode — the caller
    loops object modes at the XLA level; any nz — that is the point)."""
    n_shards = kernel_mesh_size()
    if b % n_shards:
        return False
    b_local = b // n_shards
    return (
        (_INTERPRET or jax.default_backend() == "tpu")
        and ny == nx
        and nx <= 512
        and h_b in (1, b)
        and _best_sg(b_local, nz, nx, pmode, h_b == 1, need_dh) > 0
    )


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def multislice_dp_chain(obja_patches, objp_patches, probes: Cplx, H: Cplx,
                        omode_occu, eps: float, need_dh: bool = False,
                        seg_override: int | None = None):
    """Far-field intensity via the segmented chain (drop-in for the jnp
    multislice_dp: returns (B, Ny, Nx) CENTERED dp incl. occu weights + eps).

    obja/objp patches: (B, omode, Nz, N, N); probes Cplx (1 or B, pmode, N, N);
    H Cplx (1 or B, N, N). Object modes run as an XLA-level loop of
    independent chains summed incoherently (reference forward.py:20-80);
    probe broadcast/shift gradients flow through XLA's adjoint of psi0.
    """
    b, omode, nz, n, _ = obja_patches.shape
    pmode = probes.shape[1]
    h_shared = H.shape[0] == 1
    b_local = b // kernel_mesh_size()
    sg = seg_override or _best_sg(b_local, nz, n, pmode, h_shared, need_dh)
    if sg == 0:
        raise ValueError("multislice_dp_chain: no feasible segment plan")

    h_re, h_im = H.re, H.im
    if _radix_of(n) > 1:
        # the kernel's radix DFT passes leave k-space in decimated order;
        # pre-permute the propagator to match (the dH cotangent permutes back
        # automatically through jnp.take's adjoint)
        perm = jnp.asarray(radix_perm(n))
        h_re = jnp.take(jnp.take(h_re, perm, axis=-2), perm, axis=-1)
        h_im = jnp.take(jnp.take(h_im, perm, axis=-2), perm, axis=-1)

    psi0_r = jnp.broadcast_to(probes.re, (b, pmode, n, n))
    psi0_i = jnp.broadcast_to(probes.im, (b, pmode, n, n))

    # the uniform part (S full segments) runs as ONE kernel per direction
    # (chain_stack); the chain always ENDS in a per-segment tail so the
    # detector-plane transform runs in-kernel (far_field: dense shift-folded
    # DFT in VMEM — no XLA DFT pair, fftshift, or exit-psi HBM round trip)
    n_seg_uniform = nz // sg
    global _FF_TRACED
    _FF_TRACED = True
    use_ff = _FAR_FIELD
    nz_main = 0
    if n_seg_uniform >= 2 and _mega_plan(
        b_local, sg, n, pmode, h_shared, need_dh
    ) is not None:
        nz_main = n_seg_uniform * sg
        if use_ff and nz_main == nz:
            nz_main -= sg  # keep a (full-size) tail segment for the exit

    inv_nn = np.float32(1.0 / (n * n))  # |DFT_ortho|^2 = |DFT_unnorm|^2/(N*N)

    dp = None
    for om in range(omode):
        psi_r, psi_i = psi0_r, psi0_i
        z0 = 0
        if nz_main:
            psi_r, psi_i = chain_stack(
                psi_r, psi_i,
                obja_patches[:, om, :nz_main], objp_patches[:, om, :nz_main],
                h_re, h_im, sg, nz_main == nz, need_dh,
            )
            z0 = nz_main
        while z0 < nz:
            z1 = min(z0 + sg, nz)
            psi_r, psi_i = chain_segment(
                psi_r, psi_i,
                obja_patches[:, om, z0:z1], objp_patches[:, om, z0:z1],
                h_re, h_im, z1 == nz, need_dh, use_ff and z1 == nz,
            )
            z0 = z1
        if use_ff:
            # psi is the CENTERED far-field spectrum (unnormalized, natural
            # order — the tail kernel's dense DFT folds in the fftshift)
            inten = jnp.sum(psi_r * psi_r + psi_i * psi_i, axis=1) * inv_nn
        else:
            from ptyrad_tpu.ops.fourier import fft2 as _fft2

            y = _fft2(Cplx(psi_r, psi_i), norm="ortho")
            inten = jnp.sum(y.abs2(), axis=1)
        contrib = omode_occu[om] * inten
        dp = contrib if dp is None else dp + contrib
    if not use_ff:
        # fftshift is a fixed permutation: shift(sum over omode) == sum of
        # per-omode shifts — one roll of the accumulated dp instead of omode
        from ptyrad_tpu.ops.fourier import fftshift2

        dp = fftshift2(dp)
    return dp + eps
