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
compiled program reused), runs the final far-field transform in XLA, and is
what models/forward.py dispatches to when `fused_path_applicable` declines
on size. Probe-shift/shared-probe gradients flow through XLA's adjoint of
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
from ptyrad_tpu.ops.fourier import _dft_consts, fft2, get_matmul_dtype
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


def _gemm_dtype():
    return jnp.bfloat16 if get_matmul_dtype() == "bfloat16" else jnp.float32


def _cpass(fr, fi, frpi, xr, xi, dt):
    """Transpose-free complex DFT pass (see pallas_multislice._cpass)."""
    def mm(v, mat):
        return jax.lax.dot_general(
            v.astype(dt), mat.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    t1 = mm(xr, fr)
    t2 = mm(xi, fi)
    t3 = mm(xr + xi, frpi)
    return t1 - t2, t3 - t1 - t2


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


def _mul_t(psi_r, psi_i, tr, ti, m, pc, n):
    """psi (m*pc, N, N) times per-sample (m, N, N) transmission/propagator."""
    pr = psi_r.reshape(m, pc, n, n)
    pi = psi_i.reshape(m, pc, n, n)
    outr = pr * tr[:, None] - pi * ti[:, None]
    outi = pr * ti[:, None] + pi * tr[:, None]
    return outr.reshape(m * pc, n, n), outi.reshape(m * pc, n, n)


def _mul_h(kr, ki, h_r, h_i, conj, m, pc, n):
    hi = -h_i if conj else h_i
    if h_r.ndim == 2:
        return kr * h_r - ki * hi, kr * hi + ki * h_r
    return _mul_t(kr, ki, h_r, hi, m, pc, n)


def _load_h(hr_ref, hi_ref, h_shared):
    if h_shared:
        return hr_ref[0], hi_ref[0]
    return hr_ref[...], hi_ref[...]


def _seg_fwd_kernel(sg, n, pc, blk, last, h_shared, dt, radix, n_mats,
                    pr_ref, pi_ref, a_ref, p_ref, hr_ref, hi_ref,
                    *refs):
    """One (batch block, pmode chunk) step: Sg T-mult/propagate slices."""
    mats, (or_ref, oi_ref, tr_scr, ti_scr) = refs[:n_mats], refs[n_mats:]
    pm = pl.program_id(1)
    fwd, inv = _bundles(mats, radix)
    inv_scale = np.float32(1.0 / (n * n))
    h_r, h_i = _load_h(hr_ref, hi_ref, h_shared)

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
            psi_r, psi_i = _dft2(kr, ki, inv, dt, scale=inv_scale)
    or_ref[...] = psi_r.reshape(blk, pc, n, n)
    oi_ref[...] = psi_i.reshape(blk, pc, n, n)


def _seg_bwd_kernel(sg, n, pc, blk, last, h_shared, need_dh, dt, radix, n_mats,
                    gr_ref, gi_ref, pr_ref, pi_ref, a_ref, p_ref, hr_ref, hi_ref,
                    *refs):
    """Segment-level rematerialization: rebuild the Sg entry states from the
    saved segment-entry psi, then reverse the chain (adjoint DFT rule: the
    transpose of multiply-by-F_fwd is the unnormalized inverse matrices;
    the transpose of the scaled inverse pass is F_fwd * 1/(N*N) — both hold
    for the radix passes too, layout included; see _pass)."""
    mats, (da_ref, dp_ref, dpr_ref, dpi_ref, dhr_ref, dhi_ref,
           tr_scr, ti_scr) = refs[:n_mats], refs[n_mats:]
    i = pl.program_id(0)
    pm = pl.program_id(1)
    fwd, inv = _bundles(mats, radix)
    inv_scale = np.float32(1.0 / (n * n))
    h_r, h_i = _load_h(hr_ref, hi_ref, h_shared)

    @pl.when(pm == 0)
    def _():
        tr_scr[...] = a_ref[...] * jnp.cos(p_ref[...])
        ti_scr[...] = a_ref[...] * jnp.sin(p_ref[...])

    # forward recompute: entry state of every slice in this segment
    psi_r, psi_i = pr_ref[...].reshape(blk * pc, n, n), pi_ref[...].reshape(blk * pc, n, n)
    stack = []
    for s in range(sg):
        stack.append((psi_r, psi_i))
        if s < sg - 1:
            psi_r, psi_i = _mul_t(psi_r, psi_i, tr_scr[:, s], ti_scr[:, s], blk, pc, n)
            kr, ki = _dft2(psi_r, psi_i, fwd, dt)
            kr, ki = _mul_h(kr, ki, h_r, h_i, False, blk, pc, n)
            psi_r, psi_i = _dft2(kr, ki, inv, dt, scale=inv_scale)

    dchi_r = gr_ref[...].reshape(blk * pc, n, n)
    dchi_i = gi_ref[...].reshape(blk * pc, n, n)
    if not last:
        # cotangent arrives at the segment EXIT, i.e. after the trailing
        # propagation of slice sg-1: undo that adjoint first
        ur, ui = _dft2(dchi_r, dchi_i, fwd, dt, scale=inv_scale)
        if need_dh:
            czr, czi = _mul_t(*stack[sg - 1], tr_scr[:, sg - 1], ti_scr[:, sg - 1], blk, pc, n)
            kzr, kzi = _dft2(czr, czi, fwd, dt)
            _acc_dh(ur, ui, kzr, kzi, dhr_ref, dhi_ref, h_shared, i, pm,
                    blk, pc, n, first=True)
        elif h_shared:
            @pl.when((i == 0) & (pm == 0))
            def _():
                dhr_ref[0] = jnp.zeros((n, n), jnp.float32)
                dhi_ref[0] = jnp.zeros((n, n), jnp.float32)
        else:
            @pl.when(pm == 0)
            def _():
                dhr_ref[...] = jnp.zeros_like(dhr_ref)
                dhi_ref[...] = jnp.zeros_like(dhi_ref)
        ur, ui = _mul_h(ur, ui, h_r, h_i, True, blk, pc, n)
        dchi_r, dchi_i = _dft2(ur, ui, inv, dt)
        first_dh = False
    else:
        first_dh = True

    for s in range(sg - 1, -1, -1):
        psi_r, psi_i = stack[s]
        tr, ti = tr_scr[:, s], ti_scr[:, s]
        # dT = sum_pc dchi * conj(psi); accumulated over pm chunks in the
        # (consecutively revisited) output block
        prod_r = (dchi_r * psi_r + dchi_i * psi_i).reshape(blk, pc, n, n)
        prod_i = (dchi_i * psi_r - dchi_r * psi_i).reshape(blk, pc, n, n)
        dtr = jnp.sum(prod_r, axis=1)
        dti = jnp.sum(prod_i, axis=1)
        cosp = jnp.cos(p_ref[:, s])
        sinp = jnp.sin(p_ref[:, s])
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
            ur, ui = _dft2(dpsi_r, dpsi_i, fwd, dt, scale=inv_scale)
            if need_dh:
                czr, czi = _mul_t(*stack[s - 1], tr_scr[:, s - 1], ti_scr[:, s - 1],
                                  blk, pc, n)
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
    elif not need_dh and last:
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


def _seg_fwd_impl(psi_r, psi_i, a_seg, p_seg, h_r, h_i, last, need_dh):
    b, pmode, n, _ = psi_r.shape
    sg = a_seg.shape[1]
    h_shared = h_r.shape[0] == 1
    mesh = get_kernel_mesh()
    b_local = b // kernel_mesh_size()
    plan = _pick_plan(b_local, sg, n, pmode, backward=False, h_shared=h_shared,
                      need_dh=need_dh)
    if plan is None:
        raise ValueError(
            f"chain_segment: (B={b_local}, Sg={sg}, N={n}, pmode={pmode}) "
            "exceeds VMEM even at blk=1/pc=1 — chain_applicable would decline"
        )
    blk, pc = plan
    mats, radix = _consts(n)
    n_mats = len(mats)

    def run(psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats):
        bl = psi_r.shape[0]
        psi, pat, h, mat = _specs(sg, n, pc, blk, h_shared, radix)
        kernel = functools.partial(
            _seg_fwd_kernel, sg, n, pc, blk, bool(last), h_shared,
            _gemm_dtype(), radix, n_mats,
        )
        out_r, out_i = pl.pallas_call(
            kernel,
            grid=(bl // blk, pmode // pc),
            in_specs=[psi, psi, pat, pat, h, h] + [mat] * n_mats,
            out_specs=[psi, psi],
            out_shape=[jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32)] * 2,
            scratch_shapes=[
                pltpu.VMEM((blk, sg, n, n), jnp.float32),
                pltpu.VMEM((blk, sg, n, n), jnp.float32),
            ],
            interpret=_INTERPRET,
        )(psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats)
        return out_r, out_i

    if mesh is not None:
        d = P(DATA_AXIS)
        h_spec = P() if h_shared else d
        run = jax.shard_map(
            run, mesh=mesh, in_specs=(d, d, d, d, h_spec, h_spec) + (P(),) * n_mats,
            out_specs=(d, d), check_vma=False,
        )
    return run(psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def chain_segment(psi_r, psi_i, a_seg, p_seg, h_r, h_i, last=False, need_dh=False):
    """Advance the wavefield through one segment of Sg object slices.

    psi: (B, pmode, N, N) float32 pair, the wavefield at the segment entry.
    a_seg/p_seg: (B, Sg, N, N) object amplitude/phase slices (omode sliced
      out by the caller). h: (1 or B, N, N) propagator pair — in KERNEL
      k-order: when _radix_of(N) > 1 the caller must pre-permute both h
      planes with radix_perm(N) on the last two axes (multislice_dp_chain
      does); the dH cotangent comes back in the same order.
    last (static): this segment ends the chain — no propagation after its
      final slice (the far-field transform happens outside).
    need_dh (static): also produce propagator cotangents in the backward.

    Returns the exit wavefield (B, pmode, N, N) pair.
    """
    return _seg_fwd_impl(psi_r, psi_i, a_seg, p_seg, h_r, h_i, last, need_dh)


def _chain_fwd(psi_r, psi_i, a_seg, p_seg, h_r, h_i, last, need_dh):
    out = _seg_fwd_impl(psi_r, psi_i, a_seg, p_seg, h_r, h_i, last, need_dh)
    return out, (psi_r, psi_i, a_seg, p_seg, h_r, h_i)


def _chain_bwd(last, need_dh, residuals, g):
    psi_r, psi_i, a_seg, p_seg, h_r, h_i = residuals
    g_r, g_i = g
    b, pmode, n, _ = psi_r.shape
    sg = a_seg.shape[1]
    h_shared = h_r.shape[0] == 1
    mesh = get_kernel_mesh()
    b_local = b // kernel_mesh_size()
    plan = _pick_plan(b_local, sg, n, pmode, backward=True, h_shared=h_shared,
                      need_dh=need_dh)
    if plan is None:
        raise ValueError(
            f"chain_segment backward: (B={b_local}, Sg={sg}, N={n}, "
            f"pmode={pmode}) exceeds VMEM — chain_applicable would decline"
        )
    blk, pc = plan
    mats, radix = _consts(n)
    n_mats = len(mats)

    def run(g_r, g_i, psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats):
        bl = psi_r.shape[0]
        psi, pat, h, mat = _specs(sg, n, pc, blk, h_shared, radix)
        kernel = functools.partial(
            _seg_bwd_kernel, sg, n, pc, blk, bool(last), h_shared,
            bool(need_dh), _gemm_dtype(), radix, n_mats,
        )
        dh_shape = (
            jax.ShapeDtypeStruct((1, n, n), jnp.float32) if h_shared
            else jax.ShapeDtypeStruct((bl, n, n), jnp.float32)
        )
        da, dp, dpr, dpi, dhr, dhi = pl.pallas_call(
            kernel,
            grid=(bl // blk, pmode // pc),
            in_specs=[psi, psi, psi, psi, pat, pat, h, h] + [mat] * n_mats,
            out_specs=[pat, pat, psi, psi, h, h],
            out_shape=[
                jax.ShapeDtypeStruct((bl, sg, n, n), jnp.float32),
                jax.ShapeDtypeStruct((bl, sg, n, n), jnp.float32),
                jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32),
                jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32),
                dh_shape,
                dh_shape,
            ],
            scratch_shapes=[
                pltpu.VMEM((blk, sg, n, n), jnp.float32),
                pltpu.VMEM((blk, sg, n, n), jnp.float32),
            ],
            interpret=_INTERPRET,
        )(g_r, g_i, psi_r, psi_i, a_seg, p_seg, h_r, h_i, *mats)
        if mesh is not None and h_shared:
            dhr = jax.lax.psum(dhr, DATA_AXIS)
            dhi = jax.lax.psum(dhi, DATA_AXIS)
        return da, dp, dpr, dpi, dhr, dhi

    if mesh is not None:
        d = P(DATA_AXIS)
        h_spec = P() if h_shared else d
        dh_out = P() if h_shared else d
        run = jax.shard_map(
            run, mesh=mesh,
            in_specs=(d, d, d, d, d, d, h_spec, h_spec) + (P(),) * n_mats,
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

# Validated-on-hardware style heuristic (see pallas_multislice._pick_blk):
# count the simultaneously-live psi-chunk-sized buffers plus the block
# buffers Pallas double-buffers, against a conservative budget.
_VMEM_BUDGET = 13 * 1024 * 1024


def _pick_plan(b, sg, n, pmode, backward, h_shared, need_dh):
    """Largest (blk, pc) whose working set fits VMEM; None if nothing fits."""
    radix = _radix_of(n)
    mats = 6 * radix * (n // radix) ** 2 * 4
    for blk in (4, 2, 1):
        if b % blk:
            continue
        for pc in (8, 4, 2, 1):
            if pmode % pc or pc > pmode:
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
                    + sg * chunk         # remat stack
                    + 3 * chunk          # DFT temps / dchi / dpsi values
                    + 2 * pat_blk        # patch blocks (dbuf)
                    + 2 * pat_blk        # da/dp out blocks
                    + t_scr
                    + 2 * h_blk          # H in + dH out
                    + mats
                )
                if need_dh:
                    live += 2 * chunk    # K recompute temporaries
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
    """Largest segment length whose BACKWARD plan fits (fewer HBM psi
    boundaries); 0 if even Sg=1 does not fit."""
    for sg in range(min(nz, 8), 0, -1):
        if (
            _pick_plan(b, sg, n, pmode, backward=True, h_shared=h_shared,
                       need_dh=need_dh) is not None
            and _pick_plan(b, sg, n, pmode, backward=False, h_shared=h_shared,
                           need_dh=need_dh) is not None
        ):
            return sg
    return 0


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

    from ptyrad_tpu.ops.fourier import fftshift2

    dp = None
    for om in range(omode):
        psi_r, psi_i = psi0_r, psi0_i
        z0 = 0
        while z0 < nz:
            z1 = min(z0 + sg, nz)
            psi_r, psi_i = chain_segment(
                psi_r, psi_i,
                obja_patches[:, om, z0:z1], objp_patches[:, om, z0:z1],
                h_re, h_im, z1 == nz, need_dh,
            )
            z0 = z1
        y = fft2(Cplx(psi_r, psi_i), norm="ortho")
        inten = jnp.sum(y.abs2(), axis=1)  # (B, N, N), sum over pmode
        contrib = omode_occu[om] * inten
        dp = contrib if dp is None else dp + contrib
    return fftshift2(dp) + eps
