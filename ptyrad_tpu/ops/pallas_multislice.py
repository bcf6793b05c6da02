"""Fused multislice propagation as a Pallas TPU kernel with custom VJP.

Why: the XLA lowering of the multislice chain materializes every DFT-matmul
output to HBM — per batch step that is gigabytes of wavefield traffic, and it
is what bounds the step time once the MXU work is saturated (bf16 matmuls
gave only +4%). This kernel keeps the whole per-sample wavefield chain
resident in VMEM: one grid program per batch element computes

    psi = probe                                  (pmode, N, N) complex pairs
    for z in 0..Nz-2:  psi = IDFT(H * DFT(psi * T_z))
    psi *= T_{Nz-1}
    dp  = sum_p |DFT_ortho(psi)|^2 / (N*N)       (+ fftshift at the end)

with the DFT as real-arithmetic MXU matmuls against resident constant
matrices (same math as ops/fourier.py).

The backward kernel recomputes the forward psi stack in VMEM (rematerialized
— zero residual HBM traffic) and walks the chain in reverse, producing
gradients for the object patches (amplitude & phase) and the shared probe.
Real-pair transpose rule: the adjoint of multiply-by-F is multiply-by-conj(F)
= the unnormalized opposite-direction DFT matrices, since F is symmetric.

Measured status (TPU v5 lite, tBL_WSe2 shapes): numerically equivalent to
the XLA path (forward exact; gradients within the mutual f32-matmul noise of
~1e-2 relative — the same order as XLA's own bf16-pass error) at parity to
modest speedup (0.9-1.2x depending on chip load). XLA already aggregates the
batch into larger GEMMs than this per-sample-grid kernel, so the VMEM
residency win is offset by smaller matmuls; opt-in via Geometry.fwd_fused.

Scope (falls back to the jnp path otherwise — models/forward.py checks):
  - omode == 1, a single shared probe (1, pmode, N, N), a single fixed
    propagator H (1, N, N): exactly the flagship tBL_WSe2 regime
  - gradients w.r.t. object patches and probe (H fixed: no dz/tilt grads)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptyrad_tpu.ops.fourier import _dft_consts

_INTERPRET = False  # flipped by tests for CPU development


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def _consts(n: int):
    """fwd (Fr,Fi,Fr+Fi) and inv (Fr,Fi,Fr+Fi) DFT matrices as jnp arrays."""
    f = [jnp.asarray(m) for m in _dft_consts(n, inverse=False)]
    b = [jnp.asarray(m) for m in _dft_consts(n, inverse=True)]
    return f, b


def _cmatmul(fr, fi, frpi, xr, xi, side):
    """Karatsuba complex matmul against a constant matrix, inside the kernel.
    x is (pmode, N, N); 'left' contracts rows, 'right' contracts columns."""
    if side == "left":
        def mm(mat, v):
            # (j,k) x (p,k,x) -> (j,p,x) -> (p,j,x)
            out = jax.lax.dot_general(
                mat, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.transpose(1, 0, 2)
    else:
        def mm(mat, v):
            # (p,y,k) x (j,k) -> (p,y,j)
            return jax.lax.dot_general(
                v, mat, (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    t1 = mm(fr, xr)
    t2 = mm(fi, xi)
    t3 = mm(frpi, xr + xi)
    return t1 - t2, t3 - t1 - t2


def _dft2(xr, xi, mats, scale=None):
    """2D DFT of (pmode, N, N) pairs via row+column passes."""
    fr, fi, frpi = mats
    xr, xi = _cmatmul(fr, fi, frpi, xr, xi, "left")
    xr, xi = _cmatmul(fr, fi, frpi, xr, xi, "right")
    if scale is not None:
        xr, xi = xr * scale, xi * scale
    return xr, xi


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _forward_chain(probe_r, probe_i, a_pat, p_pat, h_r, h_i, fwd, inv, n, store_stack=False):
    """Shared forward recurrence. Returns final (chi_r, chi_i) after the last
    slice multiply and, optionally, the per-slice entry states psi_z."""
    nz = a_pat.shape[0]
    inv_scale = np.float32(1.0 / (n * n))
    psi_r, psi_i = probe_r, probe_i
    stack = []
    for z in range(nz):
        if store_stack:
            stack.append((psi_r, psi_i))
        tr = a_pat[z] * jnp.cos(p_pat[z])
        ti = a_pat[z] * jnp.sin(p_pat[z])
        psi_r, psi_i = _cmul(psi_r, psi_i, tr[None], ti[None])
        if z < nz - 1:
            kr, ki = _dft2(psi_r, psi_i, fwd)
            kr, ki = _cmul(kr, ki, h_r[None], h_i[None])
            psi_r, psi_i = _dft2(kr, ki, inv, scale=inv_scale)
    return psi_r, psi_i, stack


def _fwd_kernel(nz, n, pmode, a_ref, p_ref, pr_ref, pi_ref, hr_ref, hi_ref,
                fr_ref, fi_ref, frpi_ref, br_ref, bi_ref, brpi_ref, dp_ref):
    fwd = (fr_ref[:], fi_ref[:], frpi_ref[:])
    inv = (br_ref[:], bi_ref[:], brpi_ref[:])
    a_pat = a_ref[0, 0]  # (Nz, N, N)
    p_pat = p_ref[0, 0]
    chi_r, chi_i, _ = _forward_chain(
        pr_ref[0], pi_ref[0], a_pat, p_pat, hr_ref[0], hi_ref[0], fwd, inv, n
    )
    yr, yi = _dft2(chi_r, chi_i, fwd)  # unnormalized; ortho = /(N*N) on |Y|^2
    dp = jnp.sum(yr * yr + yi * yi, axis=0) * np.float32(1.0 / (n * n))
    dp_ref[0] = dp


def _bwd_kernel(nz, n, pmode, g_ref, a_ref, p_ref, pr_ref, pi_ref, hr_ref, hi_ref,
                fr_ref, fi_ref, frpi_ref, br_ref, bi_ref, brpi_ref,
                da_ref, dp_out_ref, dpr_ref, dpi_ref):
    """Recompute forward states in VMEM, then reverse the chain.

    Adjoint DFT trick: transpose of (multiply by F_fwd) = multiply by the
    UNNORMALIZED inverse matrices (conj(F), F symmetric); transpose of the
    scaled inverse pass = multiply by F_fwd * 1/(N*N).
    """
    fwd = (fr_ref[:], fi_ref[:], frpi_ref[:])
    inv = (br_ref[:], bi_ref[:], brpi_ref[:])
    a_pat = a_ref[0, 0]
    p_pat = p_ref[0, 0]
    h_r, h_i = hr_ref[0], hi_ref[0]
    inv_scale = np.float32(1.0 / (n * n))

    chi_r, chi_i, stack = _forward_chain(
        pr_ref[0], pi_ref[0], a_pat, p_pat, h_r, h_i, fwd, inv, n, store_stack=True
    )

    # d dp/d Y: dp = sum_p (Yr^2 + Yi^2)/(N*N);  dY = 2 g Y / (N*N)
    yr, yi = _dft2(chi_r, chi_i, fwd)
    g = g_ref[0] * np.float32(2.0 / (n * n))
    dyr, dyi = g[None] * yr, g[None] * yi
    # adjoint of the final fwd DFT = unnormalized inverse matrices
    dchi_r, dchi_i = _dft2(dyr, dyi, inv)

    for z in range(nz - 1, -1, -1):
        psi_r, psi_i = stack[z]
        tr = a_pat[z] * jnp.cos(p_pat[z])
        ti = a_pat[z] * jnp.sin(p_pat[z])
        # chi = psi * T:   dT = dchi * conj(psi) summed over pmode
        dtr = jnp.sum(dchi_r * psi_r + dchi_i * psi_i, axis=0)
        dti = jnp.sum(dchi_i * psi_r - dchi_r * psi_i, axis=0)
        # T = a e^{i phi}: da = Re(dT conj(e^{i phi})), dphi = a * Im(...)
        cosp, sinp = jnp.cos(p_pat[z]), jnp.sin(p_pat[z])
        da_ref[0, 0, z] = dtr * cosp + dti * sinp
        dp_out_ref[0, 0, z] = a_pat[z] * (dti * cosp - dtr * sinp)
        # dpsi = dchi * conj(T)
        dpsi_r, dpsi_i = _cmul(dchi_r, dchi_i, tr[None], -ti[None])
        if z > 0:
            # adjoint of psi_z = IDFT(H * DFT(chi_{z-1})):
            #   u = F_fwd^T-adj(dpsi) with inverse-pass scaling -> F_fwd * 1/(N*N)
            ur, ui = _dft2(dpsi_r, dpsi_i, fwd, scale=inv_scale)
            ur, ui = _cmul(ur, ui, h_r[None], -h_i[None])  # conj(H)
            dchi_r, dchi_i = _dft2(ur, ui, inv)            # adjoint of fwd DFT
        else:
            dchi_r, dchi_i = dpsi_r, dpsi_i

    # probe gradient accumulates across the (sequential) batch grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        dpr_ref[0] = jnp.zeros((pmode, n, n), jnp.float32)
        dpi_ref[0] = jnp.zeros((pmode, n, n), jnp.float32)

    dpr_ref[0] += dchi_r
    dpi_ref[0] += dchi_i


def _block(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _common_specs(b, nz, n, pmode):
    """BlockSpecs for (a_pat, p_pat, probe_r, probe_i, h_r, h_i, 6 DFT mats)."""
    per_b = lambda i: (i, 0, 0, 0, 0)
    rep4 = lambda i: (0, 0, 0, 0)
    rep3 = lambda i: (0, 0, 0)
    rep2 = lambda i: (0, 0)
    return [
        _block((1, 1, nz, n, n), per_b),   # obja patches
        _block((1, 1, nz, n, n), per_b),   # objp patches
        _block((1, pmode, n, n), rep4),    # probe re
        _block((1, pmode, n, n), rep4),    # probe im
        _block((1, n, n), rep3),           # H re
        _block((1, n, n), rep3),           # H im
    ] + [_block((n, n), rep2)] * 6


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def multislice_dp_fused(obja_p, objp_p, probe_r, probe_i, h_r, h_i):
    """dp (B, N, N) — corner-centered (caller applies fftshift + occu + eps)."""
    return _fused_fwd_impl(obja_p, objp_p, probe_r, probe_i, h_r, h_i)


def _fused_fwd_impl(obja_p, objp_p, probe_r, probe_i, h_r, h_i):
    b, _, nz, n, _ = obja_p.shape
    pmode = probe_r.shape[1]
    fwd_m, inv_m = _consts(n)
    kernel = functools.partial(_fwd_kernel, nz, n, pmode)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=_common_specs(b, nz, n, pmode),
        out_specs=_block((1, n, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.float32),
        interpret=_INTERPRET,
    )(obja_p, objp_p, probe_r, probe_i, h_r, h_i, *fwd_m, *inv_m)


def _fused_fwd(obja_p, objp_p, probe_r, probe_i, h_r, h_i):
    dp = _fused_fwd_impl(obja_p, objp_p, probe_r, probe_i, h_r, h_i)
    return dp, (obja_p, objp_p, probe_r, probe_i, h_r, h_i)


def _fused_bwd(residuals, g):
    obja_p, objp_p, probe_r, probe_i, h_r, h_i = residuals
    b, _, nz, n, _ = obja_p.shape
    pmode = probe_r.shape[1]
    fwd_m, inv_m = _consts(n)
    kernel = functools.partial(_bwd_kernel, nz, n, pmode)
    da, dp_out, dpr, dpi = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_block((1, n, n), lambda i: (i, 0, 0))] + _common_specs(b, nz, n, pmode),
        out_specs=[
            _block((1, 1, nz, n, n), lambda i: (i, 0, 0, 0, 0)),
            _block((1, 1, nz, n, n), lambda i: (i, 0, 0, 0, 0)),
            _block((1, pmode, n, n), lambda i: (0, 0, 0, 0)),
            _block((1, pmode, n, n), lambda i: (0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, nz, n, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, nz, n, n), jnp.float32),
            jax.ShapeDtypeStruct((1, pmode, n, n), jnp.float32),
            jax.ShapeDtypeStruct((1, pmode, n, n), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(g, obja_p, objp_p, probe_r, probe_i, h_r, h_i, *fwd_m, *inv_m)
    return da, dp_out, dpr, dpi, jnp.zeros_like(h_r), jnp.zeros_like(h_i)


multislice_dp_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_path_applicable(obja_patches, probes, H) -> bool:
    """True when shapes match the kernel's supported regime."""
    return (
        obja_patches.shape[1] == 1            # omode == 1
        and probes.shape[0] == 1              # shared (unshifted) probe
        and H.shape[0] == 1                   # single fixed propagator
        and obja_patches.shape[-1] == obja_patches.shape[-2]
        and obja_patches.shape[-1] <= 256
    )
