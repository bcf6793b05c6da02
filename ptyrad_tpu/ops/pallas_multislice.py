"""Fused multislice propagation as a Pallas TPU kernel with custom VJP.

Why: the XLA lowering of the multislice chain materializes every DFT-matmul
output to HBM — per batch step that is gigabytes of wavefield traffic, and
the resulting fusions run far below MXU rate (measured ~54 TFLOP/s f32 /
64 TFLOP/s bf16 vs ~197 peak: cast/copy/elementwise bound). This kernel
keeps the wavefield chain resident in VMEM: one grid program per BLOCK of
batch elements computes

    psi = probe                                  (blk*pmode, N, N) pairs
    for z in 0..Nz-2:  psi = IDFT(H * DFT(psi * T_z))
    psi *= T_{Nz-1}
    dp  = sum_p |DFT_ortho(psi)|^2 / (N*N)       (+ fftshift by the caller)

v2 design notes (vs the r1 per-sample kernel, which ended up 1.4x SLOWER
than the improved XLA path):
  - Transpose-free DFTs. A 2D DFT is two passes of "contract dim -2 against
    the symmetric DFT matrix, appending the transformed axis last":
    x(p,y,x) -> (p,x,ky) -> (p,ky,kx). Each pass is one lhs-transposed MXU
    GEMM; after two passes the orientation is standard, so the explicit
    per-pass VMEM transpose of the r1 kernel disappears.
  - Batch blocking. Each grid step processes `blk` samples, making every
    GEMM (blk*pmode*N, N)x(N, N) — tall MXU shapes instead of r1's
    per-sample (pmode*N, N).
  - GEMM dtype follows ops.fourier.set_matmul_dtype at trace time:
    'bfloat16' casts GEMM operands only (f32 accumulation via
    preferred_element_type), everything else stays f32.

The backward kernel recomputes the forward psi stack in VMEM (rematerialized
— zero residual HBM traffic) and walks the chain in reverse, producing
gradients for the object patches (amplitude & phase) and the shared probe.
Real-pair transpose rule: the adjoint of multiply-by-F is multiply-by-conj(F)
= the unnormalized opposite-direction DFT matrices, since F is symmetric.

Scope (falls back to the jnp path otherwise — models/forward.py checks):
  - omode == 1; square patches (N x N, N <= 256); working set fits VMEM
  - probes: shared (1, pmode, N, N) OR per-position (B, pmode, N, N), in
    real space or as the shifted spectrum (probe_kspace — the inverse
    transform and its adjoint run in VMEM)
  - propagator: shared (1, N, N) OR per-position (B, N, N); when slice
    thickness / tilts are optimizable, pass need_dh=True and the backward
    kernel also accumulates propagator cotangents (dz/tilt gradients flow)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ptyrad_tpu.ops.fourier import _dft_consts
from ptyrad_tpu.ops.kernel_util import (
    compiler_params as _compiler_params,
    dft2_dense as _dft2,
    gemm_dtype as _gemm_dtype,
    hmul as _hmul,
    load_h_scaled as _load_h_scaled,
    tmul as _tmul,
    unscale_dh as _unscale_dh,
)
from ptyrad_tpu.ops.mesh_env import DATA_AXIS, get_kernel_mesh, kernel_mesh_size

_INTERPRET = False

def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def _consts(n: int):
    """fwd (Fr,Fi,Fr+Fi) and inv (Fr,Fi,Fr+Fi) DFT matrices as jnp arrays."""
    f = [jnp.asarray(m) for m in _dft_consts(n, inverse=False)]
    b = [jnp.asarray(m) for m in _dft_consts(n, inverse=True)]
    return f, b




def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _forward_chain(psi_r, psi_i, a_pat, p_pat, h_r, h_i, fwd, inv, blk, pmode, n,
                   dt, store_stack=False):
    """Shared forward recurrence on (blk*pmode, N, N) pairs. a_pat/p_pat are
    (blk, Nz, N, N); h is (N, N) or (blk, N, N). Returns final (chi_r, chi_i)
    and optionally the per-slice entry states."""
    nz = a_pat.shape[1]
    # h arrives pre-scaled by 1/(N*N) (see _load_h_scaled): the inverse DFT's
    # normalization rides the tiny propagator load, not two full-wavefield
    # VPU multiplies per propagation
    stack = []
    for z in range(nz):
        if store_stack:
            stack.append((psi_r, psi_i))
        tr = a_pat[:, z] * jnp.cos(p_pat[:, z])
        ti = a_pat[:, z] * jnp.sin(p_pat[:, z])
        psi_r, psi_i = _tmul(psi_r, psi_i, tr, ti, blk, pmode, n)
        if z < nz - 1:
            kr, ki = _dft2(psi_r, psi_i, fwd, dt)
            kr, ki = _hmul(kr, ki, h_r, h_i, False, blk, pmode, n)
            psi_r, psi_i = _dft2(kr, ki, inv, dt)
    return psi_r, psi_i, stack


def _load_probe(pr_ref, pi_ref, shared, kspace, inv, dt, blk, pmode, n):
    """Initial wavefield (blk*pmode, N, N) from a shared (1, pmode, N, N) or
    per-position (blk, pmode, N, N) probe block. When kspace, the block is
    the shifted SPECTRUM (ops/shift.fourier_shift_kspace) and the inverse
    transform runs here in VMEM."""
    if shared:
        pr = jnp.broadcast_to(pr_ref[0][None], (blk, pmode, n, n))
        pi = jnp.broadcast_to(pi_ref[0][None], (blk, pmode, n, n))
    else:
        pr, pi = pr_ref[...], pi_ref[...]
    pr = pr.reshape(blk * pmode, n, n)
    pi = pi.reshape(blk * pmode, n, n)
    if kspace:
        pr, pi = _dft2(pr, pi, inv, dt, scale=np.float32(1.0 / (n * n)))
    return pr, pi


def _fwd_kernel(nz, n, pmode, blk, shared, h_shared, kspace, dt,
                a_ref, p_ref, pr_ref, pi_ref, hr_ref, hi_ref,
                fr_ref, fi_ref, frpi_ref, br_ref, bi_ref, brpi_ref, dp_ref):
    fwd = (fr_ref[:], fi_ref[:], frpi_ref[:])
    inv = (br_ref[:], bi_ref[:], brpi_ref[:])
    a_pat = a_ref[:, 0]  # (blk, Nz, N, N)
    p_pat = p_ref[:, 0]
    psi_r, psi_i = _load_probe(pr_ref, pi_ref, shared, kspace, inv, dt, blk, pmode, n)
    h_r, h_i = _load_h_scaled(hr_ref, hi_ref, h_shared, n)
    chi_r, chi_i, _ = _forward_chain(
        psi_r, psi_i, a_pat, p_pat, h_r, h_i, fwd, inv, blk, pmode, n, dt
    )
    yr, yi = _dft2(chi_r, chi_i, fwd, dt)  # unnormalized; ortho = /(N*N) on |Y|^2
    inten = (yr * yr + yi * yi).reshape(blk, pmode, n, n)
    dp_ref[...] = jnp.sum(inten, axis=1) * np.float32(1.0 / (n * n))


def _bwd_kernel(nz, n, pmode, blk, shared, h_shared, need_dh, kspace, dt,
                g_ref, a_ref, p_ref, pr_ref, pi_ref, hr_ref, hi_ref,
                fr_ref, fi_ref, frpi_ref, br_ref, bi_ref, brpi_ref,
                da_ref, dp_out_ref, dpr_ref, dpi_ref, dhr_ref, dhi_ref):
    """Recompute forward states in VMEM, then reverse the chain.

    Adjoint DFT trick: transpose of (multiply by F_fwd) = multiply by the
    UNNORMALIZED inverse matrices (conj(F), F symmetric); transpose of the
    scaled inverse pass = multiply by F_fwd * 1/(N*N).

    When need_dh (slice thickness / tilts optimizable), the propagator
    cotangent is accumulated too: for each inter-slice step
    psi_{z+1} = IDFT(H ∘ K_z) with K_z = DFT(chi_z), the cotangent of the
    product is dM_z (= the scaled fwd-DFT of dpsi_{z+1}, computed anyway),
    and dH += sum_p dM_z ∘ conj(K_z) — K_z costs one extra DFT per slice.
    """
    fwd = (fr_ref[:], fi_ref[:], frpi_ref[:])
    inv = (br_ref[:], bi_ref[:], brpi_ref[:])
    a_pat = a_ref[:, 0]
    p_pat = p_ref[:, 0]
    h_r, h_i = _load_h_scaled(hr_ref, hi_ref, h_shared, n)

    psi0_r, psi0_i = _load_probe(pr_ref, pi_ref, shared, kspace, inv, dt, blk, pmode, n)
    chi_r, chi_i, stack = _forward_chain(
        psi0_r, psi0_i, a_pat, p_pat, h_r, h_i, fwd, inv, blk, pmode, n, dt,
        store_stack=True,
    )
    yr, yi = _dft2(chi_r, chi_i, fwd, dt)
    _bwd_from_g(nz, n, pmode, blk, shared, h_shared, need_dh, kspace, dt,
                g_ref[...], stack, yr, yi, a_pat, p_pat, h_r, h_i, fwd, inv,
                da_ref, dp_out_ref, dpr_ref, dpi_ref, dhr_ref, dhi_ref)


def _bwd_from_g(nz, n, pmode, blk, shared, h_shared, need_dh, kspace, dt,
                g2d, stack, yr, yi, a_pat, p_pat, h_r, h_i, fwd, inv,
                da_ref, dp_out_ref, dpr_ref, dpi_ref, dhr_ref, dhi_ref):
    """Adjoint chain walk shared by the plain and loss-folded backward
    kernels: g2d (blk, N, N) is the cotangent of the corner-centered dp."""
    inv_scale = np.float32(1.0 / (n * n))
    # d dp/d Y: dp = sum_p (Yr^2 + Yi^2)/(N*N);  dY = 2 g Y / (N*N)
    g = g2d * np.float32(2.0 / (n * n))  # (blk, N, N)
    gp = jnp.broadcast_to(g[:, None], (blk, pmode, n, n)).reshape(blk * pmode, n, n)
    dyr, dyi = gp * yr, gp * yi
    # adjoint of the final fwd DFT = unnormalized inverse matrices
    dchi_r, dchi_i = _dft2(dyr, dyi, inv, dt)

    dh_acc_r = dh_acc_i = None
    cosp_z = sinp_z = None  # carried T components for slice z (computed once)
    for z in range(nz - 1, -1, -1):
        psi_r, psi_i = stack[z]
        if cosp_z is None:
            cosp_z, sinp_z = jnp.cos(p_pat[:, z]), jnp.sin(p_pat[:, z])
        cosp, sinp = cosp_z, sinp_z
        tr = a_pat[:, z] * cosp
        ti = a_pat[:, z] * sinp
        # chi = psi * T:   dT = dchi * conj(psi) summed over pmode
        prod_r = (dchi_r * psi_r + dchi_i * psi_i).reshape(blk, pmode, n, n)
        prod_i = (dchi_i * psi_r - dchi_r * psi_i).reshape(blk, pmode, n, n)
        dtr = jnp.sum(prod_r, axis=1)
        dti = jnp.sum(prod_i, axis=1)
        # T = a e^{i phi}: da = Re(dT conj(e^{i phi})), dphi = a * Im(...)
        da_ref[:, 0, z] = dtr * cosp + dti * sinp
        dp_out_ref[:, 0, z] = a_pat[:, z] * (dti * cosp - dtr * sinp)
        # dpsi = dchi * conj(T)
        dpsi_r, dpsi_i = _tmul(dchi_r, dchi_i, tr, -ti, blk, pmode, n)
        cosp_z = sinp_z = None
        if z > 0:
            # adjoint of psi_z = IDFT(H' * DFT(chi_{z-1})) with the 1/(N*N)
            # riding the pre-scaled H' (dH below is w.r.t. H' — the wrapper
            # multiplies it back)
            ur, ui = _dft2(dpsi_r, dpsi_i, fwd, dt)  # = dM_{z-1} w.r.t. H'
            # T_{z-1} is needed here (for K) and by the next iteration; compute once
            cosp_z, sinp_z = jnp.cos(p_pat[:, z - 1]), jnp.sin(p_pat[:, z - 1])
            if need_dh:
                # K_{z-1} = DFT(psi_{z-1} ∘ T_{z-1}); dH += dM ∘ conj(K)
                pzr, pzi = stack[z - 1]
                czr, czi = _tmul(pzr, pzi, a_pat[:, z - 1] * cosp_z,
                                 a_pat[:, z - 1] * sinp_z, blk, pmode, n)
                kzr, kzi = _dft2(czr, czi, fwd, dt)
                contrib_r = (ur * kzr + ui * kzi).reshape(blk, pmode, n, n).sum(1)
                contrib_i = (ui * kzr - ur * kzi).reshape(blk, pmode, n, n).sum(1)
                if dh_acc_r is None:
                    dh_acc_r, dh_acc_i = contrib_r, contrib_i
                else:
                    dh_acc_r = dh_acc_r + contrib_r
                    dh_acc_i = dh_acc_i + contrib_i
            ur, ui = _hmul(ur, ui, h_r, h_i, True, blk, pmode, n)  # conj(H)
            dchi_r, dchi_i = _dft2(ur, ui, inv, dt)                # adjoint of fwd DFT
        else:
            dchi_r, dchi_i = dpsi_r, dpsi_i

    if kspace:
        # adjoint of the in-kernel scaled IDFT that produced psi0 from the
        # shifted spectrum: multiply by F_fwd * 1/(N*N)
        dchi_r, dchi_i = _dft2(dchi_r, dchi_i, fwd, dt, scale=inv_scale)
    if shared:
        # probe gradient accumulates across the (sequential) batch grid
        @pl.when(pl.program_id(0) == 0)
        def _():
            dpr_ref[0] = jnp.zeros((pmode, n, n), jnp.float32)
            dpi_ref[0] = jnp.zeros((pmode, n, n), jnp.float32)

        dpr_ref[0] += jnp.sum(dchi_r.reshape(blk, pmode, n, n), axis=0)
        dpi_ref[0] += jnp.sum(dchi_i.reshape(blk, pmode, n, n), axis=0)
    else:
        # per-position probes: the gradient is per sample, no accumulation
        dpr_ref[...] = dchi_r.reshape(blk, pmode, n, n)
        dpi_ref[...] = dchi_i.reshape(blk, pmode, n, n)

    if need_dh and nz > 1:
        if h_shared:
            @pl.when(pl.program_id(0) == 0)
            def _():
                dhr_ref[0] = jnp.zeros((n, n), jnp.float32)
                dhi_ref[0] = jnp.zeros((n, n), jnp.float32)

            dhr_ref[0] += jnp.sum(dh_acc_r, axis=0)
            dhi_ref[0] += jnp.sum(dh_acc_i, axis=0)
        else:
            dhr_ref[...] = dh_acc_r
            dhi_ref[...] = dh_acc_i
    else:
        if h_shared:
            @pl.when(pl.program_id(0) == 0)
            def _():
                dhr_ref[0] = jnp.zeros((n, n), jnp.float32)
                dhi_ref[0] = jnp.zeros((n, n), jnp.float32)
        else:
            dhr_ref[...] = jnp.zeros_like(dhr_ref)
            dhi_ref[...] = jnp.zeros_like(dhi_ref)


def _block(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _common_specs(nz, n, pmode, blk, shared, h_shared):
    """BlockSpecs for (a_pat, p_pat, probe_r, probe_i, h_r, h_i, 6 DFT mats)."""
    per_b = lambda i: (i, 0, 0, 0, 0)
    rep4 = lambda i: (0, 0, 0, 0)
    per_b4 = lambda i: (i, 0, 0, 0)
    rep3 = lambda i: (0, 0, 0)
    per_b3 = lambda i: (i, 0, 0)
    rep2 = lambda i: (0, 0)
    probe_spec = (
        _block((1, pmode, n, n), rep4) if shared
        else _block((blk, pmode, n, n), per_b4)
    )
    h_spec = (
        _block((1, n, n), rep3) if h_shared
        else _block((blk, n, n), per_b3)
    )
    return [
        _block((blk, 1, nz, n, n), per_b),  # obja patches
        _block((blk, 1, nz, n, n), per_b),  # objp patches
        probe_spec,                          # probe re
        probe_spec,                          # probe im
        h_spec,                              # H re
        h_spec,                              # H im
    ] + [_block((n, n), rep2)] * 6


# VMEM working-set heuristic: the forward keeps ~4 psi-sized pair buffers
# live (psi, GEMM temps, double-buffered patch block); the backward adds the
# nz-entry rematerialization stack.
_VMEM_BUDGET = 13 * 1024 * 1024


def _live_bytes(blk, nz, n, pmode, backward, shared=True, h_shared=True,
                need_dh=False, loss=False) -> int:
    """Modeled VMEM working set of one kernel launch at batch block `blk` —
    the single source for block planning (_pick_blk) AND the Mosaic
    scoped-vmem ceiling request (kernel_util.compiler_params at each
    pallas_call site), so the ceiling tracks the plan actually launched.

    loss=True models the loss-folded variant's extra per-block buffers
    (double-buffered meas_cc block, mask tile, dp/mp/diff temporaries)."""
    pair = 2 * blk * pmode * n * n * 4
    patches = 2 * 2 * blk * nz * n * n * 4
    mats = 6 * n * n * 4
    h_block = 2 * (blk if not h_shared else 1) * n * n * 4
    live = 4 * pair + patches + mats + 2 * h_block
    if not shared:
        live += pair  # per-position probe block (and its bwd output)
    if backward:
        live += nz * pair + pair
        live += h_block  # dH output blocks
        if need_dh:
            live += 2 * pair  # K_z/chi_z recompute temporaries + dh acc
    if loss:
        # double-buffered meas_cc block + mask tile + dp/mp/diff/d2 (fwd)
        # or the g2d cotangent rows (bwd)
        live += 2 * blk * n * n * 4 + 2 * blk * 8 * 128 * 4
        live += 4 * blk * n * n * 4
    return live


def _pick_blk(b, nz, n, pmode, backward, shared=True, h_shared=True, need_dh=False,
              loss=False):
    """Largest batch block whose working set fits VMEM; None if even blk=1
    doesn't fit (callers must fall back to the jnp path)."""
    for blk in (8, 4, 2, 1):
        if b % blk:
            continue
        if _live_bytes(blk, nz, n, pmode, backward, shared, h_shared,
                       need_dh, loss) <= _VMEM_BUDGET:
            return blk
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def multislice_dp_fused(obja_p, objp_p, probe_r, probe_i, h_r, h_i,
                        need_dh=False, probe_kspace=False):
    """dp (B, N, N) — corner-centered (caller applies fftshift + occu + eps).

    need_dh (static): compute propagator cotangents in the backward kernel
    (required when slice thickness or tilts are optimizable — H then depends
    on params); False skips the extra per-slice DFT and returns zero dH.

    probe_kspace (static): the probe inputs are the shifted SPECTRUM
    (ops/shift.fourier_shift_kspace); the inverse transform (and its adjoint)
    run inside the kernel, keeping the batch-wide probe-shift DFT off the
    XLA path.
    """
    return _fused_fwd_impl(obja_p, objp_p, probe_r, probe_i, h_r, h_i, probe_kspace)


def _operand_specs(shared, h_shared):
    """shard_map PartitionSpecs for (obja_p, objp_p, probe_r/i, h_r/i, 6 DFT
    mats): batch-major operands split over 'data', shared ones replicate."""
    d = P(DATA_AXIS)
    probe = P() if shared else d
    h = P() if h_shared else d
    return (d, d, probe, probe, h, h) + (P(),) * 6


def _fused_fwd_impl(obja_p, objp_p, probe_r, probe_i, h_r, h_i, probe_kspace=False):
    b, _, nz, n, _ = obja_p.shape
    pmode = probe_r.shape[1]
    shared = probe_r.shape[0] == 1
    h_shared = h_r.shape[0] == 1
    mesh = get_kernel_mesh()
    b_local = b // kernel_mesh_size()
    blk = _pick_blk(b_local, nz, n, pmode, backward=False, shared=shared, h_shared=h_shared)
    if blk is None:
        raise ValueError(
            f"multislice_dp_fused: working set for shapes (B={b_local}, nz={nz}, "
            f"N={n}, pmode={pmode}) exceeds the VMEM budget even at blk=1 — "
            "use the jnp path (fused_path_applicable would have declined this)"
        )
    fwd_m, inv_m = _consts(n)

    def run(obja_p, objp_p, probe_r, probe_i, h_r, h_i, *mats):
        # shapes here are shard-LOCAL when wrapped in shard_map
        bl = obja_p.shape[0]
        kernel = functools.partial(
            _fwd_kernel, nz, n, pmode, blk, shared, h_shared, bool(probe_kspace),
            _gemm_dtype(),
        )
        return pl.pallas_call(
            kernel,
            grid=(bl // blk,),
            in_specs=_common_specs(nz, n, pmode, blk, shared, h_shared),
            out_specs=_block((blk, n, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bl, n, n), jnp.float32),
            interpret=_INTERPRET,
            compiler_params=_compiler_params(_live_bytes(blk, nz, n, pmode, False, shared, h_shared)),
        )(obja_p, objp_p, probe_r, probe_i, h_r, h_i, *mats)

    if mesh is not None:
        run = jax.shard_map(
            run, mesh=mesh, in_specs=_operand_specs(shared, h_shared),
            out_specs=P(DATA_AXIS), check_vma=False,
        )
    return run(obja_p, objp_p, probe_r, probe_i, h_r, h_i, *fwd_m, *inv_m)


def _fused_fwd(obja_p, objp_p, probe_r, probe_i, h_r, h_i,
               need_dh=False, probe_kspace=False):
    dp = _fused_fwd_impl(obja_p, objp_p, probe_r, probe_i, h_r, h_i, probe_kspace)
    return dp, (obja_p, objp_p, probe_r, probe_i, h_r, h_i)


def _fused_bwd(need_dh, probe_kspace, residuals, g):
    obja_p, objp_p, probe_r, probe_i, h_r, h_i = residuals
    b, _, nz, n, _ = obja_p.shape
    pmode = probe_r.shape[1]
    shared = probe_r.shape[0] == 1
    h_shared = h_r.shape[0] == 1
    mesh = get_kernel_mesh()
    b_local = b // kernel_mesh_size()
    blk = _pick_blk(b_local, nz, n, pmode, backward=True, shared=shared,
                    h_shared=h_shared, need_dh=bool(need_dh))
    if blk is None:
        raise ValueError(
            f"multislice_dp_fused backward: working set for shapes (B={b_local}, "
            f"nz={nz}, N={n}, pmode={pmode}) exceeds the VMEM budget even at "
            "blk=1 — use the jnp path (fused_path_applicable would have declined this)"
        )
    fwd_m, inv_m = _consts(n)

    def run(g, obja_p, objp_p, probe_r, probe_i, h_r, h_i, *mats):
        bl = obja_p.shape[0]
        kernel = functools.partial(
            _bwd_kernel, nz, n, pmode, blk, shared, h_shared, bool(need_dh),
            bool(probe_kspace), _gemm_dtype(),
        )
        if shared:
            dprobe_spec = _block((1, pmode, n, n), lambda i: (0, 0, 0, 0))
            dprobe_shape = jax.ShapeDtypeStruct((1, pmode, n, n), jnp.float32)
        else:
            dprobe_spec = _block((blk, pmode, n, n), lambda i: (i, 0, 0, 0))
            dprobe_shape = jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32)
        if h_shared:
            dh_spec = _block((1, n, n), lambda i: (0, 0, 0))
            dh_shape = jax.ShapeDtypeStruct((1, n, n), jnp.float32)
        else:
            dh_spec = _block((blk, n, n), lambda i: (i, 0, 0))
            dh_shape = jax.ShapeDtypeStruct((bl, n, n), jnp.float32)
        da, dp_out, dpr, dpi, dhr, dhi = pl.pallas_call(
            kernel,
            grid=(bl // blk,),
            in_specs=[_block((blk, n, n), lambda i: (i, 0, 0))]
            + _common_specs(nz, n, pmode, blk, shared, h_shared),
            out_specs=[
                _block((blk, 1, nz, n, n), lambda i: (i, 0, 0, 0, 0)),
                _block((blk, 1, nz, n, n), lambda i: (i, 0, 0, 0, 0)),
                dprobe_spec,
                dprobe_spec,
                dh_spec,
                dh_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bl, 1, nz, n, n), jnp.float32),
                jax.ShapeDtypeStruct((bl, 1, nz, n, n), jnp.float32),
                dprobe_shape,
                dprobe_shape,
                dh_shape,
                dh_shape,
            ],
            interpret=_INTERPRET,
            compiler_params=_compiler_params(_live_bytes(blk, nz, n, pmode, True, shared, h_shared, bool(need_dh))),
        )(g, obja_p, objp_p, probe_r, probe_i, h_r, h_i, *mats)
        if need_dh:
            # the kernel accumulates dH w.r.t. the load_h_scaled propagator
            dhr, dhi = _unscale_dh(dhr, dhi, n)
        if mesh is not None:
            # shared-parameter cotangents reduce across the data shards —
            # the DDP gradient allreduce, riding ICI inside the step
            if shared:
                dpr = jax.lax.psum(dpr, DATA_AXIS)
                dpi = jax.lax.psum(dpi, DATA_AXIS)
            if h_shared:
                dhr = jax.lax.psum(dhr, DATA_AXIS)
                dhi = jax.lax.psum(dhi, DATA_AXIS)
        return da, dp_out, dpr, dpi, dhr, dhi

    if mesh is not None:
        d = P(DATA_AXIS)
        out_specs = (
            d, d,
            P() if shared else d, P() if shared else d,
            P() if h_shared else d, P() if h_shared else d,
        )
        run = jax.shard_map(
            run, mesh=mesh, in_specs=(d,) + _operand_specs(shared, h_shared),
            out_specs=out_specs, check_vma=False,
        )
    return run(g, obja_p, objp_p, probe_r, probe_i, h_r, h_i, *fwd_m, *inv_m)


multislice_dp_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Loss-folded variant: the loss_single data term's partial sums are computed
# IN-KERNEL, so the per-step XLA glue (fftshift of dp, sqrt/pow/mse passes,
# the dp and g_dp HBM round-trips) disappears from the training step. The
# kernel emits s1 = sum mask*((dp+eps)^p - meas^p)^2 and s2 = sum mask*meas^p
# (dp corner-centered, meas pre-ifftshifted by the caller — the loss reduces
# over pixels, so the common fftshift permutation cancels); the scalar tail
# L = w*sqrt(s1/(N^2*sum mask))/(s2/(N^2*sum mask)) runs in XLA where
# autodiff supplies ds1's upstream cotangent to the backward kernel.
# ---------------------------------------------------------------------------


def _pow_p(x, p):
    if p == 1.0:
        return x
    if p == 0.5:
        return jnp.sqrt(x)
    return jnp.power(x, np.float32(p))


def _pow_pm1(x, p):
    """x^(p-1); x is strictly positive (dp + eps)."""
    if p == 1.0:
        return jnp.ones_like(x)
    if p == 0.5:
        return jax.lax.rsqrt(x)
    return jnp.power(x, np.float32(p - 1.0))


def _fwd_loss_kernel(nz, n, pmode, blk, shared, h_shared, kspace, p, eps, dt,
                     mask_ref, a_ref, p_ref, pr_ref, pi_ref, hr_ref, hi_ref,
                     meas_ref, fr_ref, fi_ref, frpi_ref, br_ref, bi_ref,
                     brpi_ref, out_ref):
    """Forward chain + in-kernel data-term partials. out row i holds
    [s1_part, s2_part, 0...] for this batch block."""
    fwd = (fr_ref[:], fi_ref[:], frpi_ref[:])
    inv = (br_ref[:], bi_ref[:], brpi_ref[:])
    a_pat = a_ref[:, 0]
    p_pat = p_ref[:, 0]
    psi_r, psi_i = _load_probe(pr_ref, pi_ref, shared, kspace, inv, dt, blk, pmode, n)
    h_r, h_i = _load_h_scaled(hr_ref, hi_ref, h_shared, n)
    chi_r, chi_i, _ = _forward_chain(
        psi_r, psi_i, a_pat, p_pat, h_r, h_i, fwd, inv, blk, pmode, n, dt
    )
    yr, yi = _dft2(chi_r, chi_i, fwd, dt)
    inten = (yr * yr + yi * yi).reshape(blk, pmode, n, n)
    dp = jnp.sum(inten, axis=1) * np.float32(1.0 / (n * n))
    mp = _pow_p(meas_ref[...], p)
    diff = _pow_p(dp + np.float32(eps), p) - mp
    # per-sample mask weights applied scalar-by-scalar: Mosaic cannot lower
    # a (blk, 1, 1) -> (blk, N, N) vector broadcast, and blk <= 8
    d2 = diff * diff
    s1 = jnp.float32(0.0)
    s2 = jnp.float32(0.0)
    for ib in range(blk):
        w_ib = mask_ref[ib, 0, 0]
        s1 = s1 + w_ib * jnp.sum(d2[ib])
        s2 = s2 + w_ib * jnp.sum(mp[ib])
    # (8, 128) tile with s1 at [0,0] and s2 at [0,1] (TPU blocks need the
    # last two dims tiled (8, 128))
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    tile = jnp.where(
        (row == 0) & (col == 0), s1,
        jnp.where((row == 0) & (col == 1), s2, np.float32(0.0)),
    )
    out_ref[...] = tile[None]


def _bwd_loss_kernel(nz, n, pmode, blk, shared, h_shared, need_dh, kspace, p,
                     eps, dt,
                     c_ref, mask_ref, a_ref, p_ref, pr_ref, pi_ref, hr_ref,
                     hi_ref, meas_ref, fr_ref, fi_ref, frpi_ref, br_ref,
                     bi_ref, brpi_ref,
                     da_ref, dp_out_ref, dpr_ref, dpi_ref, dhr_ref, dhi_ref):
    """Backward with the dp cotangent computed in-kernel from meas:
    g = c * mask * 2p * ((dp+eps)^p - meas^p) * (dp+eps)^(p-1), where c is
    the upstream cotangent of s1 (XLA autodiff of the scalar loss tail)."""
    fwd = (fr_ref[:], fi_ref[:], frpi_ref[:])
    inv = (br_ref[:], bi_ref[:], brpi_ref[:])
    a_pat = a_ref[:, 0]
    p_pat = p_ref[:, 0]
    h_r, h_i = _load_h_scaled(hr_ref, hi_ref, h_shared, n)

    psi0_r, psi0_i = _load_probe(pr_ref, pi_ref, shared, kspace, inv, dt, blk, pmode, n)
    chi_r, chi_i, stack = _forward_chain(
        psi0_r, psi0_i, a_pat, p_pat, h_r, h_i, fwd, inv, blk, pmode, n, dt,
        store_stack=True,
    )
    yr, yi = _dft2(chi_r, chi_i, fwd, dt)
    inten = (yr * yr + yi * yi).reshape(blk, pmode, n, n)
    dp = jnp.sum(inten, axis=1) * np.float32(1.0 / (n * n))
    dpe = dp + np.float32(eps)
    mp = _pow_p(meas_ref[...], p)
    # per-sample mask as a scalar coefficient per row (see forward kernel)
    base = c_ref[0, 0] * np.float32(2.0 * p)
    rows = []
    for ib in range(blk):
        coef = base * mask_ref[ib, 0, 0]
        rows.append(coef * ((_pow_p(dpe[ib], p) - mp[ib]) * _pow_pm1(dpe[ib], p)))
    g2d = jnp.stack(rows, axis=0)
    _bwd_from_g(nz, n, pmode, blk, shared, h_shared, need_dh, kspace, dt,
                g2d, stack, yr, yi, a_pat, p_pat, h_r, h_i, fwd, inv,
                da_ref, dp_out_ref, dpr_ref, dpi_ref, dhr_ref, dhi_ref)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def multislice_loss_sums_fused(obja_p, objp_p, probe_r, probe_i, h_r, h_i,
                               meas_cc, mask_pad, dp_pow, eps, need_dh=False,
                               probe_kspace=False):
    """(s1, s2) data-term partial sums with the forward chain AND the loss
    comparison fused into one kernel.

    meas_cc: measurements ifftshift2-ed to the kernel's corner-centered dp
    order. mask_pad: (B, 8, 128) f32 with the per-sample batch mask at
    [:, 0, 0] (tile-padded for VMEM). dp_pow/eps are STATIC floats. meas_cc and
    mask_pad are loss data, not optimization variables — their cotangents
    are returned as zeros.
    """
    return _loss_fwd_impl(obja_p, objp_p, probe_r, probe_i, h_r, h_i,
                          meas_cc, mask_pad, dp_pow, eps, probe_kspace)


def _loss_fwd_impl(obja_p, objp_p, probe_r, probe_i, h_r, h_i, meas_cc,
                   mask_pad, dp_pow, eps, probe_kspace):
    b, _, nz, n, _ = obja_p.shape
    pmode = probe_r.shape[1]
    shared = probe_r.shape[0] == 1
    h_shared = h_r.shape[0] == 1
    mesh = get_kernel_mesh()
    b_local = b // kernel_mesh_size()
    blk = _pick_blk(b_local, nz, n, pmode, backward=False, shared=shared,
                    h_shared=h_shared, loss=True)
    if blk is None:
        raise ValueError(
            "multislice_loss_sums_fused: shapes exceed the VMEM budget — "
            "fused_path_applicable would have declined this"
        )
    fwd_m, inv_m = _consts(n)

    def run(obja_p, objp_p, probe_r, probe_i, h_r, h_i, meas_cc, mask_pad, *mats):
        bl = obja_p.shape[0]
        kernel = functools.partial(
            _fwd_loss_kernel, nz, n, pmode, blk, shared, h_shared,
            bool(probe_kspace), float(dp_pow), float(eps), _gemm_dtype(),
        )
        specs = _common_specs(nz, n, pmode, blk, shared, h_shared)
        out = pl.pallas_call(
            kernel,
            grid=(bl // blk,),
            in_specs=[_block((blk, 8, 128), lambda i: (i, 0, 0))] + specs[:6]
            + [_block((blk, n, n), lambda i: (i, 0, 0))] + specs[6:],
            out_specs=_block((1, 8, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bl // blk, 8, 128), jnp.float32),
            interpret=_INTERPRET,
            compiler_params=_compiler_params(_live_bytes(blk, nz, n, pmode, False, shared, h_shared, loss=True)),
        )(mask_pad, obja_p, objp_p, probe_r, probe_i, h_r, h_i, meas_cc, *mats)
        s1 = jnp.sum(out[:, 0, 0])
        s2 = jnp.sum(out[:, 0, 1])
        if mesh is not None:
            s1 = jax.lax.psum(s1, DATA_AXIS)
            s2 = jax.lax.psum(s2, DATA_AXIS)
        return s1, s2

    if mesh is not None:
        d = P(DATA_AXIS)
        probe = P() if shared else d
        h = P() if h_shared else d
        run = jax.shard_map(
            run, mesh=mesh,
            in_specs=(d, d, probe, probe, h, h, d, d) + (P(),) * 6,
            out_specs=(P(), P()), check_vma=False,
        )
    return run(obja_p, objp_p, probe_r, probe_i, h_r, h_i, meas_cc, mask_pad,
               *fwd_m, *inv_m)


def _loss_fused_fwd(obja_p, objp_p, probe_r, probe_i, h_r, h_i, meas_cc,
                    mask_pad, dp_pow, eps, need_dh, probe_kspace):
    out = _loss_fwd_impl(obja_p, objp_p, probe_r, probe_i, h_r, h_i, meas_cc,
                         mask_pad, dp_pow, eps, probe_kspace)
    return out, (obja_p, objp_p, probe_r, probe_i, h_r, h_i, meas_cc, mask_pad)


def _loss_fused_bwd(dp_pow, eps, need_dh, probe_kspace, residuals, g):
    obja_p, objp_p, probe_r, probe_i, h_r, h_i, meas_cc, mask_pad = residuals
    g1, _g2 = g  # s2 is meas-only: no model cotangent
    b, _, nz, n, _ = obja_p.shape
    pmode = probe_r.shape[1]
    shared = probe_r.shape[0] == 1
    h_shared = h_r.shape[0] == 1
    mesh = get_kernel_mesh()
    b_local = b // kernel_mesh_size()
    blk = _pick_blk(b_local, nz, n, pmode, backward=True, shared=shared,
                    h_shared=h_shared, need_dh=bool(need_dh), loss=True)
    if blk is None:
        raise ValueError(
            "multislice_loss_sums_fused backward: shapes exceed the VMEM "
            "budget — fused_path_applicable would have declined this"
        )
    fwd_m, inv_m = _consts(n)
    # upstream ds1 cotangent as an (8, 128) VMEM tile the kernel reads at [0,0]
    c_row = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(g1)

    def run(c_row, obja_p, objp_p, probe_r, probe_i, h_r, h_i, meas_cc,
            mask_pad, *mats):
        bl = obja_p.shape[0]
        kernel = functools.partial(
            _bwd_loss_kernel, nz, n, pmode, blk, shared, h_shared,
            bool(need_dh), bool(probe_kspace), float(dp_pow), float(eps),
            _gemm_dtype(),
        )
        if shared:
            dprobe_spec = _block((1, pmode, n, n), lambda i: (0, 0, 0, 0))
            dprobe_shape = jax.ShapeDtypeStruct((1, pmode, n, n), jnp.float32)
        else:
            dprobe_spec = _block((blk, pmode, n, n), lambda i: (i, 0, 0, 0))
            dprobe_shape = jax.ShapeDtypeStruct((bl, pmode, n, n), jnp.float32)
        if h_shared:
            dh_spec = _block((1, n, n), lambda i: (0, 0, 0))
            dh_shape = jax.ShapeDtypeStruct((1, n, n), jnp.float32)
        else:
            dh_spec = _block((blk, n, n), lambda i: (i, 0, 0))
            dh_shape = jax.ShapeDtypeStruct((bl, n, n), jnp.float32)
        specs = _common_specs(nz, n, pmode, blk, shared, h_shared)
        da, dp_out, dpr, dpi, dhr, dhi = pl.pallas_call(
            kernel,
            grid=(bl // blk,),
            in_specs=[
                _block((8, 128), lambda i: (0, 0)),
                _block((blk, 8, 128), lambda i: (i, 0, 0)),
            ] + specs[:6] + [_block((blk, n, n), lambda i: (i, 0, 0))] + specs[6:],
            out_specs=[
                _block((blk, 1, nz, n, n), lambda i: (i, 0, 0, 0, 0)),
                _block((blk, 1, nz, n, n), lambda i: (i, 0, 0, 0, 0)),
                dprobe_spec,
                dprobe_spec,
                dh_spec,
                dh_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bl, 1, nz, n, n), jnp.float32),
                jax.ShapeDtypeStruct((bl, 1, nz, n, n), jnp.float32),
                dprobe_shape,
                dprobe_shape,
                dh_shape,
                dh_shape,
            ],
            interpret=_INTERPRET,
            compiler_params=_compiler_params(_live_bytes(blk, nz, n, pmode, True, shared, h_shared, bool(need_dh), loss=True)),
        )(c_row, mask_pad, obja_p, objp_p, probe_r, probe_i, h_r, h_i,
          meas_cc, *mats)
        if need_dh:
            # the kernel accumulates dH w.r.t. the load_h_scaled propagator
            dhr, dhi = _unscale_dh(dhr, dhi, n)
        if mesh is not None:
            if shared:
                dpr = jax.lax.psum(dpr, DATA_AXIS)
                dpi = jax.lax.psum(dpi, DATA_AXIS)
            if h_shared:
                dhr = jax.lax.psum(dhr, DATA_AXIS)
                dhi = jax.lax.psum(dhi, DATA_AXIS)
        return da, dp_out, dpr, dpi, dhr, dhi

    if mesh is not None:
        d = P(DATA_AXIS)
        probe = P() if shared else d
        h = P() if h_shared else d
        out_specs = (d, d, probe, probe, h, h)
        run = jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(), d, d, probe, probe, h, h, d, d) + (P(),) * 6,
            out_specs=out_specs, check_vma=False,
        )
    da, dp_out, dpr, dpi, dhr, dhi = run(
        c_row, obja_p, objp_p, probe_r, probe_i, h_r, h_i, meas_cc, mask_pad,
        *fwd_m, *inv_m,
    )
    return (da, dp_out, dpr, dpi, dhr, dhi,
            jnp.zeros_like(meas_cc), jnp.zeros_like(mask_pad))


multislice_loss_sums_fused.defvjp(_loss_fused_fwd, _loss_fused_bwd)


def fused_applicable_shapes(b, omode, nz, ny, nx, probe_b, pmode, h_b,
                            need_dh=False, loss=False) -> bool:
    """Shape-level applicability check (no arrays needed): the backend can
    run Mosaic kernels, shapes match the kernel's supported regime, and the
    working set fits VMEM (fwd AND bwd). On a registered kernel mesh
    (ops/mesh_env.py) the kernel runs per-shard under shard_map, so the VMEM
    check uses the shard-local batch.

    omode > 1 is served by the dispatcher (models/forward.py) as an XLA-level
    loop of per-object-mode kernel calls summed incoherently, so each call
    still sees omode == 1 and the VMEM working set is omode-independent."""
    shared = probe_b == 1
    h_shared = h_b == 1
    kw = dict(shared=shared, h_shared=h_shared, need_dh=need_dh, loss=loss)
    n_shards = kernel_mesh_size()
    if b % n_shards:
        return False
    b_local = b // n_shards
    return (
        (_INTERPRET or jax.default_backend() == "tpu")
        and omode <= 8
        and probe_b in (1, b)                 # shared OR per-position probes
        and h_b in (1, b)                     # shared OR per-position propagator
        and ny == nx
        and nx <= 256
        and _pick_blk(b_local, nz, nx, pmode, backward=False, **kw) is not None
        and _pick_blk(b_local, nz, nx, pmode, backward=True, **kw) is not None
    )


def fused_path_applicable(obja_patches, probes, H, need_dh=False) -> bool:
    """Array-level wrapper around fused_applicable_shapes."""
    b, omode, nz, ny, nx = obja_patches.shape
    return fused_applicable_shapes(
        b, omode, nz, ny, nx, probes.shape[0], probes.shape[1], H.shape[0],
        need_dh=need_dh,
    )
