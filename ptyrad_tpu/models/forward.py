"""Differentiable mixed-state multislice forward model (pure functions).

Physics (parity with reference src/ptyrad/forward.py:20-80 and
src/ptyrad/models.py:251-435): a batch of probe waves interacts with cropped
object patches slice by slice; between slices the wave propagates by the
angular-spectrum propagator H; the exit wave transforms to the detector plane
with an orthonormal 2D FFT; incoherent probe/object modes sum in intensity.

TPU shape discipline: the wavefield psi is a Cplx (re, im) float32 pair kept
at (B, pmode, omode, Ny, Nx) throughout, so every DFT (real-arithmetic MXU
matmuls, see ops/fourier.py) batches over (B, pmode, omode) as one large
GEMM; the z-loop is a static Python loop (Nz is small), optionally
rematerialized via jax.checkpoint to trade FLOPs for HBM in the backward
pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ptyrad_tpu.models.state import Buffers, Geometry, PtychoParams
from ptyrad_tpu.ops.blur import gaussian_blur_2d
from ptyrad_tpu.ops.cplx import Cplx, expi, polar, stack
from ptyrad_tpu.ops.fourier import fft2, fftshift2, ifft2
from ptyrad_tpu.ops.patches import extract_patches
from ptyrad_tpu.ops.resize import bilinear_resize_conserve
from ptyrad_tpu.ops.shift import fourier_shift


def get_obj_patches(params: PtychoParams, buffers: Buffers, geom: Geometry, indices: jnp.ndarray):
    """Gather per-position object patches (amplitude, phase).

    Returns (obja_patches, objp_patches), each (B, omode, Nz, Ny, Nx) float32.
    Applies the optional lateral pre-blur (reference models.py:267-284).
    """
    pos = buffers.crop_pos[indices]
    obja = extract_patches(params.obja, pos, geom.probe_shape)
    objp = extract_patches(params.objp, pos, geom.probe_shape)
    std = geom.obj_preblur_std
    if std is not None and std != 0:
        obja = gaussian_blur_2d(obja, kernel_size=5, sigma=std)
        objp = gaussian_blur_2d(objp, kernel_size=5, sigma=std)
    return obja, objp


def get_probes(params: PtychoParams, geom: Geometry, indices: jnp.ndarray) -> Cplx:
    """Per-position probes: sub-pixel shifted when optimizing positions.

    Returns Cplx (B, pmode, Ny, Nx) — or (1, pmode, Ny, Nx) when a single
    shared probe suffices (reference models.py:286-298).
    """
    if geom.shift_probes:
        shifts = params.probe_pos_shifts[indices]
        return fourier_shift(params.probe, shifts)
    return params.probe[None]


def compute_propagators(params: PtychoParams, buffers: Buffers, geom: Geometry, indices: jnp.ndarray) -> Cplx:
    """Inter-slice propagators, Cplx of shape (1 or B, Ny, Nx).

    Collapses the 4-case table of reference models.py:300-360 into its two
    orthogonal degrees of freedom (the reference's case 2B is a host-side
    caching optimization with identical semantics):
      base  = exp(i*dz*Kz)  if dz is optimizable else the precomputed H
      tilt  = exp(i*dz*(Ky*tan(ty) + Kx*tan(tx)))  when tilts active
    """
    dz = params.slice_thickness
    if geom.change_thickness:
        base = expi(dz * buffers.Kz)
    else:
        base = buffers.H
    if not geom.tilt_obj:
        return base[None]
    tilts = params.obj_tilts if geom.global_tilt else params.obj_tilts[indices]
    ty = jnp.tan(tilts[:, 0, None, None] / 1e3)
    tx = jnp.tan(tilts[:, 1, None, None] / 1e3)
    tilt_factor = expi(dz * (buffers.Ky[None] * ty + buffers.Kx[None] * tx))
    return base[None] * tilt_factor


def multislice_dp(
    obja_patches: jnp.ndarray,
    objp_patches: jnp.ndarray,
    probes: Cplx,
    H: Cplx,
    omode_occu: jnp.ndarray,
    eps: float = 1e-10,
    remat: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Multislice propagation to far-field intensity.

    Args:
      obja_patches, objp_patches: (B, omode, Nz, Ny, Nx) float32
      probes: Cplx (B or 1, pmode, Ny, Nx)
      H: Cplx (B or 1, Ny, Nx) corner-centered propagator
      omode_occu: (omode,) float32 incoherent object-mode weights
      remat: checkpoint each slice step (backward recomputes instead of
        storing every intermediate wavefield).
      compute_dtype: jnp.bfloat16 keeps the wavefield (and the slice/
        propagator factors) half-width between ops — the mixed-precision
        policy (reference autocast, reconstruction.py:792-806). Intensity
        accumulation and the returned dp are always f32.

    Returns (B, Ny, Nx) float32: incoherent sum over (pmode, omode) of
    |fftshift(fft2(psi, ortho))|^2, weighted by omode_occu, plus eps.
    """
    n_slices = obja_patches.shape[2]
    if compute_dtype != jnp.float32:
        obja_patches = obja_patches.astype(compute_dtype)
        objp_patches = objp_patches.astype(compute_dtype)
        probes = probes.astype(compute_dtype)
        H = H.astype(compute_dtype)
    psi = probes[:, :, None, :, :]  # (B|1, pmode, 1, Ny, Nx) -> broadcasts over omode
    Hb = H[:, None, None, :, :]     # (B|1, 1, 1, Ny, Nx)

    def slice_step(psi, a_slice, p_slice):
        obj_slice = polar(a_slice, p_slice)[:, None]  # (B, 1, omode, Ny, Nx)
        psi = psi * obj_slice
        return ifft2(Hb * fft2(psi))

    step = jax.checkpoint(slice_step) if remat else slice_step
    for n in range(n_slices - 1):
        psi = step(psi, obja_patches[:, :, n], objp_patches[:, :, n])

    obj_last = polar(obja_patches[:, :, n_slices - 1], objp_patches[:, :, n_slices - 1])
    psi = psi * obj_last[:, None]

    # the DETECTOR-plane transform feeds the data loss directly, so under
    # the bf16 policy it runs truly f32 — operands pinned via exact=True,
    # since the policy also flips the global matmul dtype to bf16 (same
    # reasoning as torch.autocast's fft promote-to-f32 list); the Nz-1
    # inter-slice transforms — the bulk of the FLOPs/bandwidth — stay bf16
    psi_k = fftshift2(fft2(psi.astype(jnp.float32), norm="ortho",
                           exact=compute_dtype != jnp.float32))
    intensity = psi_k.abs2()  # (B, pmode, omode, Ny, Nx)
    dp = jnp.sum(intensity * omode_occu[:, None, None], axis=(1, 2)) + eps
    return dp


def forward(params: PtychoParams, buffers: Buffers, geom: Geometry, indices: jnp.ndarray):
    """Full forward pass for a batch of scan indices.

    Returns (dp_fwd, (obja_patches, objp_patches)); patches are reused by the
    object-dependent loss terms (reference models.py:422-435).
    """
    obja_p, objp_p = get_obj_patches(params, buffers, geom, indices)
    H = compute_propagators(params, buffers, geom, indices)
    # when slice thickness or tilts are optimizable, compute_propagators
    # builds H from params, so the kernel must also produce H cotangents
    # (need_dh); with a fixed H that extra per-slice DFT is skipped
    h_differentiable = geom.change_thickness or geom.tilt_obj

    use_fused = use_chain = False
    b, omode = obja_p.shape[0], obja_p.shape[1]
    if geom.fwd_fused:
        try:
            from ptyrad_tpu.ops.pallas_chain import chain_applicable_shapes
            from ptyrad_tpu.ops.pallas_multislice import fused_applicable_shapes
        except ImportError:
            # pallas/Mosaic unavailable on this backend (same graceful
            # fallback ops/patches.py applies): keep the XLA path
            pass
        else:
            probe_b = b if geom.shift_probes else 1
            use_fused = fused_applicable_shapes(
                b, omode, obja_p.shape[2], obja_p.shape[3], obja_p.shape[4],
                probe_b, params.probe.shape[0], H.shape[0], need_dh=h_differentiable,
            )
            # too big for the VMEM-resident chain (large Nz*pmode*N^2, e.g.
            # the PSO regime): segmented chain with HBM psi boundaries instead
            use_chain = not use_fused and chain_applicable_shapes(
                b, omode, obja_p.shape[2], obja_p.shape[3], obja_p.shape[4],
                params.probe.shape[0], H.shape[0], need_dh=h_differentiable,
            )

    if use_fused:
        from ptyrad_tpu.ops.pallas_multislice import multislice_dp_fused

        if geom.shift_probes:
            # hand the kernel the shifted SPECTRUM: the batch-wide inverse
            # transform (and its adjoint) run in VMEM instead of on the XLA
            # path; only the tiny shared-probe fft2 + phase ramp (and their
            # autodiff, which carries the position-shift gradients) stay out
            from ptyrad_tpu.ops.shift import fourier_shift_kspace

            probes_k = fourier_shift_kspace(
                params.probe, params.probe_pos_shifts[indices]
            )
            pr, pi, kspace = probes_k.re, probes_k.im, True
        else:
            pr, pi, kspace = params.probe[None].re, params.probe[None].im, False
        # object modes: independent chains summed incoherently at the XLA
        # level (reference forward.py:20-80); each call reuses the same
        # compiled kernel on an omode slice
        raw = None
        for om in range(omode):
            dp_om = multislice_dp_fused(
                obja_p[:, om:om + 1], objp_p[:, om:om + 1], pr, pi,
                H.re, H.im, h_differentiable, kspace,
            )
            contrib = buffers.omode_occu[om] * dp_om
            raw = contrib if raw is None else raw + contrib
        dp = fftshift2(raw) + geom.eps
    elif use_chain:
        from ptyrad_tpu.ops.pallas_chain import multislice_dp_chain

        probes = get_probes(params, geom, indices)
        dp = multislice_dp_chain(
            obja_p, objp_p, probes, H, buffers.omode_occu, geom.eps,
            need_dh=h_differentiable,
        )
    else:
        probes = get_probes(params, geom, indices)
        dp = multislice_dp(
            obja_p, objp_p, probes, H, buffers.omode_occu, eps=geom.eps,
            remat=geom.fwd_remat,
            compute_dtype=(jnp.bfloat16 if geom.compute_dtype == "bfloat16"
                           else jnp.float32),
        )
    std = geom.detector_blur_std
    if std is not None and std != 0:
        dp = gaussian_blur_2d(dp, kernel_size=5, sigma=std)
    return dp, (obja_p, objp_p)


def fused_loss_terms(params: PtychoParams, buffers: Buffers, geom: Geometry,
                     indices: jnp.ndarray, mask, loss_params):
    """(total, terms) with the loss_single data term folded INTO the fused
    multislice kernel, or None when the configuration is out of regime (the
    caller then uses forward() + combined_loss — identical numerics).

    In regime when: the fused kernel serves the forward (geom.fwd_fused,
    shapes fit), omode == 1, no detector blur, and loss_single is the only
    dp-dependent loss term (sparse/simlar act on patches and stay outside).
    The kernel computes the corner-centered dp AND the data-term partial
    sums in VMEM, so the per-step XLA loss glue (fftshift, sqrt/mse passes,
    dp/g_dp HBM round-trips) vanishes; measurements are ifftshift2-ed to
    match the corner-centered order (pixel-sum losses are permutation-
    invariant). See ops/pallas_multislice.multislice_loss_sums_fused.
    """
    from ptyrad_tpu.losses import loss_simlar, loss_sparse, merge_loss_params
    from ptyrad_tpu.ops.fourier import ifftshift2

    try:
        from ptyrad_tpu.ops.pallas_multislice import (
            fused_applicable_shapes,
            multislice_loss_sums_fused,
        )
    except ImportError:
        return None  # pallas unavailable: caller keeps the XLA loss path

    cfg = merge_loss_params(loss_params)
    if (not cfg["loss_single"]["state"] or cfg["loss_poissn"]["state"]
            or cfg["loss_pacbed"]["state"]):
        return None
    if not geom.fwd_fused:
        return None
    std = geom.detector_blur_std
    if std is not None and std != 0:
        return None

    obja_p, objp_p = get_obj_patches(params, buffers, geom, indices)
    b, omode = obja_p.shape[0], obja_p.shape[1]
    if omode != 1:
        return None
    H = compute_propagators(params, buffers, geom, indices)
    h_differentiable = geom.change_thickness or geom.tilt_obj
    probe_b = b if geom.shift_probes else 1
    if not fused_applicable_shapes(
        b, omode, obja_p.shape[2], obja_p.shape[3], obja_p.shape[4],
        probe_b, params.probe.shape[0], H.shape[0], need_dh=h_differentiable,
        loss=True,
    ):
        return None

    # the kernel computes raw |Y|^2; forward() weights the single object
    # mode by omode_occu[0] (not necessarily 1.0 for custom init_occu).
    # dp is quadratic in psi, so scaling the probe by sqrt(occu) reproduces
    # occu * |Y|^2 exactly — gradients flow through the scaling
    occu_root = jnp.sqrt(buffers.omode_occu[0])
    if geom.shift_probes:
        from ptyrad_tpu.ops.shift import fourier_shift_kspace

        # occu root folded into the shift ramp: fuses into the existing
        # elementwise product instead of a separate (B, pmode, N, N) pass
        probes_k = fourier_shift_kspace(
            params.probe, params.probe_pos_shifts[indices], scale=occu_root
        )
        pr, pi, kspace = probes_k.re, probes_k.im, True
    else:
        pr = params.probe[None].re * occu_root  # (1, pmode, N, N): tiny
        pi = params.probe[None].im * occu_root
        kspace = False

    meas = get_measurements(buffers, geom, indices)
    meas_cc = ifftshift2(meas)
    mask_b = mask if mask is not None else jnp.ones((b,), jnp.float32)
    mask_pad = jnp.zeros((b, 8, 128), jnp.float32).at[:, 0, 0].set(mask_b)

    sp = cfg["loss_single"]
    p = float(sp.get("dp_pow", 0.5))
    s1, s2 = multislice_loss_sums_fused(
        obja_p, objp_p, pr, pi, H.re, H.im, meas_cc, mask_pad,
        p, float(geom.eps), h_differentiable, kspace,
    )
    npix = obja_p.shape[3] * obja_p.shape[4]
    denom = npix * jnp.sum(mask_b)
    # identical to losses.loss_single's _bmean algebra: mse = s1/denom,
    # data_mean = s2/denom
    single = sp["weight"] * jnp.sqrt(s1 / denom) / (s2 / denom)

    zero = jnp.float32(0.0)
    terms = {
        "loss_single": single,
        "loss_poissn": zero,
        "loss_pacbed": zero,
        "loss_sparse": (
            loss_sparse(objp_p, buffers.omode_occu, cfg["loss_sparse"], mask)
            if cfg["loss_sparse"]["state"] else zero
        ),
        "loss_simlar": (
            loss_simlar(obja_p, objp_p, buffers.omode_occu, cfg["loss_simlar"], mask)
            if cfg["loss_simlar"]["state"] else zero
        ),
    }
    return sum(terms.values()), terms


def get_measurements(buffers: Buffers, geom: Geometry, indices: jnp.ndarray) -> jnp.ndarray:
    """Measured patterns for a batch, with on-the-fly pad/resample.

    Parity with reference models.py:384-416: the batch is embedded into a
    fitted-background canvas (pad) and/or bilinearly resampled with intensity
    conservation — done per batch on device so the full padded dataset never
    materializes in HBM.
    """
    meas = buffers.measurements[indices]
    if meas.dtype != jnp.float32:
        # reduced-precision storage (meas_dtype): upcast the BATCH only —
        # XLA fuses the convert into the gather's consumers
        meas = meas.astype(jnp.float32)
    if geom.meas_pad_idx is not None:
        h1, h2, w1, w2 = geom.meas_pad_idx
        canvas = jnp.broadcast_to(
            buffers.meas_padded, (meas.shape[0], *geom.meas_padded_shape)
        )
        meas = canvas.at[..., h1:h2, w1:w2].set(meas)
    if geom.meas_scale_factors is not None and any(s != 1 for s in geom.meas_scale_factors):
        meas = bilinear_resize_conserve(meas, geom.meas_scale_factors)
    return meas


def propagated_probe(params: PtychoParams, buffers: Buffers, geom: Geometry, index: jnp.ndarray) -> Cplx:
    """Probe at each slice depth, for visualization/saving.

    Returns Cplx (Nz, pmode, Ny, Nx) (reference models.py:362-373).
    """
    probe = get_probes(params, geom, index)[0]
    H = compute_propagators(params, buffers, geom, index)[0]
    slices = []
    psi = probe
    for _ in range(geom.n_slices):
        slices.append(psi)
        psi = ifft2(H[None] * fft2(psi))
    return stack(slices, axis=0)
