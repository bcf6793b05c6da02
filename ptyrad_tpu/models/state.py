"""Model state: optimizable parameter pytree, constant buffers, static geometry.

This is the functional replacement for the reference's stateful
torch.nn.Module (src/ptyrad/models.py:30-145, PtychoAD). The six optimizable
tensors become a `PtychoParams` pytree fed through jax.value_and_grad; the
registered buffers become a `Buffers` pytree of constants; everything that
decides *code paths or shapes* lives in the hashable `Geometry` so it is
static under jit.

All complex quantities (probe, propagator) are Cplx (re, im) float32 pairs —
the TPU-native representation (see ops/cplx.py); the reference's
view_as_real workaround for NCCL (models.py:103) is subsumed by design.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptyrad_tpu.ops import cplx
from ptyrad_tpu.ops.cplx import Cplx
from ptyrad_tpu.physics.propagator import near_field_evolution, propagator_kgrid


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PtychoParams:
    """The optimizable parameter pytree.

    obja: (omode, Nz, Noy, Nox) float32 object amplitude
    objp: (omode, Nz, Noy, Nox) float32 object phase
    probe: (pmode, Ny, Nx) Cplx mixed-state probe
    probe_pos_shifts: (N, 2) float32 sub-pixel scan-position shifts [px]
    obj_tilts: (1 or N, 2) float32 crystal tilts [mrad], (tilt_y, tilt_x)
    slice_thickness: () float32 inter-slice distance [Ang]
    """

    obja: jax.Array
    objp: jax.Array
    probe: Cplx
    probe_pos_shifts: jax.Array
    obj_tilts: jax.Array
    slice_thickness: jax.Array

    @property
    def n_omode(self) -> int:
        return self.obja.shape[0]

    @property
    def n_slices(self) -> int:
        return self.obja.shape[1]

    @property
    def n_pmode(self) -> int:
        return self.probe.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Buffers:
    """Constant device arrays used by the forward pass (non-optimizable).

    Mirrors the registered buffers of reference models.py:107-116 plus the
    precomputed propagator grids of models.py:152-223.
    """

    H: Cplx                    # (Ny, Nx) Cplx base ASM propagator (corner-centered)
    measurements: jax.Array    # (N, Ky, Kx) diffraction data (f32, or
    #                            bf16/f16 storage via meas_dtype — upcast at
    #                            the per-batch gather)
    crop_pos: jax.Array        # (N, 2) int32 top-left patch corners
    omode_occu: jax.Array      # (omode,) float32, sums to 1
    Ky: jax.Array              # (Ny, Nx) float32 angular k-grid (corner layout)
    Kx: jax.Array              # (Ny, Nx) float32
    Kz: jax.Array              # (Ny, Nx) float32 sqrt(k^2 - Kx^2 - Ky^2)
    probe_int_sum: jax.Array   # () float32 initial total probe intensity
    meas_padded: Optional[jax.Array] = None  # (Kp, Kp) on-the-fly pad background


@dataclasses.dataclass(frozen=True)
class Geometry:
    """Static configuration: shapes, flags, and physical scalars.

    Hashable; a change here triggers (correctly) a re-jit. Scalars that never
    receive gradients (dx, dk, lambd) are kept here as plain floats so they
    constant-fold into the compiled program.
    """

    probe_shape: Tuple[int, int]
    obj_shape: Tuple[int, int, int, int]   # (omode, Nz, Noy, Nox)
    n_scans: int
    n_scan_slow: int
    n_scan_fast: int
    dx: float
    dk: float
    lambd: float
    scan_affine: Optional[Tuple[float, float, float, float]] = None
    # optimization-path flags (reference models.py:119-121, 320-360)
    shift_probes: bool = False
    tilt_obj: bool = False
    global_tilt: bool = True
    change_thickness: bool = False
    # forward-model options
    obj_preblur_std: Optional[float] = None
    detector_blur_std: Optional[float] = None
    # on-the-fly measurement transforms (reference models.py:384-416)
    meas_pad_idx: Optional[Tuple[int, int, int, int]] = None  # (h1, h2, w1, w2)
    meas_padded_shape: Optional[Tuple[int, int]] = None
    meas_scale_factors: Optional[Tuple[float, float]] = None
    eps: float = 1e-10
    fwd_remat: bool = False  # rematerialize the multislice loop to save HBM
    # End-to-end mixed-precision policy (reference autocast equivalent,
    # reconstruction.py:792-806): 'bfloat16' keeps the WAVEFIELD in bf16
    # between ops on the XLA path (params, gradients, accumulation, and the
    # loss stay f32; DFT matmuls accumulate f32 via preferred_element_type)
    # and switches the Pallas kernels' GEMM operands to bf16. Convergence-
    # gated in tests/test_forward.py::TestComputeDtypePolicy.
    compute_dtype: str = "float32"
    # Fused Pallas multislice kernel (ops/pallas_multislice.py): 2.4x the XLA
    # path on TPU at bit-equal loss. Default ON; forward() falls back to the
    # jnp path automatically off-TPU or when shapes leave the supported
    # regime (see pallas_multislice.fused_applicable_shapes — omode>1 runs a
    # per-mode kernel loop, shifted probes go through probe_kspace, and
    # per-position H uses h_b batching, so those all STAY on the kernel).
    fwd_fused: bool = True

    @property
    def n_slices(self) -> int:
        return self.obj_shape[1]

    @property
    def dp_shape(self) -> Tuple[int, int]:
        """Shape of the forward diffraction pattern after pad/resample."""
        shape = self.meas_padded_shape if self.meas_pad_idx is not None else self.probe_shape
        if self.meas_scale_factors is not None:
            import math

            sy, sx = self.meas_scale_factors
            # floor, matching torch F.interpolate(scale_factor=..) and the
            # initializer's meas_resample (round disagrees by one pixel for
            # fractional parts >= .5, desyncing dp and probe grids)
            shape = (int(math.floor(shape[0] * sy)), int(math.floor(shape[1] * sx)))
        return shape


@functools.partial(jax.jit, static_argnums=1)
def _convert_meas(x, dtype_name):
    """Device-side measurement dtype conversion — one cached program per
    target dtype per process. f16 saturates at its finite max instead of
    overflowing to inf (which would surface as a NaN loss with no pointer
    back to meas_dtype); bf16/f32 keep the full f32 exponent range."""
    dt = jnp.dtype(dtype_name)
    if dt == jnp.float16:
        x = jnp.minimum(x, jnp.float32(65504.0))
    return x.astype(dt)


def make_model(init_variables: dict, model_params: Optional[dict] = None):
    """Build (params, buffers, geometry) from an init_variables dict.

    `init_variables` carries the same keys the reference Initializer produces
    (obj, probe, probe_pos_shifts, obj_tilts, slice_thickness, H,
    measurements, crop_pos, omode_occu, dx, dk, lambd, N_scan_slow,
    N_scan_fast, ...); `model_params` carries update_params (per-tensor lr +
    start_iter), obj_preblur_std, detector_blur_std.
    """
    model_params = model_params or {}
    update = model_params.get("update_params", {})

    def lr_of(name):
        return float(update.get(name, {}).get("lr", 0.0))

    obj = np.asarray(init_variables["obj"])
    probe = np.asarray(init_variables["probe"], dtype=np.complex64)
    probe_c = cplx.from_numpy(probe)
    tilts = np.asarray(init_variables["obj_tilts"], dtype=np.float32).reshape(-1, 2)
    shifts = np.asarray(init_variables["probe_pos_shifts"], dtype=np.float32)
    dz = float(np.asarray(init_variables["slice_thickness"]))
    meas_in = init_variables["measurements"]
    # Storage dtype of the measurement store (schema meas_dtype): the
    # dataset dominates HBM at production scale; bf16/f16 storage halves it
    # (patterns upcast to f32 at the per-batch gather, forward.py)
    meas_dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
               "float16": jnp.float16}[model_params.get("meas_dtype", "float32")]
    if isinstance(meas_in, jax.Array) and meas_in.dtype == meas_dt:
        # already on device at the target dtype (e.g. simulated there): keep
        # it — np.asarray would round-trip the whole store through the host,
        # which on tunneled backends costs minutes per GB. Only shapes are
        # read below; jnp.asarray(meas) is then a no-op.
        meas = meas_in
    elif isinstance(meas_in, jax.Array):
        if meas_dt == jnp.float16:
            # the host path below measures max() and warns on overflow; a
            # device-side max would cost an eager remote compile (minutes on
            # tunneled backends), so warn statically about the same clamp
            import warnings

            warnings.warn(
                "meas_dtype='float16' on a device-resident store: values "
                "above 65504 are clamped without a range check (a device "
                "max() would cost a remote compile). Use 'bfloat16' (full "
                "f32 exponent range) or normalize if your data may exceed "
                "it.",
                stacklevel=2,
            )
        # on-device dtype conversion via a module-level cached jit (one
        # program per dtype per process — a fresh lambda here would defeat
        # jit's identity cache and re-pay the remote compile on every
        # make_model call, e.g. the Mosaic-VMEM fallback's second build)
        meas = _convert_meas(meas_in, jnp.dtype(meas_dt).name)
    else:
        meas_np = np.asarray(meas_in)
        if meas_dt == jnp.float16 and meas_np.size and float(meas_np.max()) > 65504.0:
            # f16 overflows to inf above 65504 (bf16 keeps f32's exponent
            # range) — inf poisons the loss as NaN with no pointer back to
            # meas_dtype, so clip and say so
            import warnings

            warnings.warn(
                "meas_dtype='float16': measurement max "
                f"{float(meas_np.max()):.3g} exceeds float16 range; clipping "
                "to 65504. Use 'bfloat16' (full f32 exponent range) or "
                "normalize the measurements.",
                stacklevel=2,
            )
            meas_np = np.minimum(meas_np, np.float32(65504.0))
        if meas_dt == jnp.bfloat16:
            import ml_dtypes  # ships with jax

            meas = meas_np.astype(ml_dtypes.bfloat16)
        else:
            meas = meas_np.astype(meas_dt)  # f32 / f16 are numpy dtypes
    crop_pos = np.asarray(init_variables["crop_pos"], dtype=np.int32)
    omode_occu = np.asarray(init_variables["omode_occu"], dtype=np.float32)
    dx = float(np.asarray(init_variables["dx"]))
    dk = float(np.asarray(init_variables.get("dk", 1.0 / (dx * probe.shape[-1]))))
    lambd = float(np.asarray(init_variables["lambd"]))

    params = PtychoParams(
        obja=jnp.asarray(np.abs(obj), dtype=jnp.float32),
        objp=jnp.asarray(np.angle(obj), dtype=jnp.float32),
        probe=probe_c,
        probe_pos_shifts=jnp.asarray(shifts),
        obj_tilts=jnp.asarray(tilts),
        slice_thickness=jnp.asarray(dz, dtype=jnp.float32),
    )

    probe_shape = probe.shape[-2:]
    # lazy fallback: dict.get would evaluate the full propagator grid even
    # when a checkpoint-supplied H is present
    H = init_variables.get("H")
    if H is None:
        H = near_field_evolution(probe_shape, dx, dz, lambd)
    H = np.asarray(H, dtype=np.complex64)
    Ky, Kx = propagator_kgrid(probe_shape, dx)
    k = 2.0 * np.pi / lambd
    Kz = np.sqrt(np.maximum(k**2 - Kx**2 - Ky**2, 0.0))

    meas_padded = init_variables.get("on_the_fly_meas_padded")
    meas_pad_idx = init_variables.get("on_the_fly_meas_padded_idx")
    meas_scale = init_variables.get("on_the_fly_meas_scale_factors")
    if (meas_padded is None) != (meas_pad_idx is None):
        # the pair travels together (Initializer writes both); half of it
        # would surface later as an opaque trace-time TypeError deep inside
        # get_measurements — name the problem at the API boundary instead
        raise ValueError(
            "init_variables must carry BOTH 'on_the_fly_meas_padded' and "
            "'on_the_fly_meas_padded_idx' (or neither); got "
            f"padded={'set' if meas_padded is not None else 'None'}, "
            f"idx={'set' if meas_pad_idx is not None else 'None'}"
        )

    buffers = Buffers(
        H=cplx.from_numpy(H),
        measurements=jnp.asarray(meas),
        crop_pos=jnp.asarray(crop_pos),
        omode_occu=jnp.asarray(omode_occu),
        Ky=jnp.asarray(Ky, dtype=jnp.float32),
        Kx=jnp.asarray(Kx, dtype=jnp.float32),
        Kz=jnp.asarray(Kz, dtype=jnp.float32),
        # host-side: an eager device op here costs a full remote compile on
        # tunneled TPU backends (observed: minutes for one scalar)
        probe_int_sum=jnp.asarray(np.sum(np.abs(probe) ** 2), dtype=jnp.float32),
        meas_padded=(jnp.asarray(meas_padded, dtype=jnp.float32) if meas_padded is not None else None),
    )

    tilt_obj = bool(lr_of("obj_tilts") != 0 or np.any(tilts))
    geom = Geometry(
        probe_shape=tuple(probe_shape),
        obj_shape=tuple(obj.shape),
        n_scans=int(meas.shape[0]),
        n_scan_slow=int(np.asarray(init_variables.get("N_scan_slow", meas.shape[0]))),
        n_scan_fast=int(np.asarray(init_variables.get("N_scan_fast", 1))),
        dx=dx,
        dk=dk,
        lambd=lambd,
        scan_affine=(tuple(init_variables["scan_affine"]) if init_variables.get("scan_affine") is not None else None),
        shift_probes=bool(lr_of("probe_pos_shifts") != 0),
        tilt_obj=tilt_obj,
        global_tilt=bool(tilts.shape[0] == 1),
        change_thickness=bool(lr_of("slice_thickness") != 0),
        obj_preblur_std=model_params.get("obj_preblur_std"),
        detector_blur_std=model_params.get("detector_blur_std"),
        meas_pad_idx=(tuple(int(i) for i in meas_pad_idx) if meas_pad_idx is not None else None),
        meas_padded_shape=(tuple(np.asarray(meas_padded).shape[-2:]) if meas_padded is not None else None),
        meas_scale_factors=(tuple(float(s) for s in meas_scale) if meas_scale is not None else None),
        fwd_remat=bool(model_params.get("fwd_remat", False)),
        compute_dtype=str(model_params.get("compute_dtype", "float32")),
        # None = auto (on; off-regime shapes fall back inside forward())
        fwd_fused=(True if model_params.get("fwd_fused") is None
                   else bool(model_params["fwd_fused"])),
    )
    return params, buffers, geom
