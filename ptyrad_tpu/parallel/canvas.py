"""Object-canvas spatial sharding over the device mesh.

The one parallel axis genuinely beyond the reference (SURVEY.md §5
"long-context" row; reference replicates the whole object on every GPU —
models.py:109 — and psums its full gradient every step, which is the
multi-chip memory/bandwidth ceiling at large canvases): split the canvas's
slow (row) axis into per-device slabs, halo-exchange a probe-height boundary
strip over ICI (`jax.lax.ppermute`), and keep the patch gather — and, through
AD transposition, its scatter-add adjoint — entirely shard-local. Only the
scalar loss reduces globally; the canvas gradient never materializes on any
single device.

How it maps to hardware: scan positions are grouped by the slab containing
their patch's top row, so every gather reads its own slab plus at most `halo`
rows of the next one — one nearest-neighbor ppermute per step (plus its
transpose in the backward pass), both riding ICI. Compare the replicated
design: a full-canvas psum (omode*Nz*Noy*Nox floats) every step.

Supported: arbitrary (unbalanced) position-to-slab distributions via
mask-padded per-slab batches; per-position sub-pixel probe shifts and
crystal tilts (their gathers ride the slab permutation; the transposes
scatter gradients back to the replicated layout); optimizable slice
thickness (per-position propagators built inside the shard, dz/tilt
gradients psum through shard_map's replicated-input transpose); object
pre-blur and detector blur; on-the-fly measurement pad/resample (applied
to the slab-local batch exactly as forward.get_measurements does); and
ALL FIVE loss terms — every term reduces to masked partial sums over the
local batch (pacbed's global batch-averaged patterns included), combined
in one fused psum and recomposed to combined_loss's exact masked algebra;
and the SAME Pallas kernel dispatch as forward() (fused multislice /
segmented chain, running per-shard inside the shard_map — see
_dispatch_dp), so canvas sharding keeps the kernel speedup on the dominant
forward/backward cost. The one structural restriction left: a patch may
span at most two slabs (devices <= Noy / probe_ny). The memory model is
documented in docs/performance.md.

Gradient correctness is asserted against the replicated path in
tests/test_engine.py::TestCanvasSharding and __graft_entry__.dryrun_multichip
(leg 'canvas-sharded').
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ptyrad_tpu.models.forward import multislice_dp
from ptyrad_tpu.models.state import Buffers, Geometry, PtychoParams
from ptyrad_tpu.ops.cplx import Cplx
from ptyrad_tpu.ops.patches import extract_patches_local
from ptyrad_tpu.parallel.mesh import DATA_AXIS, put_global

try:  # moved to jax.shard_map in newer releases
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:
    from jax.experimental.shard_map import shard_map as _exp_shard_map

    def shard_map(*args, check_vma=None, **kwargs):
        # the experimental signature calls the same knob check_rep — without
        # this translation every call below would TypeError on old jax
        if check_vma is not None:
            kwargs["check_rep"] = check_vma
        return _exp_shard_map(*args, **kwargs)

CANVAS_SPEC = P(None, None, DATA_AXIS, None)  # (omode, Nz, rows, cols)


@dataclasses.dataclass(frozen=True)
class CanvasPlan:
    """Host-side sharding plan for one (scan, canvas, mesh) combination."""

    n_dev: int
    rows_local: int       # canvas rows per device (after padding)
    noy_pad: int          # rows_local * n_dev >= Noy
    halo: int             # rows borrowed from the next slab (= probe Ny)
    b_local: int          # scan positions per device (max over slabs)
    pos_index: np.ndarray  # (n_dev*b_local,) global position index per slot
    mask: np.ndarray       # (n_dev*b_local,) f32: 1 real slot, 0 padding


def _dispatch_dp(geom: Geometry, pa, pp, probe: Cplx, shifts_l, H: Cplx, occu):
    """dp from slab-local patches with the SAME Pallas kernel dispatch
    forward() applies (fused first, segmented chain for big Nz, XLA
    fallback) — the kernels run per-shard inside this shard_map (the solver
    clears the kernel mesh in canvas mode, so they take their single-device
    path); out-of-regime shapes and non-TPU backends keep the XLA
    multislice_dp exactly as before. Equality with the replicated forward is
    pytest-gated in interpret mode (TestCanvasSharding)."""
    from ptyrad_tpu.ops.mesh_env import get_kernel_mesh
    from ptyrad_tpu.ops.shift import fourier_shift

    b, omode = pa.shape[0], pa.shape[1]
    need_dh = geom.change_thickness or geom.tilt_obj
    # a registered kernel mesh means the multislice kernels would wrap
    # themselves in a data-parallel shard_map — nested inside THIS shard_map
    # that is an error; the solver clears it in canvas mode, direct callers
    # with one registered get the XLA path (same guard class as
    # extract_patches_local for the patch kernels)
    if geom.fwd_fused and get_kernel_mesh() is None:
        try:
            from ptyrad_tpu.ops.pallas_chain import (
                chain_applicable_shapes,
                multislice_dp_chain,
            )
            from ptyrad_tpu.ops.pallas_multislice import (
                fused_applicable_shapes,
                multislice_dp_fused,
            )
        except ImportError:
            pass  # pallas unavailable: XLA path below
        else:
            probe_b = b if geom.shift_probes else 1
            if fused_applicable_shapes(
                    b, omode, pa.shape[2], pa.shape[3], pa.shape[4],
                    probe_b, probe.re.shape[0], H.re.shape[0],
                    need_dh=need_dh):
                from ptyrad_tpu.ops.fourier import fftshift2

                if geom.shift_probes:
                    # shifted SPECTRUM into the kernel, like forward(): the
                    # batch-wide inverse transform runs in VMEM
                    from ptyrad_tpu.ops.shift import fourier_shift_kspace

                    pk = fourier_shift_kspace(probe, shifts_l)
                    pr, pi, kspace = pk.re, pk.im, True
                else:
                    pr, pi, kspace = probe[None].re, probe[None].im, False
                raw = None
                for om in range(omode):
                    dp_om = multislice_dp_fused(
                        pa[:, om:om + 1], pp[:, om:om + 1], pr, pi,
                        H.re, H.im, need_dh, kspace,
                    )
                    contrib = occu[om] * dp_om
                    raw = contrib if raw is None else raw + contrib
                return fftshift2(raw) + geom.eps
            if chain_applicable_shapes(
                    b, omode, pa.shape[2], pa.shape[3], pa.shape[4],
                    probe.re.shape[0], H.re.shape[0], need_dh=need_dh):
                probes = (fourier_shift(probe, shifts_l)
                          if geom.shift_probes else probe[None])
                return multislice_dp_chain(
                    pa, pp, probes, H, occu, geom.eps, need_dh=need_dh)
    probes = (fourier_shift(probe, shifts_l)
              if geom.shift_probes else probe[None])
    return multislice_dp(
        pa, pp, probes, H, occu, eps=geom.eps, remat=geom.fwd_remat,
        compute_dtype=(jnp.bfloat16 if geom.compute_dtype == "bfloat16"
                       else jnp.float32),
    )


def _slab_of(crop_pos: np.ndarray, rows_local: int, n_dev: int) -> np.ndarray:
    """Slab owning each scan position: the slab containing the patch's top
    row (last slab clamps the ragged tail). plan_canvas_sharding rebases pos
    rows against THIS assignment — every consumer must use the same rule."""
    return np.minimum(crop_pos[:, 0] // rows_local, n_dev - 1)


def plan_canvas_sharding(crop_pos: np.ndarray, noy: int, probe_ny: int, n_dev: int) -> CanvasPlan:
    """Assign each scan position to the slab containing its patch's top row.

    Slabs with fewer positions than the busiest one are mask-padded to a
    common per-device batch shape (SPMD needs one static shape; padding
    slots gather position 0 and contribute zero through the mask — the same
    mechanism engine/batching.pad_batches uses for ragged batches). Raises
    when a patch would span more than two slabs (halo > slab height).
    """
    crop_pos = np.asarray(crop_pos)
    rows_local = -(-int(noy) // n_dev)
    halo = int(probe_ny)
    if halo > rows_local:
        raise ValueError(
            f"canvas sharding: probe height {halo} exceeds the {rows_local}-row "
            f"slab — patches would span >2 slabs; use fewer devices (<= {noy // probe_ny})"
        )
    slab = _slab_of(crop_pos, rows_local, n_dev)
    counts = np.bincount(slab, minlength=n_dev)
    b_local = int(counts.max())
    if b_local == 0:
        raise ValueError("canvas sharding: no scan positions")
    pos_index = np.zeros((n_dev, b_local), np.int64)
    mask = np.zeros((n_dev, b_local), np.float32)
    for d in range(n_dev):
        mine = np.nonzero(slab == d)[0]
        pos_index[d, : len(mine)] = mine
        mask[d, : len(mine)] = 1.0
        # padding slots keep index 0: a valid gather target whose patch may
        # live on another slab — its LOCAL row is clamped into range by
        # dynamic_slice semantics and its contribution is masked to zero
    return CanvasPlan(
        n_dev=n_dev,
        rows_local=rows_local,
        noy_pad=rows_local * n_dev,
        halo=halo,
        b_local=b_local,
        pos_index=pos_index.ravel(),
        mask=mask.ravel(),
    )


def shard_canvas_params(params: PtychoParams, plan: CanvasPlan, mesh: Mesh) -> PtychoParams:
    """Lay the obja/objp canvases out row-sharded on the mesh (padded rows are
    never read by any patch and receive zero gradient); everything else
    replicates. put_global, so process-spanning meshes work (every rank holds
    the same host value, like every DDP rank of the reference)."""
    pad = plan.noy_pad - params.obja.shape[2]
    obja = np.pad(np.asarray(params.obja), ((0, 0), (0, 0), (0, pad), (0, 0)),
                  constant_values=1.0)
    objp = np.pad(np.asarray(params.objp), ((0, 0), (0, 0), (0, pad), (0, 0)))
    canvas_sh = NamedSharding(mesh, CANVAS_SPEC)
    rep = NamedSharding(mesh, P())
    return PtychoParams(
        obja=put_global(obja, canvas_sh),
        objp=put_global(objp, canvas_sh),
        probe=Cplx(put_global(np.asarray(params.probe.re), rep),
                   put_global(np.asarray(params.probe.im), rep)),
        probe_pos_shifts=put_global(np.asarray(params.probe_pos_shifts), rep),
        obj_tilts=put_global(np.asarray(params.obj_tilts), rep),
        slice_thickness=put_global(np.asarray(params.slice_thickness), rep),
    )


def unshard_canvas(arr, noy: int) -> np.ndarray:
    """Reassemble a row-sharded canvas (gradient or parameter) to host layout,
    dropping the padding rows."""
    return np.asarray(arr)[:, :, :noy, :]


def slab_local_positions(crop_pos, pos_index, rows_local: int, n_dev: int,
                         b_local: int) -> np.ndarray:
    """crop_pos gathered into slab order with row coordinates rebased to each
    slab's first row — the slab-local frame every sharded gather reads. The
    last axis of pos_index holds the n_dev*b_local slot-ordered position ids;
    leading axes (e.g. a minibatch axis) broadcast. One definition shared by
    the full-batch, scanned-epoch, and resident-store builders (they must
    agree on this rebasing or gathers read the wrong rows)."""
    pos = np.asarray(crop_pos)[np.asarray(pos_index)].astype(np.int32)
    first = (np.arange(n_dev, dtype=np.int32) * rows_local).repeat(b_local)
    pos[..., 0] -= first
    return pos


def build_canvas_sharded_loss(
    buffers: Buffers,
    geom: Geometry,
    mesh: Mesh,
    plan: CanvasPlan,
    loss_params: Optional[dict] = None,
):
    """Build the canvas-sharded loss: returns (loss_fn, (pos_local, meas)).

    `loss_fn(params, pos_local, meas) -> scalar`; the returned pos_local /
    meas are the slab-grouped, mesh-sharded device arrays to pass in. They
    are jit ARGUMENTS, never closed over — a closed-over measurement store
    would serialize into the remotely-compiled program (CLAUDE.md
    architecture invariant); only the small constants (H, omode_occu) close
    over. `jax.value_and_grad(loss_fn)` yields canvas gradients in the SAME
    row-sharded layout (the gather's AD transpose scatter-adds into the
    local slab; the halo strip's gradient rides the ppermute transpose back
    to its owner) — the replicated-canvas allreduce disappears.
    """
    from ptyrad_tpu.losses import merge_loss_params

    cfg = merge_loss_params(loss_params)
    active = set(k for k, v in cfg.items() if v["state"])

    n_dev, halo = plan.n_dev, plan.halo
    # host-side grouping: positions/measurements gathered into slab order
    # (mask-padded slots re-gather position 0 and contribute zero)
    pos_local = slab_local_positions(
        buffers.crop_pos, plan.pos_index, plan.rows_local, n_dev, plan.b_local)
    meas = np.asarray(buffers.measurements)[plan.pos_index]

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    # put_global, not device_put: these builders are documented to work on
    # process-spanning meshes, where device_put cannot address remote devices
    pos_local = put_global(pos_local, batch_sh)
    meas = put_global(meas, batch_sh)
    mask = put_global(plan.mask, batch_sh)
    pos_index = jnp.asarray(plan.pos_index)  # tiny constant: gathers shifts
    n_valid = jnp.float32(plan.mask.sum())

    sharded = _make_sharded_loss(buffers, geom, mesh, n_dev, halo, cfg, active)

    n_slots = int(plan.pos_index.shape[0])

    def loss_fn(params: PtychoParams, pos_l, meas_l):
        # per-slot sub-pixel shifts / tilts: gathered from the (N, 2) params
        # in slab order; the gather's transpose scatter-adds slot gradients
        # back to the replicated layout (padding slots carry zero via the
        # mask). A global tilt broadcasts — its gradient sums over slots.
        shifts = params.probe_pos_shifts[pos_index]
        if geom.global_tilt:
            tilts = jnp.broadcast_to(params.obj_tilts, (n_slots, 2))
        else:
            tilts = params.obj_tilts[pos_index]
        return sharded(
            params.obja, params.objp, params.probe.re, params.probe.im,
            buffers.H.re, buffers.H.im, buffers.omode_occu,
            pos_l, meas_l, shifts, tilts, params.slice_thickness, mask,
            n_valid,
        )[0]

    return loss_fn, (pos_local, meas)


def _make_sharded_loss(buffers, geom, mesh, n_dev, halo, cfg, active,
                       store_cap: Optional[int] = None):
    """shard_map'd local loss shared by the full-batch and scanned-epoch
    builders — mask and n_valid are traced ARGUMENTS so one compiled program
    serves every (mask-padded) minibatch of the same static shape:

      sharded(obja, objp, probe_re, probe_im, h_re, h_im, occu,
              pos_l, meas_l, shifts_l, tilts_l, dz, mask_l, n_valid)
        -> (total, per-term dict)

    With `store_cap` set, `meas_l` is replaced by (meas_store, slots):
    the sharded slab-major resident store plus per-batch GLOBAL slot ids;
    each device gathers its local rows as meas_store[slots - axis_index*cap]
    — the measurements never re-cross the host/device boundary after the
    one store transfer (see build_canvas_store)."""
    from ptyrad_tpu.ops.blur import gaussian_blur_2d
    from ptyrad_tpu.ops.resize import area_downsample, bilinear_resize_conserve
    from ptyrad_tpu.ops.shift import fourier_shift

    # pad background: one (H, W) constant, small enough to close over (the
    # same budget class as the Kz/Ky/Kx grids below)
    meas_bg = (jnp.asarray(buffers.meas_padded)
               if geom.meas_pad_idx is not None else None)
    # send each slab's TOP `halo` rows to the PREVIOUS device, whose patches
    # may extend past its slab's last row. The wrap pair (0 -> n-1) carries
    # rows the last device never reads (patches cannot cross the canvas
    # bottom), so its cotangent is zero and the exchange stays correct.
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def local_loss(obja_sh, objp_sh, probe_re, probe_im, h_re, h_im, occu,
                   pos_l, meas_l, shifts_l, tilts_l, dz, mask_l, n_valid):
        top_a = jax.lax.ppermute(obja_sh[:, :, :halo], DATA_AXIS, perm)
        top_p = jax.lax.ppermute(objp_sh[:, :, :halo], DATA_AXIS, perm)
        ext_a = jnp.concatenate([obja_sh, top_a], axis=2)
        ext_p = jnp.concatenate([objp_sh, top_p], axis=2)
        # the _local variant: we are already inside THIS shard_map, so the
        # gather must dispatch straight to the single-device kernels (the
        # mesh-aware extract_patches would nest a shard_map or fall back to
        # the serial XLA scatter adjoint on multi-device TPU)
        pa = extract_patches_local(ext_a, pos_l, geom.probe_shape)
        pp = extract_patches_local(ext_p, pos_l, geom.probe_shape)
        pre_std = geom.obj_preblur_std
        if pre_std is not None and pre_std != 0:
            pa = gaussian_blur_2d(pa, kernel_size=5, sigma=pre_std)
            pp = gaussian_blur_2d(pp, kernel_size=5, sigma=pre_std)
        probe = Cplx(probe_re, probe_im)
        # per-position propagators, mirroring models.forward.
        # compute_propagators: base from optimizable dz (or the fixed H),
        # times per-position tilt ramps gathered in slab order. Gradients of
        # the replicated dz/tilt inputs psum back through shard_map's
        # transpose of the replicated-in spec.
        from ptyrad_tpu.ops.cplx import expi

        if geom.change_thickness:
            base = expi(dz * jnp.asarray(buffers.Kz))
        else:
            base = Cplx(h_re, h_im)
        if geom.tilt_obj:
            # a global tilt arrives as b_local identical rows (the callers
            # broadcast it into slot order); build ONE (1, Ny, Nx) ramp and
            # let H broadcast over the batch, exactly like forward.py's
            # global-tilt case — the per-row expi would be b_local-fold
            # redundant transcendental work. Gradients are unchanged: all
            # local positions' contributions accumulate on the single ramp
            # and the callers' broadcast_to transpose sums over slots.
            t_src = tilts_l[:1] if geom.global_tilt else tilts_l
            ty = jnp.tan(t_src[:, 0, None, None] / 1e3)
            tx = jnp.tan(t_src[:, 1, None, None] / 1e3)
            tilt_factor = expi(
                dz * (jnp.asarray(buffers.Ky)[None] * ty
                      + jnp.asarray(buffers.Kx)[None] * tx))
            H = base[None] * tilt_factor
        else:
            H = base[None]
        dp = _dispatch_dp(geom, pa, pp, probe, shifts_l, H, occu)
        det_std = geom.detector_blur_std
        if det_std is not None and det_std != 0:
            dp = gaussian_blur_2d(dp, kernel_size=5, sigma=det_std)
        # measurements: upcast reduced-precision storage, then the on-the-fly
        # pad/resample — forward.get_measurements applied to the slab-local
        # batch (per-sample ops, so they stay shard-local)
        meas = meas_l.astype(jnp.float32)
        if geom.meas_pad_idx is not None:
            h1, h2, w1, w2 = geom.meas_pad_idx
            canvas = jnp.broadcast_to(
                meas_bg, (meas.shape[0], *geom.meas_padded_shape))
            meas = canvas.at[..., h1:h2, w1:w2].set(meas)
        if geom.meas_scale_factors is not None and any(
                s != 1 for s in geom.meas_scale_factors):
            meas = bilinear_resize_conserve(meas, geom.meas_scale_factors)

        # every active term reduces to masked PARTIAL SUMS over the local
        # batch; one fused psum of the dict, then each term recomposes to
        # losses.combined_loss's exact masked algebra (_bmean(x, mask) ==
        # sum(x*w) / (n_valid * prod(non-batch dims)))
        w = mask_l[:, None, None]
        npix = dp.shape[-2] * dp.shape[-1]
        denom = n_valid * npix
        part = {}
        if "loss_single" in active:
            p = float(cfg["loss_single"].get("dp_pow", 0.5))
            mp = meas**p
            part["single_mse"] = jnp.sum(w * (dp**p - mp) ** 2)
            part["single_dat"] = jnp.sum(w * mp)
        if "loss_poissn" in active:
            p = float(cfg["loss_poissn"].get("dp_pow", 1.0))
            epsv = float(cfg["loss_poissn"].get("eps", 1e-6))
            mp, dpp = meas**p, dp**p
            part["poissn_ll"] = jnp.sum(w * (mp * jnp.log(dpp + epsv) - dpp))
            part["poissn_dat"] = jnp.sum(w * mp)
        if "loss_pacbed" in active:
            p = float(cfg["loss_pacbed"].get("dp_pow", 0.2))
            part["pacbed_dp"] = jnp.sum(dp * w, axis=0)    # (Ny, Nx)
            part["pacbed_ms"] = jnp.sum(meas * w, axis=0)  # (Ny, Nx)
            part["pacbed_dat"] = jnp.sum(w * meas**p)
        if "loss_sparse" in active:
            n_ord = cfg["loss_sparse"]["ln_order"]
            absn = jnp.abs(pp) ** n_ord * mask_l[:, None, None, None, None]
            part["sparse"] = jnp.sum(absn, axis=(0, 2, 3, 4))  # (omode,)
        simlar_on = "loss_simlar" in active and pa.shape[1] > 1
        if simlar_on:
            # per-sample std over the omode axis after optional blur /
            # downsample — all shard-local; the masked batch mean psums.
            # Normalize by the (static) per-map voxel count locally so the
            # psum'd scalar only needs the global 1/n_valid.
            sl = cfg["loss_simlar"]
            scale = sl.get("scale_factor")

            def simlar_partial(patches):
                bstd = sl.get("blur_std")
                if bstd is not None and bstd != 0:
                    patches = gaussian_blur_2d(patches, kernel_size=5, sigma=bstd)
                if scale is not None and any(s != 1 for s in scale):
                    patches = area_downsample(patches, tuple(scale))
                weighted = patches * occu[:, None, None, None]
                std_map = jnp.std(weighted, axis=1, ddof=1)  # (b, Nz, Ny', Nx')
                vox = std_map.shape[1] * std_map.shape[2] * std_map.shape[3]
                return jnp.sum(std_map * mask_l[:, None, None, None]) / vox

            obj_type = sl.get("obj_type", "both")
            sim = jnp.float32(0.0)
            if obj_type in ("amplitude", "both"):
                sim = sim + simlar_partial(pa)
            if obj_type in ("phase", "both"):
                sim = sim + simlar_partial(pp)
            part["simlar"] = sim

        g = jax.lax.psum(part, DATA_AXIS) if part else part
        zero = jnp.float32(0.0)
        terms = {k: zero for k in cfg}
        if "loss_single" in active:
            sc = cfg["loss_single"]
            terms["loss_single"] = sc["weight"] * (
                jnp.sqrt(g["single_mse"] / denom) / (g["single_dat"] / denom))
        if "loss_poissn" in active:
            sc = cfg["loss_poissn"]
            nll = -g["poissn_ll"] / denom
            terms["loss_poissn"] = sc["weight"] * nll / (g["poissn_dat"] / denom)
        if "loss_pacbed" in active:
            sc = cfg["loss_pacbed"]
            p = float(sc.get("dp_pow", 0.2))
            avg_dp = g["pacbed_dp"] / n_valid
            avg_ms = g["pacbed_ms"] / n_valid
            mse = jnp.mean((avg_dp**p - avg_ms**p) ** 2)
            terms["loss_pacbed"] = (
                sc["weight"] * jnp.sqrt(mse) / (g["pacbed_dat"] / denom))
        if "loss_sparse" in active:
            sc = cfg["loss_sparse"]
            vox = n_valid * pp.shape[2] * pp.shape[3] * pp.shape[4]
            per_mode = (g["sparse"] / vox) ** (1.0 / sc["ln_order"])
            terms["loss_sparse"] = sc["weight"] * jnp.sum(per_mode * occu)
        if simlar_on:
            terms["loss_simlar"] = (
                cfg["loss_simlar"]["weight"] * g["simlar"] / n_valid)
        return sum(terms.values()), terms

    term_specs = {k: P() for k in cfg}
    if store_cap is None:
        fn = local_loss
        in_specs = (CANVAS_SPEC, CANVAS_SPEC, P(), P(), P(), P(), P(),
                    P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                    P(), P(DATA_AXIS), P())
    else:
        def fn(obja_sh, objp_sh, probe_re, probe_im, h_re, h_im, occu,
               pos_l, meas_store_l, slots_l, shifts_l, tilts_l, dz,
               mask_l, n_valid):
            off = jax.lax.axis_index(DATA_AXIS) * store_cap
            meas_l = meas_store_l[slots_l - off]
            return local_loss(obja_sh, objp_sh, probe_re, probe_im, h_re,
                              h_im, occu, pos_l, meas_l, shifts_l, tilts_l,
                              dz, mask_l, n_valid)

        in_specs = (CANVAS_SPEC, CANVAS_SPEC, P(), P(), P(), P(), P(),
                    P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                    P(DATA_AXIS), P(), P(DATA_AXIS), P())
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), term_specs),
        check_vma=False,  # ppermute + psum manage replication explicitly
    )


def build_canvas_train_step(
    buffers: Buffers,
    geom: Geometry,
    mesh: Mesh,
    plan: CanvasPlan,
    loss_params: Optional[dict],
    optimizer,
):
    """Jittable full-batch training step over the canvas-sharded loss:
    `step(params, opt_state, pos_l, meas_l) -> (params', opt_state', loss)`.

    The optimizer update runs on the row-sharded canvas leaves directly —
    Adam moments shard with them, so per-device optimizer memory also drops
    by the mesh size. Multi-iteration equality with the replicated training
    loop is asserted in tests/test_engine.py::TestCanvasSharding.
    """
    loss_fn, inputs = build_canvas_sharded_loss(buffers, geom, mesh, plan, loss_params)

    import optax

    @jax.jit
    def step(params: PtychoParams, opt_state, pos_l, meas_l):
        loss, grads = jax.value_and_grad(loss_fn)(params, pos_l, meas_l)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, inputs


@dataclasses.dataclass(frozen=True)
class CanvasEpochPlan:
    """Minibatched extension of CanvasPlan: each slab's positions split into
    n_batches groups, every (slab, batch) cell mask-padded to one global
    slot count so a single compiled program scans the whole epoch."""

    base: CanvasPlan
    n_batches: int
    b_local: int             # per-device per-batch slot count
    pos_index: np.ndarray    # (n_batches, n_dev*b_local)
    mask: np.ndarray         # (n_batches, n_dev*b_local) f32


def plan_canvas_epoch(crop_pos: np.ndarray, noy: int, probe_ny: int,
                      n_dev: int, n_batches: int, seed: int = 0) -> CanvasEpochPlan:
    """Split each slab's positions into n_batches minibatches (seeded shuffle
    within the slab — the canvas-sharded analog of engine/batching's
    per-iteration random grouping; positions cannot leave their slab, so the
    shuffle is per-slab by construction)."""
    base = plan_canvas_sharding(crop_pos, noy, probe_ny, n_dev)
    crop_pos = np.asarray(crop_pos)
    slab = _slab_of(crop_pos, base.rows_local, n_dev)
    rng = np.random.default_rng(seed)
    groups = {}
    b_local = 1
    for d in range(n_dev):
        mine = np.nonzero(slab == d)[0]
        mine = rng.permutation(mine)
        for b, part in enumerate(np.array_split(mine, n_batches)):
            groups[(b, d)] = part
            b_local = max(b_local, len(part))
    pos_index = np.zeros((n_batches, n_dev, b_local), np.int64)
    mask = np.zeros((n_batches, n_dev, b_local), np.float32)
    for (b, d), part in groups.items():
        pos_index[b, d, : len(part)] = part
        mask[b, d, : len(part)] = 1.0
    per_batch = mask.reshape(n_batches, -1).sum(axis=1)
    if per_batch.min() == 0:
        raise ValueError(
            f"canvas epoch: batch {int(per_batch.argmin())} has no scan "
            f"positions — use n_batches <= {int(np.bincount(slab).max())}")
    return CanvasEpochPlan(
        base=base, n_batches=n_batches, b_local=b_local,
        pos_index=pos_index.reshape(n_batches, -1),
        mask=mask.reshape(n_batches, -1),
    )


def build_canvas_train_epoch(
    buffers: Buffers,
    geom: Geometry,
    mesh: Mesh,
    plan: CanvasEpochPlan,
    loss_params: Optional[dict],
    optimizer,
):
    """One jitted lax.scan over per-slab minibatches — the production shape
    of engine/solver.build_train_epoch, on the canvas-sharded loss:

      epoch(params, opt_state, pos_b, meas_b, mask_b, nval_b, idx_b)
        -> (params', opt_state', losses (n_batches,))

    Returns (epoch_fn, inputs) with inputs the mesh-sharded per-batch
    arrays (jit ARGUMENTS, never closed over). params/opt_state donate, so
    the row-sharded canvases and Adam moments update in place across
    epochs; mask and n_valid are traced per-batch values, so ragged slabs
    recompile nothing."""
    import optax

    from ptyrad_tpu.losses import merge_loss_params

    cfg = merge_loss_params(loss_params)
    active = set(k for k, v in cfg.items() if v["state"])
    base = plan.base
    n_dev, halo = base.n_dev, base.halo
    n_slots = plan.pos_index.shape[1]

    pos_local = slab_local_positions(
        buffers.crop_pos, plan.pos_index, base.rows_local, n_dev, plan.b_local)
    meas = np.asarray(buffers.measurements)[plan.pos_index]

    bsh = NamedSharding(mesh, P(None, DATA_AXIS))
    # put_global: works on process-spanning meshes (device_put cannot
    # address other processes' devices)
    pos_b = put_global(pos_local, bsh)
    meas_b = put_global(meas, bsh)
    mask_b = put_global(plan.mask, bsh)
    nval_b = jnp.asarray(plan.mask.sum(axis=1), jnp.float32)
    idx_b = jnp.asarray(plan.pos_index)

    sharded = _make_sharded_loss(buffers, geom, mesh, n_dev, halo, cfg, active)

    def batch_loss(params, pos_l, meas_l, mask_l, nval, idxs):
        shifts = params.probe_pos_shifts[idxs]
        if geom.global_tilt:
            tilts = jnp.broadcast_to(params.obj_tilts, (n_slots, 2))
        else:
            tilts = params.obj_tilts[idxs]
        return sharded(
            params.obja, params.objp, params.probe.re, params.probe.im,
            buffers.H.re, buffers.H.im, buffers.omode_occu,
            pos_l, meas_l, shifts, tilts, params.slice_thickness,
            mask_l, nval,
        )[0]

    def epoch(params, opt_state, pos_b, meas_b, mask_b, nval_b, idx_b):
        def body(carry, xs):
            params, opt_state = carry
            pos_l, meas_l, mask_l, nval, idxs = xs
            loss, grads = jax.value_and_grad(batch_loss)(
                params, pos_l, meas_l, mask_l, nval, idxs)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (pos_b, meas_b, mask_b, nval_b, idx_b))
        return params, opt_state, losses

    return jax.jit(epoch, donate_argnums=(0, 1)), (pos_b, meas_b, mask_b, nval_b, idx_b)


@dataclasses.dataclass(frozen=True)
class CanvasStore:
    """Device-resident, slab-major measurement store for production canvas
    training: the measurements transfer ONCE (sharded over the mesh in slab
    order); afterwards each iteration ships only tiny slot-index arrays and
    the in-shard gather meas_store[slots - axis_index*cap] assembles every
    minibatch on device — the canvas-mode analog of the replicated path's
    device-resident Buffers.measurements."""

    plan: CanvasPlan
    cap: int                  # store rows per device
    store_valid: np.ndarray   # (n_dev*cap,) f32: 1 where the slot is real
    meas_store: jax.Array     # (n_dev*cap, My, Mx) sharded P(DATA_AXIS)
    pos_store: jax.Array      # (n_dev*cap, 2) int32 slab-local rows, replicated
    gid_store: jax.Array      # (n_dev*cap,) int32 global position ids, replicated


@functools.lru_cache(maxsize=8)
def _store_gather(mesh: Mesh):
    """Jitted slab-major gather with sharded output, cached per mesh —
    hypertune rebuilds the store per trial and a fresh lambda would re-pay
    the remote compile every time (same reasoning as state._convert_meas)."""
    return jax.jit(
        lambda m, i: jnp.take(m, i, axis=0),
        out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
    )


def build_canvas_store(buffers: Buffers, geom: Geometry, mesh: Mesh,
                       plan: CanvasPlan) -> CanvasStore:
    """Lay the measurements out slab-major on the mesh (one transfer).

    Reduced-precision (meas_dtype) storage is preserved — the local loss
    upcasts per batch, exactly like forward.get_measurements."""
    n_dev, cap = plan.n_dev, plan.b_local
    pos_local = slab_local_positions(
        buffers.crop_pos, plan.pos_index, plan.rows_local, n_dev, cap)
    rep = NamedSharding(mesh, P())
    if isinstance(buffers.measurements, jax.Array):
        # already device-resident (e.g. simulated there): gather slab-major
        # ON DEVICE — np.asarray would fetch the whole store to host and
        # re-upload it, minutes per GB on tunneled backends (the cost
        # make_model's device branch exists to avoid)
        idx = put_global(plan.pos_index.astype(np.int32),
                         NamedSharding(mesh, P(DATA_AXIS)))
        meas_store = _store_gather(mesh)(buffers.measurements, idx)
    else:
        meas = np.asarray(buffers.measurements)[plan.pos_index]
        meas_store = put_global(meas, NamedSharding(mesh, P(DATA_AXIS)))
    return CanvasStore(
        plan=plan,
        cap=cap,
        store_valid=plan.mask.copy(),
        meas_store=meas_store,
        pos_store=put_global(pos_local, rep),
        gid_store=put_global(plan.pos_index.astype(np.int32), rep),
    )


def canvas_iteration_batches(store: CanvasStore, n_batches: int, niter: int):
    """Per-iteration minibatching over the resident store: shuffle each
    slab's valid slots (seeded by the iteration — the canvas analog of
    engine/solver.iter_batch_perm, so runs reproduce and every rank of a
    multi-process mesh builds the same order), split into n_batches, pad
    ragged cells with the device's slot 0 masked to zero.

    Returns (slots (n_batches, n_dev*b_local) int32 GLOBAL store-slot ids,
    mask, n_valid (n_batches,)) — per-slab counts are iteration-invariant,
    so the shapes are static and the epoch never recompiles."""
    n_dev, cap = store.plan.n_dev, store.cap
    rng = np.random.default_rng(1000003 * niter + 7)
    valid = store.store_valid.reshape(n_dev, cap)
    parts = {}
    b_local = 1
    for d in range(n_dev):
        slots = np.nonzero(valid[d])[0] + d * cap
        slots = rng.permutation(slots)
        for b, part in enumerate(np.array_split(slots, n_batches)):
            parts[(b, d)] = part
            b_local = max(b_local, len(part))
    slots_arr = np.zeros((n_batches, n_dev, b_local), np.int32)
    mask = np.zeros((n_batches, n_dev, b_local), np.float32)
    for d in range(n_dev):
        slots_arr[:, d, :] = d * cap  # padding points at the device's slot 0
    for (b, d), part in parts.items():
        slots_arr[b, d, : len(part)] = part
        mask[b, d, : len(part)] = 1.0
    nval = mask.reshape(n_batches, -1).sum(axis=1).astype(np.float32)
    if nval.min() == 0:
        raise ValueError(
            f"canvas batching: iteration batch {int(nval.argmin())} has no "
            f"scan positions — use n_batches <= "
            f"{int(store.store_valid.reshape(n_dev, cap).sum(1).max())}")
    return slots_arr.reshape(n_batches, -1), mask.reshape(n_batches, -1), nval


def _make_store_batch_loss(
    buffers: Buffers,
    geom: Geometry,
    mesh: Mesh,
    store: CanvasStore,
    loss_params: Optional[dict],
):
    """The per-minibatch objective shared by the Adam epoch and the LBFGS
    step: batch_loss(params, meas_store, slots, mask_l, nval) -> (total,
    terms). The measurement store is an explicit ARGUMENT (never closed
    over — CLAUDE.md invariant) gathered shard-locally."""
    from ptyrad_tpu.losses import merge_loss_params

    cfg = merge_loss_params(loss_params)
    active = set(k for k, v in cfg.items() if v["state"])
    plan = store.plan
    sharded = _make_sharded_loss(
        buffers, geom, mesh, plan.n_dev, plan.halo, cfg, active,
        store_cap=store.cap)
    pos_store, gid_store = store.pos_store, store.gid_store

    def batch_loss(params, meas_store, slots, mask_l, nval):
        n_slots = slots.shape[0]
        pos_l = pos_store[slots]   # replicated table, sharded gather indices
        gid = gid_store[slots]
        shifts = params.probe_pos_shifts[gid]
        if geom.global_tilt:
            tilts = jnp.broadcast_to(params.obj_tilts, (n_slots, 2))
        else:
            tilts = params.obj_tilts[gid]
        return sharded(
            params.obja, params.objp, params.probe.re, params.probe.im,
            buffers.H.re, buffers.H.im, buffers.omode_occu,
            pos_l, meas_store, slots, shifts, tilts, params.slice_thickness,
            mask_l, nval,
        )

    return batch_loss


def build_canvas_store_epoch(
    buffers: Buffers,
    geom: Geometry,
    mesh: Mesh,
    store: CanvasStore,
    loss_params: Optional[dict],
    optimizer,
    start_iters: Optional[dict] = None,
):
    """The production canvas iteration (PtyRADSolver's SHARD_CANVAS path):

      epoch(params, opt_state, meas_store, slots_b, mask_b, nval_b, niter)
        -> (params', opt_state', total_mean, terms (n_batches,) per key)

    One jitted lax.scan over the per-iteration minibatches from
    canvas_iteration_batches; the measurement store is an explicit ARGUMENT
    (never closed over — CLAUDE.md invariant) gathered shard-locally; grads
    and updates of tensors whose start_iter hasn't arrived are zeroed
    exactly like engine/solver.build_train_epoch."""
    import optax

    from ptyrad_tpu.optim import mask_unstarted_grads

    start_iters = start_iters or {}
    batch_loss = _make_store_batch_loss(buffers, geom, mesh, store, loss_params)

    def epoch(params, opt_state, meas_store, slots_b, mask_b, nval_b, niter):
        def body(carry, xs):
            params, opt_state = carry
            slots, mask_l, nval = xs
            (total, terms), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(params, meas_store, slots, mask_l, nval)
            grads = mask_unstarted_grads(grads, niter, start_iters)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            # updates masked too: decoupled weight decay on unstarted tensors
            # (see engine/solver.build_train_step)
            updates = mask_unstarted_grads(updates, niter, start_iters)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (total, terms)

        (params, opt_state), (totals, terms) = jax.lax.scan(
            body, (params, opt_state), (slots_b, mask_b, nval_b))
        return params, opt_state, jnp.mean(totals), terms

    return jax.jit(epoch, donate_argnums=(0, 1))


def canvas_state_shardings(abstract_state, mesh: Mesh, canvas_shape):
    """NamedShardings for an optimizer state over row-sharded canvases: any
    leaf whose trailing 4 dims are the PADDED canvas shape — Adam moments,
    momentum/param copies, LBFGS's stacked (m, ...) diff memories — row-shards
    on axis -2; everything else replicates. Used as jit out_shardings for
    `optimizer.init`, so the big state buffers are born sharded and never
    materialize replicated (the point of shard_canvas)."""
    canvas_shape = tuple(canvas_shape)

    def sh(s):
        shape = tuple(getattr(s, "shape", ()))
        if len(shape) >= 4 and shape[-4:] == canvas_shape:
            spec = P(*((None,) * (len(shape) - 2)), DATA_AXIS, None)
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(sh, abstract_state)


def build_canvas_lbfgs_step(
    buffers: Buffers,
    geom: Geometry,
    mesh: Mesh,
    store: CanvasStore,
    loss_params: Optional[dict],
    optimizer,
    start_iters: Optional[dict] = None,
):
    """LBFGS on the row-sharded canvas (the combination the reference cannot
    express at all: its LBFGS must fall back to Adam even under plain DDP,
    reference reconstruction.py:697-735 note):

      step(params, opt_state, meas_store, slots_b, mask_b, nval_b, niter)
        -> (params', opt_state', value)

    The objective mirrors engine/solver.build_lbfgs_step — the mean over
    minibatches of the store batch loss, evaluated as a rematerialized
    lax.scan so HBM holds one batch of wavefields at a time — but every
    evaluation (the linesearch makes several) runs on the SHARDED canvas,
    and the LBFGS diff memories row-shard with it (init via
    canvas_state_shardings), so the m-deep history that makes replicated
    LBFGS memory-hungry scales down by the mesh size."""
    import optax

    from ptyrad_tpu.optim import freeze_unstarted_params

    start_iters = start_iters or {}
    batch_loss = _make_store_batch_loss(buffers, geom, mesh, store, loss_params)

    def value_fn_of(meas_store, slots_b, mask_b, nval_b, niter):
        # remat: without it the scan stacks every batch's forward residuals
        one_batch = jax.checkpoint(
            lambda params, slots, mask_l, nval:
                batch_loss(params, meas_store, slots, mask_l, nval)[0])

        def value_fn(params):
            if start_iters:
                # gate INSIDE the objective so the linesearch's internal
                # gradient evaluations are gated too
                params = freeze_unstarted_params(params, niter, start_iters)

            def body(acc, xs):
                slots, mask_l, nval = xs
                return acc + one_batch(params, slots, mask_l, nval), None

            total, _ = jax.lax.scan(
                body, jnp.asarray(0.0, jnp.float32), (slots_b, mask_b, nval_b))
            return total / slots_b.shape[0]

        return value_fn

    def step(params, opt_state, meas_store, slots_b, mask_b, nval_b, niter):
        value_fn = value_fn_of(meas_store, slots_b, mask_b, nval_b, niter)
        value, grad = optax.value_and_grad_from_state(value_fn)(
            params, state=opt_state)
        updates, opt_state = optimizer.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=value_fn)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    return jax.jit(step, donate_argnums=(0, 1))


def build_canvas_gather(mesh: Mesh, noy: int):
    """Jitted row-sharded -> replicated whole-canvas params: crops the
    padding rows and lets XLA all-gather the slabs over ICI. Multi-process
    safe — every process ends holding fully replicated canvases, the same
    layout the standard solver path and the savers/plotters consume (a host
    np.asarray on a process-spanning SHARDED array is not addressable;
    gathering on device first is)."""
    rep = NamedSharding(mesh, P())

    def gather(params_sh: PtychoParams) -> PtychoParams:
        return PtychoParams(
            obja=params_sh.obja[:, :, :noy, :],
            objp=params_sh.objp[:, :, :noy, :],
            probe=params_sh.probe,
            probe_pos_shifts=params_sh.probe_pos_shifts,
            obj_tilts=params_sh.obj_tilts,
            slice_thickness=params_sh.slice_thickness,
        )

    return jax.jit(gather, out_shardings=rep)


def build_opt_state_gather(mesh: Mesh, noy: int, noy_pad: int):
    """Row-sharded -> replicated HOST optimizer state for checkpointing:
    canvas-shaped moment leaves (Adam mu/nu, MultiSteps acc_grads, LBFGS's
    stacked diff memories — any leaf whose axis -2 carries the padded row
    extent) drop their padding rows and all-gather; everything else fetches
    as-is. The result is the SAME layout a replicated-mode run would
    checkpoint, so optim-state files are interchangeable across modes, mesh
    sizes, and with the reference's own torch checkpoints.

    Leaves materialize ONE AT A TIME as host numpy (the savers host-convert
    anyway): the peak device footprint is a single replicated leaf — for
    LBFGS state (~2m canvas copies) a whole-tree device gather would
    rematerialize exactly the memory wall shard_canvas removes."""
    rep = NamedSharding(mesh, P())
    # one compiled program per distinct canvas-leaf shape (mu/nu share one,
    # the stacked memories another) — the jitted-program count stays small
    crop = jax.jit(lambda x: x[..., :noy, :], out_shardings=rep)

    def fix(leaf):
        if getattr(leaf, "ndim", 0) >= 4 and leaf.shape[-2] == noy_pad:
            return np.asarray(crop(leaf))
        if hasattr(leaf, "shape"):
            # replicated leaves are fully addressable on every process
            return np.asarray(leaf)
        return leaf

    def gather(opt_state):
        return jax.tree_util.tree_map(fix, opt_state)

    return gather


def make_opt_state_coerce(plan: CanvasPlan, mesh: Mesh, noy: int):
    """The restore-side inverse of build_opt_state_gather, plugged into
    optim._apply_keystr_dict: checkpointed moments arrive in the replicated
    host layout; canvas-shaped ones (template leaf padded to plan.noy_pad on
    axis -2) are zero-padded — padding rows receive zero gradient, so a zero
    moment is the exact resume — and laid out row-sharded; the rest
    replicate. put_global, so process-spanning meshes work."""
    rep = NamedSharding(mesh, P())
    pad = plan.noy_pad - noy

    def coerce(leaf, arr):
        nd = getattr(leaf, "ndim", 0)
        if (nd >= 4 and leaf.shape[-2] == plan.noy_pad
                and arr.ndim == nd and arr.shape[-2] == noy
                and arr.shape[:-2] + arr.shape[-1:] == leaf.shape[:-2] + leaf.shape[-1:]):
            arr = np.pad(arr, [(0, 0)] * (nd - 2) + [(0, pad), (0, 0)])
            spec = P(*((None,) * (nd - 2)), DATA_AXIS, None)
            return put_global(arr.astype(leaf.dtype), NamedSharding(mesh, spec))
        return put_global(
            np.asarray(arr, dtype=leaf.dtype).reshape(leaf.shape), rep)

    return coerce


def build_constraint_bridge(scheduler, mesh: Mesh, plan: CanvasPlan, noy: int):
    """Jitted constraint application on row-sharded params: all-gather the
    slabs to whole (unpadded) canvases, run the due constraint projections
    exactly as the replicated path does (ConstraintScheduler.apply_traced —
    kr/kz filters must see the TRUE canvas extent, not the padded one),
    re-pad, and re-shard. One device program per call, no host round-trip,
    multi-process safe:

      bridge(params_sh, buffers, niter) -> params_sh'

    Buffers rides as a jit argument (never closed over); pass a slimmed
    Buffers (measurements=None) — constraints only read probe_int_sum."""
    canvas_sh = NamedSharding(mesh, CANVAS_SPEC)
    pad = plan.noy_pad - noy

    def bridge(params_sh: PtychoParams, buffers, niter) -> PtychoParams:
        whole = PtychoParams(
            obja=params_sh.obja[:, :, :noy, :],
            objp=params_sh.objp[:, :, :noy, :],
            probe=params_sh.probe,
            probe_pos_shifts=params_sh.probe_pos_shifts,
            obj_tilts=params_sh.obj_tilts,
            slice_thickness=params_sh.slice_thickness,
        )
        out = scheduler.apply_traced(whole, buffers, niter)
        obja = jnp.pad(out.obja, ((0, 0), (0, 0), (0, pad), (0, 0)),
                       constant_values=1.0)
        objp = jnp.pad(out.objp, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return PtychoParams(
            obja=jax.lax.with_sharding_constraint(obja, canvas_sh),
            objp=jax.lax.with_sharding_constraint(objp, canvas_sh),
            probe=out.probe,
            probe_pos_shifts=out.probe_pos_shifts,
            obj_tilts=out.obj_tilts,
            slice_thickness=out.slice_thickness,
        )

    return jax.jit(bridge)
