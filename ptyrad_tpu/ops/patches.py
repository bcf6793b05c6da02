"""Batched object-patch extraction (gather) and its scatter-add adjoint.

The forward model crops a (Ny, Nx) probe-sized window out of the object
canvas at each scan position (reference src/ptyrad/models.py:251-265,
get_obj_ROI). Under reverse-mode AD the transpose of this gather is a
scatter-add of per-position patch gradients into the shared canvas — the most
memory-bound op in the model.

TPU lowering: the gather is a vmap of lax.dynamic_slice (a batched
slice-gather). Its AD transpose, left to XLA, becomes a *serial* per-sample
HBM read-modify-write loop (dynamic-update-slice inside a while) that
profiling showed at ~35% of the training step at ~30 GB/s effective — far
below HBM bandwidth, because each 128-row patch update touches partial
(8, 128) tiles at unaligned dynamic offsets. `extract_patches` therefore
carries a custom VJP backed by a Pallas kernel that keeps the WHOLE gradient
canvas resident in VMEM across a (batch,) grid: each grid step adds one patch
into the VMEM accumulator (on-chip bandwidth), and the canvas is written back
to HBM once. The canvas fits easily: the production tBL_WSe2 object is
(6, 520, 520) f32 ≈ 6.5 MB vs ~16 MB more VMEM.

On non-TPU backends the VJP falls back to XLA's native transpose.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _extract_impl(canvas: jnp.ndarray, crop_pos: jnp.ndarray, patch_shape: tuple[int, int]) -> jnp.ndarray:
    ny, nx = patch_shape
    lead = canvas.shape[:-2]
    zeros = (jnp.int32(0),) * len(lead)

    def take_one(pos):
        start = zeros + (pos[0], pos[1])
        return lax.dynamic_slice(canvas, start, lead + (ny, nx))

    return jax.vmap(take_one)(crop_pos.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Pallas scatter-add (TPU)
# ---------------------------------------------------------------------------

try:  # pallas imports fail gracefully on backends without Mosaic support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # noqa: BLE001
    _HAVE_PALLAS = False

from ptyrad_tpu.ops.kernel_util import compiler_params as _compiler_params
from ptyrad_tpu.ops.mesh_env import DATA_AXIS, get_kernel_mesh, kernel_mesh_size

_INTERPRET = False  # flipped by tests: route dispatch through interpret-mode kernels
_FORCE_XLA = False  # kernels-off retry after a Mosaic VMEM compile failure


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def set_force_xla(flag: bool) -> None:
    """Disable the Pallas gather/scatter kernels (geom.fwd_fused only gates
    the multislice kernels — the Mosaic-OOM fallback needs BOTH off). Reset
    to False by each fresh PtyRADSolver so one degraded run does not leak
    into the next."""
    global _FORCE_XLA
    _FORCE_XLA = flag


_SUB, _LANE = 8, 128  # f32 VMEM tile (sublane, lane)
# What the lead-chunk planner asks for, tracking kernel_util's Mosaic
# ceiling with headroom; at 60 MB the 21-slice PSO canvas (13.9 MB block)
# runs as ONE chunk instead of two, with no lead padding.
from ptyrad_tpu.ops.kernel_util import VMEM_LIMIT_BYTES as _VMEM_LIMIT_BYTES

_VMEM_BUDGET = (_VMEM_LIMIT_BYTES * 5) // 8


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _window_dims(ny: int, nx: int) -> tuple[int, int]:
    """Scatter-window dims: one tile of headroom for the in-tile residual
    shift, rounded so Mosaic's roll sees tile-aligned vector shapes."""
    return _round_up(ny, _SUB) + _SUB, _round_up(nx, _LANE) + _LANE


def _scatter_kernel(pos_ref, patch_ref, out_ref, pad_ref):
    """Grid step (j, i) adds lead-chunk j of patch i into the VMEM-resident
    canvas-chunk accumulator.

    The batch axis is innermost, so out_ref's block (indexed by the chunk
    only) stays in VMEM across all batch steps and writes HBM once per
    chunk — lead chunking is how canvases bigger than VMEM (large
    omode*Nz, e.g. 21-slice PSO objects) keep the kernel path. Mosaic
    requires vector loads/stores at tile-aligned offsets, so the dynamic
    (y, x) corner is split into an aligned base plus an in-tile residual;
    the patch is placed in a tile-aligned, one-tile-larger scratch window
    and rolled by the residual. Offsets are clamped to match
    lax.dynamic_slice semantics (the caller pads the canvas so the aligned
    window stays in range).
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    _, ny, nx = patch_ref.shape[1:]
    wy, wx = pad_ref.shape[-2:]
    h, w = out_ref.shape[-2:]  # already padded past the unclamped max corner
    y = jnp.clip(pos_ref[i, 0], 0, h - wy)
    x = jnp.clip(pos_ref[i, 1], 0, w - wx)
    y0 = pl.multiple_of((y // _SUB) * _SUB, _SUB)
    x0 = pl.multiple_of((x // _LANE) * _LANE, _LANE)

    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[:, :ny, :nx] = patch_ref[0]
    shifted = pltpu.roll(pad_ref[...], y - y0, axis=1)
    shifted = pltpu.roll(shifted, x - x0, axis=2)
    out_ref[:, pl.ds(y0, wy), pl.ds(x0, wx)] = (
        out_ref[:, pl.ds(y0, wy), pl.ds(x0, wx)] + shifted
    )


def _gather_kernel(pos_ref, canvas_ref, out_ref, pad_ref):
    """Grid step (j, i) reads lead-chunk j of patch i out of the
    VMEM-resident canvas chunk.

    Mirror of _scatter_kernel: the aligned window at the tile-aligned base is
    read, rolled by the NEGATIVE in-tile residual (as a positive circular
    shift of window_size - residual; the wrap never reaches the [:ny, :nx]
    corner that is written out), and the patch corner stored."""
    i = pl.program_id(1)
    _, ny, nx = out_ref.shape[1:]
    wy, wx = pad_ref.shape[-2:]
    h, w = canvas_ref.shape[-2:]  # already padded past the max corner
    y = jnp.clip(pos_ref[i, 0], 0, h - wy)
    x = jnp.clip(pos_ref[i, 1], 0, w - wx)
    y0 = pl.multiple_of((y // _SUB) * _SUB, _SUB)
    x0 = pl.multiple_of((x // _LANE) * _LANE, _LANE)

    pad_ref[...] = canvas_ref[:, pl.ds(y0, wy), pl.ds(x0, wx)]
    rolled = pltpu.roll(pad_ref[...], wy - (y - y0), axis=1)
    rolled = pltpu.roll(rolled, wx - (x - x0), axis=2)
    out_ref[0] = rolled[:, :ny, :nx]


def pallas_gather(
    canvas: jnp.ndarray, crop_pos: jnp.ndarray, patch_shape: tuple[int, int],
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather (B, ..., Ny, Nx) patches with the canvas held in VMEM (in lead
    chunks when the whole canvas does not fit)."""
    if not _HAVE_PALLAS:
        raise RuntimeError("pallas_gather requires jax.experimental.pallas")
    ny, nx = patch_shape
    b = crop_pos.shape[0]
    lead = canvas.shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    lc = _lead_chunk(canvas.shape, ny, nx)
    assert lc is not None, "caller must check _kernel_fits first"
    h, w = canvas.shape[-2], canvas.shape[-1]
    wy, wx = _window_dims(ny, nx)
    hp, wp = h + (wy - ny), w + (wx - nx)
    assert l % lc == 0, "_lead_chunk returns divisors of the lead dim"
    canvas3 = jnp.pad(canvas.reshape(l, h, w), ((0, 0), (0, hp - h), (0, wp - w)))

    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(l // lc, b),
            in_specs=[
                pl.BlockSpec((lc, hp, wp), lambda j, i, pos: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, lc, ny, nx), lambda j, i, pos: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((lc, wy, wx), canvas.dtype),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, ny, nx), canvas.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(_chunk_need_bytes(canvas.shape, ny, nx, lc)),
    )(crop_pos.astype(jnp.int32), canvas3)
    return out.reshape((b,) + lead + (ny, nx))


def pallas_scatter_add(
    canvas_shape: tuple[int, ...], patches: jnp.ndarray, crop_pos: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Scatter-add (B, ..., Ny, Nx) patches into a fresh (..., Noy, Nox) canvas
    with the gradient canvas held in VMEM across the batch (lead-chunked when
    the whole canvas does not fit)."""
    if not _HAVE_PALLAS:
        raise RuntimeError("pallas_scatter_add requires jax.experimental.pallas")
    b, ny, nx = patches.shape[0], patches.shape[-2], patches.shape[-1]
    lead = canvas_shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    lc = _lead_chunk(canvas_shape, ny, nx)
    assert lc is not None, "caller must check _kernel_fits first"
    h, w = canvas_shape[-2], canvas_shape[-1]
    wy, wx = _window_dims(ny, nx)
    # pad the canvas so the aligned window at the max clamped corner
    # (h - ny, w - nx) stays in range: hp - wy == h - ny exactly reproduces
    # lax.dynamic_slice's start clamp
    hp, wp = h + (wy - ny), w + (wx - nx)
    assert l % lc == 0, "_lead_chunk returns divisors of the lead dim"
    patches4 = patches.reshape(b, l, ny, nx)

    out = pl.pallas_call(
        _scatter_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(l // lc, b),
            in_specs=[
                pl.BlockSpec((1, lc, ny, nx), lambda j, i, pos: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((lc, hp, wp), lambda j, i, pos: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((lc, wy, wx), patches.dtype),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((l, hp, wp), patches.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(_chunk_need_bytes(canvas_shape, ny, nx, lc)),
    )(crop_pos.astype(jnp.int32), patches4)
    return out[:, :h, :w].reshape(canvas_shape)


def _lead_chunk(canvas_shape: tuple[int, ...], ny: int, nx: int,
                itemsize: int = 4):
    """Lead-dim chunk (omode*Nz slices) whose canvas block + patch buffers
    fit VMEM; None if even one slice does not fit (falls back to the XLA
    path — would need 2D canvas tiling).

    The chunk is the largest DIVISOR of l that fits: a non-divisor rounds
    the lead dim up to a multiple of lc, and the resulting jnp.pad/slice
    copies of the canvas and patch stacks are real per-step HBM traffic
    (profiled at ~2.3 ms/step on the 21-slice PSO workload when lc=18
    padded 21 -> 36). lc=1 always divides, so whenever ANY chunking fits a
    divisor is returned (_chunk_need_bytes is monotone in lc)."""
    lead = canvas_shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    for lc in range(l, 0, -1):
        if l % lc == 0 and _chunk_need_bytes(canvas_shape, ny, nx, lc, itemsize) <= _VMEM_BUDGET:
            return lc
    return None


def _chunk_need_bytes(canvas_shape: tuple[int, ...], ny: int, nx: int, lc: int,
                      itemsize: int = 4) -> int:
    """Modeled VMEM working set of the gather/scatter kernel at chunk lc —
    the single source for both chunk selection (_lead_chunk) and the Mosaic
    scoped-vmem ceiling (kernel_util.compiler_params): small canvases keep
    XLA's default limit (measurably better scheduling), large ones raise it.

    When the canvas is actually lead-chunked (more than one chunk), the
    (lc, hp, wp) canvas block's index changes across grid steps, so Pallas
    double-buffers it — count it twice in that regime."""
    lead = canvas_shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    h, w = canvas_shape[-2], canvas_shape[-1]
    wy, wx = _window_dims(ny, nx)
    hp, wp = h + (wy - ny), w + (wx - nx)
    wp_tiled = _round_up(wp, _LANE)
    canvas_blocks = 2 if lc < l else 1  # double-buffered once chunked
    return itemsize * (
        canvas_blocks * lc * hp * wp_tiled
        + lc * wy * wx
        + 3 * lc * ny * _round_up(nx, _LANE)
    )


def _kernel_fits(canvas_shape: tuple[int, ...], ny: int, nx: int, itemsize: int = 4) -> bool:
    """Some lead-chunking of the canvas must fit in VMEM."""
    return _lead_chunk(canvas_shape, ny, nx, itemsize) is not None


def _use_pallas_scatter() -> bool:
    # Single-device TPU, or any backend with a registered kernel mesh (the
    # kernels then run per-shard under shard_map, see _shard_gather /
    # _shard_scatter). _INTERPRET lets the CPU test mesh exercise that path.
    if not _HAVE_PALLAS or _FORCE_XLA:
        return False
    if _INTERPRET:
        return True
    return jax.default_backend() == "tpu" and (
        jax.device_count() == 1 or get_kernel_mesh() is not None
    )


def _shard_gather(canvas, crop_pos, patch_shape, mesh):
    """Per-shard Pallas gather: canvas replicated, positions/patches split
    over 'data'. No collective needed — the gather is embarrassingly parallel."""
    from jax.sharding import PartitionSpec as P

    def run(canvas, crop_pos):
        return pallas_gather(canvas, crop_pos, patch_shape, interpret=_INTERPRET)

    return jax.shard_map(
        run, mesh=mesh, in_specs=(P(), P(DATA_AXIS)), out_specs=P(DATA_AXIS),
        check_vma=False,
    )(canvas, crop_pos)


def _shard_scatter(canvas_shape, patches, crop_pos, mesh):
    """Per-shard Pallas scatter-add + psum of the per-shard canvases over
    'data' — the DDP allreduce of the object gradient, riding ICI."""
    from jax.sharding import PartitionSpec as P

    def run(patches, crop_pos):
        local = pallas_scatter_add(canvas_shape, patches, crop_pos, interpret=_INTERPRET)
        return jax.lax.psum(local, DATA_AXIS)

    return jax.shard_map(
        run, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P(),
        check_vma=False,
    )(patches, crop_pos)


def _scatter_fori(canvas_shape, patches, crop_pos):
    """Sequential dynamic-update-slice scatter-add (the jnp adjoint)."""
    ny, nx = patches.shape[-2], patches.shape[-1]
    lead = canvas_shape[:-2]
    zeros = (jnp.int32(0),) * len(lead)

    def body(i, acc):
        pos = crop_pos[i]
        start = zeros + (pos[0], pos[1])
        cur = lax.dynamic_slice(acc, start, lead + (ny, nx))
        return lax.dynamic_update_slice(acc, cur + patches[i], start)

    init = jnp.zeros(canvas_shape, dtype=patches.dtype)
    return lax.fori_loop(0, patches.shape[0], body, init)


# ---------------------------------------------------------------------------
# Public gather with the fast adjoint
# ---------------------------------------------------------------------------

def _mesh_for(batch: int):
    """The registered kernel mesh, if the batch splits evenly over it."""
    mesh = get_kernel_mesh()
    if mesh is None or batch % kernel_mesh_size():
        return None
    return mesh


def _gather_impl(canvas, crop_pos, patch_shape):
    ny, nx = patch_shape
    if _use_pallas_scatter() and _kernel_fits(canvas.shape, ny, nx):
        mesh = _mesh_for(crop_pos.shape[0])
        if mesh is not None:
            return _shard_gather(canvas, crop_pos, patch_shape, mesh)
        if get_kernel_mesh() is None:
            return pallas_gather(canvas, crop_pos, patch_shape, interpret=_INTERPRET)
    return _extract_impl(canvas, crop_pos, patch_shape)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def extract_patches(canvas: jnp.ndarray, crop_pos: jnp.ndarray, patch_shape: tuple[int, int]) -> jnp.ndarray:
    """Gather patches from `canvas` at integer top-left corners.

    Args:
      canvas: (..., Noy, Nox) array; leading axes (e.g. omode, Nz) are copied
        whole into each patch.
      crop_pos: (B, 2) int32 top-left (y, x) corners; caller guarantees
        0 <= y <= Noy-Ny and 0 <= x <= Nox-Nx (lax.dynamic_slice clamps
        out-of-range starts rather than erroring; the Pallas kernels and the
        adjoint clamp the same way).
      patch_shape: static (Ny, Nx).

    Returns:
      (B, ..., Ny, Nx) patches. On TPU both directions run as Pallas kernels
      with the canvas resident in VMEM (pallas_gather / pallas_scatter_add);
      on a registered kernel mesh (ops/mesh_env.py) each data shard runs the
      kernel on its local batch under shard_map and the gradient canvases
      psum-reduce over 'data'. Elsewhere the vmap-dynamic_slice gather and
      the sequential jnp scatter.
    """
    return _gather_impl(canvas, crop_pos, patch_shape)


def _extract_fwd(canvas, crop_pos, patch_shape):
    return _gather_impl(canvas, crop_pos, patch_shape), (crop_pos, canvas.shape)


def _scatter_impl(canvas_shape, patches, crop_pos):
    ny, nx = patches.shape[-2], patches.shape[-1]
    if _use_pallas_scatter() and _kernel_fits(canvas_shape, ny, nx):
        mesh = _mesh_for(crop_pos.shape[0])
        if mesh is not None:
            return _shard_scatter(canvas_shape, patches, crop_pos, mesh)
        if get_kernel_mesh() is None:
            return pallas_scatter_add(canvas_shape, patches, crop_pos, interpret=_INTERPRET)
    return _scatter_fori(canvas_shape, patches, crop_pos)


def _extract_bwd(patch_shape, res, g):
    crop_pos, canvas_shape = res
    dcanvas = _scatter_impl(canvas_shape, g, crop_pos)
    dpos = np.zeros(crop_pos.shape, dtype=jax.dtypes.float0)
    return dcanvas, dpos


extract_patches.defvjp(_extract_fwd, _extract_bwd)


def _use_pallas_local() -> bool:
    """Kernel dispatch for a caller already INSIDE a shard_map: no mesh or
    global device-count consultation — each shard is logically one device."""
    if not _HAVE_PALLAS or _FORCE_XLA:
        return False
    if _INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def _local_gather_impl(canvas, crop_pos, patch_shape):
    ny, nx = patch_shape
    if _use_pallas_local() and _kernel_fits(canvas.shape, ny, nx):
        return pallas_gather(canvas, crop_pos, patch_shape, interpret=_INTERPRET)
    return _extract_impl(canvas, crop_pos, patch_shape)


def _local_scatter_impl(canvas_shape, patches, crop_pos):
    ny, nx = patches.shape[-2], patches.shape[-1]
    if _use_pallas_local() and _kernel_fits(canvas_shape, ny, nx):
        return pallas_scatter_add(canvas_shape, patches, crop_pos, interpret=_INTERPRET)
    return _scatter_fori(canvas_shape, patches, crop_pos)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def extract_patches_local(canvas: jnp.ndarray, crop_pos: jnp.ndarray,
                          patch_shape: tuple[int, int]) -> jnp.ndarray:
    """extract_patches for callers already INSIDE a shard_map (the
    canvas-sharded loss, parallel/canvas.py).

    extract_patches' dispatch consults the kernel mesh and the global device
    count, which inside another shard_map either nests a second shard_map
    over the bound 'data' axis (trace-time error) or, on a multi-device TPU
    with no kernel mesh registered, silently falls back to the ~24x serial
    XLA scatter adjoint. This variant goes straight to the single-device
    Pallas kernels — each shard is one device — and its scatter-add adjoint
    stays SHARD-LOCAL with no collective: for a row-sharded canvas, the
    shard's gradient IS its slab (halo terms ride the caller's ppermute
    transpose)."""
    return _local_gather_impl(canvas, crop_pos, patch_shape)


def _extract_local_fwd(canvas, crop_pos, patch_shape):
    return _local_gather_impl(canvas, crop_pos, patch_shape), (crop_pos, canvas.shape)


def _extract_local_bwd(patch_shape, res, g):
    crop_pos, canvas_shape = res
    dcanvas = _local_scatter_impl(canvas_shape, g, crop_pos)
    dpos = np.zeros(crop_pos.shape, dtype=jax.dtypes.float0)
    return dcanvas, dpos


extract_patches_local.defvjp(_extract_local_fwd, _extract_local_bwd)


def scatter_add_patches(
    canvas_shape: tuple[int, ...], patches: jnp.ndarray, crop_pos: jnp.ndarray
) -> jnp.ndarray:
    """Accumulate (B, ..., Ny, Nx) patches into a fresh (..., Noy, Nox) canvas.

    This is the explicit adjoint of `extract_patches`; exposed for analysis
    tools (e.g. overlap/illumination maps) and tested against the AD transpose.
    Routed through the Pallas kernel on TPU.
    """
    return _scatter_impl(canvas_shape, patches, crop_pos)
