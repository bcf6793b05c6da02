"""Batched object-patch extraction (gather) and its scatter-add adjoint.

The forward model crops a (Ny, Nx) probe-sized window out of the object
canvas at each scan position (reference src/ptyrad/models.py:251-265,
get_obj_ROI). Under reverse-mode AD the transpose of this gather is a
scatter-add of per-position patch gradients into the shared canvas — the most
memory-bound op in the model.

TPU lowering: the gather is expressed as a vmap of lax.dynamic_slice, which
XLA lowers to a batched slice-gather; its transpose is a batched
dynamic-update-slice-add (scatter-add). Both keep the patch shape static so
the compiler can tile the copies. A fused Pallas kernel (gather + sub-pixel
window) is a planned optimization once profiling justifies it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def extract_patches(canvas: jnp.ndarray, crop_pos: jnp.ndarray, patch_shape: tuple[int, int]) -> jnp.ndarray:
    """Gather patches from `canvas` at integer top-left corners.

    Args:
      canvas: (..., Noy, Nox) array; leading axes (e.g. omode, Nz) are copied
        whole into each patch.
      crop_pos: (B, 2) int32 top-left (y, x) corners; caller guarantees
        0 <= y <= Noy-Ny and 0 <= x <= Nox-Nx (lax.dynamic_slice clamps
        out-of-range starts rather than erroring).
      patch_shape: static (Ny, Nx).

    Returns:
      (B, ..., Ny, Nx) patches. Differentiable w.r.t. `canvas`; the VJP is a
      batched scatter-add into the canvas.
    """
    ny, nx = patch_shape
    lead = canvas.shape[:-2]
    zeros = (jnp.int32(0),) * len(lead)

    def take_one(pos):
        start = zeros + (pos[0], pos[1])
        return lax.dynamic_slice(canvas, start, lead + (ny, nx))

    return jax.vmap(take_one)(crop_pos.astype(jnp.int32))


def scatter_add_patches(
    canvas_shape: tuple[int, ...], patches: jnp.ndarray, crop_pos: jnp.ndarray
) -> jnp.ndarray:
    """Accumulate (B, ..., Ny, Nx) patches into a fresh (..., Noy, Nox) canvas.

    This is the explicit adjoint of `extract_patches`; exposed for analysis
    tools (e.g. overlap/illumination maps) and tested against the AD transpose.
    """
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
