"""Loss terms comparing forward diffraction patterns with measurements.

Parity with reference src/ptyrad/losses.py:17-175 (CombinedLoss +
get_objp_contrast). All functions are pure; `loss_params` is a plain nested
dict read at trace time, so disabled terms compile to nothing.

All data terms accept an optional per-sample `mask` (B,) so that batches
padded to a uniform jit-stable size (compact/sparse grouping yields ragged
batches, reference reconstruction.py:520) contribute weighted means that are
exactly the unpadded values.

Term summary:
  loss_single : NRMSE of DP^p (Gaussian statistics, p=0.5 typical)
  loss_poissn : normalized Poisson NLL of DP^p (low dose, p=1 typical)
  loss_pacbed : NRMSE of batch-averaged DP^p (diffuse background, p=0.2)
  loss_sparse : Ln-norm sparsity of object-phase patches, omode-weighted
  loss_simlar : std across object modes of (blurred/downsampled) patches
"""

from __future__ import annotations

import jax.numpy as jnp

from ptyrad_tpu.ops.blur import gaussian_blur_2d
from ptyrad_tpu.ops.resize import area_downsample

# Per-term parameter defaults match params/schema.py (the reference's file
# defaults) so a partial dict through the direct API behaves like the same
# partial dict through a validated params file. The `state` flags here are
# deliberately conservative (only the primary data term on): loss_params=None
# at the direct API means "plain loss_single", while a params FILE with an
# empty loss_params gets the schema's defaults (which also enable sparse).
DEFAULT_LOSS_PARAMS = {
    "loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5},
    "loss_poissn": {"state": False, "weight": 1.0, "dp_pow": 1.0, "eps": 1e-6},
    "loss_pacbed": {"state": False, "weight": 0.5, "dp_pow": 0.2},
    "loss_sparse": {"state": False, "weight": 0.1, "ln_order": 1},
    "loss_simlar": {
        "state": False,
        "weight": 0.1,
        "obj_type": "both",
        "blur_std": 1.0,
        "scale_factor": [1.0, 1.0],
    },
}


def merge_loss_params(loss_params):
    """Per-term deep merge over DEFAULT_LOSS_PARAMS: a partial term dict
    (e.g. {'loss_sparse': {'state': True}}) inherits the remaining term
    fields instead of replacing the whole term and KeyError-ing later.
    Unknown term names raise (a typo like 'loss_sparce' would otherwise be
    silently dropped and the run would proceed without the term)."""
    user = loss_params or {}
    unknown = set(user) - set(DEFAULT_LOSS_PARAMS)
    if unknown:
        raise ValueError(
            f"Unknown loss term(s) {sorted(unknown)}; "
            f"expected {sorted(DEFAULT_LOSS_PARAMS)}"
        )
    return {
        k: {**DEFAULT_LOSS_PARAMS[k], **(user.get(k) or {})}
        for k in DEFAULT_LOSS_PARAMS
    }


def _bmean(x, mask):
    """Mean over all axes, weighting the batch (first) axis by mask."""
    if mask is None:
        return jnp.mean(x)
    w = mask.reshape(mask.shape[0], *([1] * (x.ndim - 1)))
    per_px = x.shape[0] / jnp.sum(mask)  # renormalize batch weighting
    return jnp.mean(x * w) * per_px


def _bavg_dp(dp, mask):
    """Batch-averaged pattern with mask weighting (PACBED)."""
    if mask is None:
        return jnp.mean(dp, axis=0)
    w = mask.reshape(-1, 1, 1)
    return jnp.sum(dp * w, axis=0) / jnp.sum(mask)


def loss_single(model_dp, measured_dp, params, mask=None):
    """Normalized RMSE of DP^dp_pow (reference losses.py:36-50)."""
    p = params.get("dp_pow", 0.5)
    data_mean = _bmean(measured_dp**p, mask)
    mse = _bmean((model_dp**p - measured_dp**p) ** 2, mask)
    return params["weight"] * jnp.sqrt(mse) / data_mean


def loss_poissn(model_dp, measured_dp, params, mask=None):
    """Normalized Poisson negative log-likelihood (reference losses.py:52-75)."""
    p = params.get("dp_pow", 1.0)
    eps = params.get("eps", 1e-6)
    data_mean = _bmean(measured_dp**p, mask)
    nll = -_bmean(measured_dp**p * jnp.log(model_dp**p + eps) - model_dp**p, mask)
    return params["weight"] * nll / data_mean


def loss_pacbed(model_dp, measured_dp, params, mask=None):
    """NRMSE of position-averaged CBED (reference losses.py:77-89)."""
    p = params.get("dp_pow", 0.2)
    data_mean = _bmean(measured_dp**p, mask)
    mse = jnp.mean((_bavg_dp(model_dp, mask) ** p - _bavg_dp(measured_dp, mask) ** p) ** 2)
    return params["weight"] * jnp.sqrt(mse) / data_mean


def loss_sparse(objp_patches, omode_occu, params, mask=None):
    """omode-weighted Ln sparsity of phase patches (reference losses.py:91-104).

    Per-mode voxel-wise mean of |phi|^n over (batch, z, y, x), then ^(1/n),
    then the omode_occu-weighted sum — invariant to batch/object size/omode.
    """
    n = params["ln_order"]
    absn = jnp.abs(objp_patches) ** n
    if mask is None:
        per_mode = jnp.mean(absn, axis=(0, 2, 3, 4)) ** (1.0 / n)
    else:
        w = mask.reshape(-1, 1, 1, 1, 1)
        per_mode = (
            jnp.sum(absn * w, axis=(0, 2, 3, 4))
            / (jnp.sum(mask) * absn.shape[2] * absn.shape[3] * absn.shape[4])
        ) ** (1.0 / n)
    return params["weight"] * jnp.sum(per_mode * omode_occu)


def loss_simlar(obja_patches, objp_patches, omode_occu, params, mask=None):
    """Cross-omode similarity: std over the omode axis after optional blur and
    area downsample (reference losses.py:106-141)."""
    obj_type = params.get("obj_type", "both")
    blur_std = params.get("blur_std")
    scale = params.get("scale_factor")

    def term(patches):
        if blur_std is not None and blur_std != 0:
            patches = gaussian_blur_2d(patches, kernel_size=5, sigma=blur_std)
        if scale is not None and any(s != 1 for s in scale):
            patches = area_downsample(patches, tuple(scale))
        weighted = patches * omode_occu[:, None, None, None]
        if weighted.shape[1] == 1:
            # a single object mode has no cross-mode variance; the unbiased
            # std would be 0/0 = NaN and silently poison the total loss and
            # every gradient (the reference shares this latent NaN)
            return jnp.float32(0.0)
        # ddof=1: the reference's torch.std is the unbiased estimator
        return _bmean(jnp.std(weighted, axis=1, ddof=1), mask)

    total = jnp.float32(0.0)
    if obj_type in ("amplitude", "both"):
        total = total + term(obja_patches)
    if obj_type in ("phase", "both"):
        total = total + term(objp_patches)
    return params["weight"] * total


def combined_loss(model_dp, measured_dp, obja_patches, objp_patches, omode_occu, loss_params, mask=None):
    """Weighted sum of the five terms. Returns (total, per-term dict).

    Disabled terms ('state': False) contribute exact zeros and compile away.
    `mask` (B,) float weights handle padded batches (0 = padding sample).
    """
    zero = jnp.float32(0.0)
    terms = {}
    cfg = merge_loss_params(loss_params)
    terms["loss_single"] = (
        loss_single(model_dp, measured_dp, cfg["loss_single"], mask) if cfg["loss_single"]["state"] else zero
    )
    terms["loss_poissn"] = (
        loss_poissn(model_dp, measured_dp, cfg["loss_poissn"], mask) if cfg["loss_poissn"]["state"] else zero
    )
    terms["loss_pacbed"] = (
        loss_pacbed(model_dp, measured_dp, cfg["loss_pacbed"], mask) if cfg["loss_pacbed"]["state"] else zero
    )
    terms["loss_sparse"] = (
        loss_sparse(objp_patches, omode_occu, cfg["loss_sparse"], mask) if cfg["loss_sparse"]["state"] else zero
    )
    terms["loss_simlar"] = (
        loss_simlar(obja_patches, objp_patches, omode_occu, cfg["loss_simlar"], mask)
        if cfg["loss_simlar"]["state"]
        else zero
    )
    total = sum(terms.values())
    return total, terms


def objp_contrast(objp, crop_pos, probe_shape, indices=None):
    """Contrast (std/mean) of the z-summed phase inside the scanned region.

    Hypertune objective (reference losses.py:158-175). Host-friendly; operates
    on concrete arrays.
    """
    import numpy as np

    objp_sum = np.asarray(objp).sum(axis=1)  # (omode, Noy, Nox)
    # collapse object modes by mean — the reference's .squeeze() silently
    # leaves a 3D array for omode > 1 and its 2D crop then slices the
    # (omode, Noy) axes (latent bug, reference losses.py:162-170); the
    # metric is only meaningful on a 2D phase map
    objp_sum = objp_sum.mean(axis=0)
    pos = np.asarray(crop_pos)
    if indices is not None:
        pos = pos[np.asarray(indices)]
    center = pos + np.array(probe_shape) // 2
    y0, y1 = center[:, 0].min(), center[:, 0].max()
    x0, x1 = center[:, 1].min(), center[:, 1].max()
    crop = objp_sum[max(y0 - 1, 0):y1, max(x0 - 1, 0):x1]
    lo, hi = crop.min(), crop.max()
    norm = (crop - lo) / (hi - lo) if hi > lo else crop * 0
    return float(np.std(norm) / (np.mean(norm) + 1e-8))
