"""Iteration-wise constraints as pure `params -> params` projections.

Functional re-design of reference src/ptyrad/constraints.py:14-359
(CombinedConstraint): the reference mutates tensors in-place under no_grad;
here each constraint is a pure jitted function returning an updated parameter
pytree, scheduled by `ConstraintScheduler` at iteration frequencies. The
application order matches the reference (probe constraints, then object
constraints, then tilt smoothing) — order matters.

TPU notes:
  - Probe-mode orthogonalization uses jnp.linalg.eigh on the pmode x pmode
    Hermitian Gram matrix A = M M^H (the reference's torch.linalg.eig at
    constraints.py:282 acts on the same Hermitian PSD matrix; eigh is the
    TPU-friendly equivalent).
  - The data-dependent mode-count cutoff of probe_mask_k becomes a boolean
    mask (no dynamic shapes under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

from ptyrad_tpu.models.state import Buffers, Geometry, PtychoParams
from ptyrad_tpu.ops import cplx
from ptyrad_tpu.ops.blur import gaussian_blur_1d, gaussian_blur_2d
from ptyrad_tpu.ops.cplx import Cplx
from ptyrad_tpu.ops.fourier import fft2, fftn3, fftshift2, ifft2, ifftshift2
from ptyrad_tpu.ops.masks import make_sigmoid_mask

DEFAULT_CONSTRAINT_PARAMS = {
    "ortho_pmode": {"freq": None},
    "probe_mask_k": {"freq": None, "radius": 0.22, "width": 0.05, "power_thresh": 0.95},
    "fix_probe_int": {"freq": None},
    "obj_rblur": {"freq": None, "obj_type": "both", "kernel_size": 5, "std": 0.5},
    "obj_zblur": {"freq": None, "obj_type": "both", "kernel_size": 5, "std": 1.0},
    "kr_filter": {"freq": None, "obj_type": "both", "radius": 0.15, "width": 0.05},
    "kz_filter": {"freq": None, "obj_type": "both", "beta": 1.0, "alpha": 1.0},
    "complex_ratio": {"freq": None, "obj_type": "both", "alpha1": 1.0, "alpha2": 0.0},
    "mirrored_amp": {"freq": None, "relax": 0.1, "scale": 0.03, "power": 4.0},
    "obja_thresh": {"freq": None, "relax": 0.0, "thresh": (0.98, 1.02)},
    "objp_postiv": {"freq": None, "relax": 0.0, "mode": "clip_neg"},
    "tilt_smooth": {"freq": None, "std": 2.0},
}


# ---------------------------------------------------------------------------
# Mode helpers
# ---------------------------------------------------------------------------

def sort_by_mode_intensity(modes: Cplx) -> Cplx:
    """Sort leading mode axis by descending total intensity."""
    power = jnp.sum(modes.abs2(), axis=tuple(range(1, modes.ndim)))
    order = jnp.argsort(-power)
    return modes[order]


def orthogonalize_modes(modes: Cplx, sort: bool = True) -> Cplx:
    """Orthogonalize incoherent modes via the Hermitian Gram-matrix eigenbasis.

    modes: Cplx (n, Ny, Nx). A = M M^H is Hermitian PSD; its eigendecomposition
    runs complex-free through the real symmetric embedding (ops/cplx.eigh).
    Projected modes evecs^H @ M are mutually orthogonal and preserve total
    intensity (equivalent to PtychoShelves probe_modes_ortho; reference
    constraints.py:255-291, which uses torch.linalg.eig on the same Hermitian
    matrix).
    """
    n = modes.shape[0]
    flat = modes.reshape(n, -1)
    flat_h = Cplx(flat.re.T, -flat.im.T)           # M^H
    gram = cplx.matmul(flat, flat_h)               # (n, n) Hermitian PSD
    _, evecs = cplx.eigh(gram)
    evecs_h = Cplx(evecs.re.T, -evecs.im.T)        # rows = conj eigenvectors
    ortho = cplx.matmul(evecs_h, flat).reshape(*modes.shape)
    if sort:
        ortho = sort_by_mode_intensity(ortho)
    return ortho


# ---------------------------------------------------------------------------
# Filters (used by constraints and exposed for tests)
# ---------------------------------------------------------------------------

def kr_filter_fn(obj: jnp.ndarray, radius: float, width: float) -> jnp.ndarray:
    """Lateral Fourier low-pass with a sigmoid cutoff (reference
    constraints.py:293-304). Applies to the last two axes; leading axes
    (omode, z) broadcast."""
    ny, nx = obj.shape[-2:]
    mask = make_sigmoid_mask(min(ny, nx), radius, width)
    if (ny, nx) != mask.shape:
        # nearest with torch's FLOOR source mapping (src = dst*S//D), not
        # jax.image.resize's half-pixel centers: the reference's
        # F.interpolate default (constraints.py:299) selects different
        # source pixels in the transition band on rectangular canvases
        sy, sx = mask.shape
        iy = (jnp.arange(ny) * sy) // ny
        ix = (jnp.arange(nx) * sx) // nx
        mask = mask[iy][:, ix]
    w = ifftshift2(mask)
    return ifft2(fft2(obj) * w).re.astype(obj.dtype)


def kz_filter_fn(
    obj: jnp.ndarray, beta: float = 1.0, alpha: float = 1.0, obj_type: str = "phase"
) -> jnp.ndarray:
    """Missing-wedge arctan kz filter (PtychoShelves-style; reference
    constraints.py:306-331).

    W = 1 - atan((beta*|kz| / sqrt(kx^2+ky^2+1e-3))^2) / (pi/2), multiplied by
    a lateral Gaussian exp(-alpha*(kx^2+ky^2)). For amplitude, the filtered
    object is pulled softly toward 1 (fobj -> 1 + 0.9*(fobj-1))."""
    nz, ny, nx = obj.shape[-3:]
    kz = jnp.fft.fftfreq(nz).astype(jnp.float32)
    ky = jnp.fft.fftfreq(ny).astype(jnp.float32)
    kx = jnp.fft.fftfreq(nx).astype(jnp.float32)
    gz, gy, gx = jnp.meshgrid(kz, ky, kx, indexing="ij")
    w = 1.0 - jnp.arctan((beta * jnp.abs(gz) / jnp.sqrt(gx**2 + gy**2 + 1e-3)) ** 2) / (jnp.pi / 2)
    wa = w * jnp.exp(-alpha * (gx**2 + gy**2))
    spec = fftn3(obj)
    fobj = fftn3(spec * wa, inverse=True).re.astype(obj.dtype)
    if obj_type == "amplitude":
        fobj = 1.0 + 0.9 * (fobj - 1.0)
    return fobj


def complex_ratio_fn(obja: jnp.ndarray, objp: jnp.ndarray, alpha1: float, alpha2: float):
    """Amplitude<->phase coupling constraint (reference constraints.py:333-359;
    after Gao et al., sign convention for positive-phase transmission).

    Cbar = sum|log a| / sum|phi|;  a' = exp((1-a1)*log a - a1*Cbar*phi);
    phi' = (1-a2)*phi - a2/Cbar * log a.
    """
    log_a = jnp.log(obja)
    cbar = jnp.sum(jnp.abs(log_a)) / (jnp.sum(jnp.abs(objp)) + 1e-8)
    obja_c = jnp.exp((1.0 - alpha1) * log_a - alpha1 * cbar * objp)
    objp_c = (1.0 - alpha2) * objp - alpha2 / (cbar + 1e-8) * log_a
    return obja_c, objp_c, cbar


# ---------------------------------------------------------------------------
# Individual constraints: (params, buffers) -> params
# ---------------------------------------------------------------------------

def _apply_obj(params: PtychoParams, obj_type: str, fn) -> PtychoParams:
    obja, objp = params.obja, params.objp
    if obj_type in ("amplitude", "both"):
        obja = fn(obja)
    if obj_type in ("phase", "both"):
        objp = fn(objp)
    return dataclasses.replace(params, obja=obja, objp=objp)


def ortho_pmode(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    return dataclasses.replace(params, probe=orthogonalize_modes(params.probe, sort=True))


def probe_mask_k(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    """Sigmoid k-space mask applied to the strongest modes.

    The reference (constraints.py:43-68) masks modes [0..i] where i is the
    first index whose cumulative power exceeds power_thresh; expressed here as
    the static-shape boolean mask {mode 0} ∪ {i : cumsum[i-1] <= thresh}.
    """
    probe = params.probe
    npix = probe.shape[-1]
    power = jnp.sum(probe.abs2(), axis=(-2, -1))
    frac = power / jnp.sum(power)
    csum = jnp.cumsum(frac)
    masked = jnp.concatenate([jnp.array([True]), csum[:-1] <= cfg["power_thresh"]])
    mask2d = make_sigmoid_mask(npix, cfg["radius"], cfg["width"])
    probe_k = fftshift2(fft2(ifftshift2(probe), norm="ortho"))
    probe_masked = fftshift2(ifft2(ifftshift2(probe_k * mask2d), norm="ortho"))
    new_probe = cplx.where(masked[:, None, None], probe_masked, probe)
    return dataclasses.replace(params, probe=sort_by_mode_intensity(new_probe))


def fix_probe_int(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    """Rescale probe to its initial total intensity (reference 70-81)."""
    current = jnp.sqrt(jnp.sum(params.probe.abs2()))
    target = jnp.sqrt(buffers.probe_int_sum)
    return dataclasses.replace(params, probe=params.probe * (target / current))


def obj_rblur(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    if cfg["std"] == 0:
        return params
    return _apply_obj(
        params, cfg["obj_type"],
        lambda o: gaussian_blur_2d(o, kernel_size=cfg["kernel_size"], sigma=cfg["std"]),
    )


def obj_zblur(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    """Gaussian blur along z (axis 1 of (omode, Nz, Ny, Nx)); replicate pad."""
    if cfg["std"] == 0:
        return params

    def blur_z(o):
        moved = jnp.moveaxis(o, 1, -1)
        blurred = gaussian_blur_1d(moved, kernel_size=cfg["kernel_size"], sigma=cfg["std"])
        return jnp.moveaxis(blurred, -1, 1)

    return _apply_obj(params, cfg["obj_type"], blur_z)


def kr_filter(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    return _apply_obj(
        params, cfg["obj_type"], lambda o: kr_filter_fn(o, cfg["radius"], cfg["width"])
    )


def kz_filter(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    obja, objp = params.obja, params.objp
    if cfg["obj_type"] in ("amplitude", "both"):
        obja = kz_filter_fn(obja, cfg["beta"], cfg["alpha"], obj_type="amplitude")
    if cfg["obj_type"] in ("phase", "both"):
        objp = kz_filter_fn(objp, cfg["beta"], cfg["alpha"], obj_type="phase")
    return dataclasses.replace(params, obja=obja, objp=objp)


def complex_ratio(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    obja_c, objp_c, _ = complex_ratio_fn(params.obja, params.objp, cfg["alpha1"], cfg["alpha2"])
    obja = obja_c if cfg["obj_type"] in ("amplitude", "both") else params.obja
    objp = objp_c if cfg["obj_type"] in ("phase", "both") else params.objp
    return dataclasses.replace(params, obja=obja, objp=objp)


def mirrored_amp(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    """a' = relax*a + (1-relax)*(1 - scale*clamp(phi,0)^power) (reference 165-179)."""
    v_pow = jnp.clip(params.objp, 0.0, None) ** cfg["power"]
    amp_new = 1.0 - cfg["scale"] * v_pow
    obja = cfg["relax"] * params.obja + (1.0 - cfg["relax"]) * amp_new
    return dataclasses.replace(params, obja=obja)


def obja_thresh(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    lo, hi = cfg["thresh"]
    clamped = jnp.clip(params.obja, lo, hi)
    obja = cfg["relax"] * params.obja + (1.0 - cfg["relax"]) * clamped
    return dataclasses.replace(params, obja=obja)


def objp_postiv(params: PtychoParams, buffers: Buffers, cfg: dict) -> PtychoParams:
    if cfg.get("mode", "clip_neg") == "subtract_min":
        modified = params.objp - jnp.min(params.objp)
    else:
        modified = jnp.clip(params.objp, 0.0, None)
    objp = cfg["relax"] * params.objp + (1.0 - cfg["relax"]) * modified
    return dataclasses.replace(params, objp=objp)


def tilt_smooth(params: PtychoParams, buffers: Buffers, cfg: dict, n_slow: int = 1, n_fast: int = 1) -> PtychoParams:
    """Gaussian blur of per-position tilts over the scan grid (reference 210-225).
    Requires tilt_type 'each' ((N,2) tilts); no-op for global tilts."""
    if params.obj_tilts.shape[0] == 1 or cfg["std"] == 0:
        return params
    grid = params.obj_tilts.reshape(n_slow, n_fast, 2)
    grid = jnp.moveaxis(grid, -1, 0)  # (2, slow, fast)
    blurred = gaussian_blur_2d(grid, kernel_size=5, sigma=cfg["std"])
    tilts = jnp.moveaxis(blurred, 0, -1).reshape(-1, 2)
    return dataclasses.replace(params, obj_tilts=tilts)


# Reference application order (constraints.py:227-246)
_ORDER: Tuple[str, ...] = (
    "ortho_pmode",
    "probe_mask_k",
    "fix_probe_int",
    "obj_rblur",
    "obj_zblur",
    "kr_filter",
    "kz_filter",
    "complex_ratio",
    "mirrored_amp",
    "obja_thresh",
    "objp_postiv",
    "tilt_smooth",
)

_FNS: dict[str, Callable] = {
    "ortho_pmode": ortho_pmode,
    "probe_mask_k": probe_mask_k,
    "fix_probe_int": fix_probe_int,
    "obj_rblur": obj_rblur,
    "obj_zblur": obj_zblur,
    "kr_filter": kr_filter,
    "kz_filter": kz_filter,
    "complex_ratio": complex_ratio,
    "mirrored_amp": mirrored_amp,
    "obja_thresh": obja_thresh,
    "objp_postiv": objp_postiv,
    "tilt_smooth": tilt_smooth,
}


class ConstraintScheduler:
    """Applies due constraints each iteration, in the reference order.

    ONE jitted program serves every iteration: constraints whose freq is 1
    run unconditionally; mixed-frequency constraints are gated in-program by
    `lax.cond` on the (traced) iteration counter. On this backend every
    distinct compiled program is a multi-second remote-compile lottery, so a
    per-due-set cache (up to 2^k programs for k distinct freqs) would pay it
    repeatedly; the conditioned composite pays it once. Iterations where
    NOTHING is due still short-circuit host-side (no dispatch at all).
    """

    def __init__(self, constraint_params: dict | None, geom: Geometry, verbose: bool = False):
        cfg = {k: {**v} for k, v in DEFAULT_CONSTRAINT_PARAMS.items()}
        for key, val in (constraint_params or {}).items():
            if key not in cfg:
                raise ValueError(f"Unknown constraint '{key}'")
            val = val or {}
            # the pydantic schema guards the params-file path only; direct-API
            # typos ('raduis') would otherwise be merged and silently ignored
            bad = set(val) - set(cfg[key])
            if bad:
                raise ValueError(
                    f"Unknown option(s) {sorted(bad)} for constraint '{key}'; "
                    f"expected {sorted(cfg[key])}"
                )
            cfg[key].update(val)
        self.cfg = cfg
        self.verbose = verbose
        self._active: List[Tuple[str, int, Callable]] = []
        for name in _ORDER:
            freq = cfg[name].get("freq")
            if freq is None:
                continue
            if int(freq) < 1:
                raise ValueError(
                    f"Constraint '{name}' freq must be >= 1 (got {freq}); "
                    "use freq=None to disable it"
                )
            fn = _FNS[name]
            c = dict(cfg[name])
            c.pop("freq")
            if name == "tilt_smooth":
                bound = lambda p, b, fn=fn, c=c: fn(p, b, c, geom.n_scan_slow, geom.n_scan_fast)
            else:
                bound = lambda p, b, fn=fn, c=c: fn(p, b, c)
            self._active.append((name, int(freq), bound))
        self._jitted: Callable | None = None

    def apply_traced(self, params: PtychoParams, buffers: Buffers, niter) -> PtychoParams:
        """The due-constraint application as traceable code, for use INSIDE
        an enclosing jitted program (e.g. the canvas-sharded bridge, which
        wraps it in an all-gather/re-shard sandwich). `niter` is a traced
        int32; mixed-frequency constraints gate via lax.cond exactly as in
        the standalone composite."""
        for _name, freq, fn in self._active:
            if freq == 1:
                params = fn(params, buffers)
            else:
                params = jax.lax.cond(
                    niter % freq == 0,
                    lambda p, b, fn=fn: fn(p, b),
                    lambda p, b: p,
                    params, buffers,
                )
        return params

    def _composite(self) -> Callable:
        if self._jitted is None:
            self._jitted = jax.jit(self.apply_traced)
        return self._jitted

    def due(self, niter: int) -> bool:
        """Is any constraint due at this iteration? (Callers that must pay a
        layout bridge before applying — e.g. the canvas-sharded solver path —
        check this first to skip the bridge on idle iterations.)"""
        return any(niter % freq == 0 for _, freq, _ in self._active)

    def __call__(self, params: PtychoParams, buffers: Buffers, niter: int) -> PtychoParams:
        if not self.due(niter):
            return params
        if self.verbose:
            from ptyrad_tpu.utils.logging import vprint

            due = [n for n, freq, _ in self._active if niter % freq == 0]
            vprint(f"iter {niter}: applying constraints {due}")
        return self._composite()(params, buffers, jnp.asarray(niter, jnp.int32))

    @property
    def active_names(self) -> List[str]:
        return [name for name, _, _ in self._active]
