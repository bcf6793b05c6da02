"""Developer tools: structure printers, NaN checks, smoke helpers, profiling.

Parity with reference src/ptyrad/utils/dev_tools.py (172 LoC) plus
TPU-native additions (jax.profiler tracing; SURVEY.md §5 notes the reference
has only wall-clock timing).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import numpy as np

from ptyrad_tpu.utils.logging import vprint


def print_package_tree(package=None, max_depth: int = 3) -> None:
    """Print the module tree of ptyrad_tpu (reference dev_tools.py:14-74)."""
    import ptyrad_tpu

    package = package or ptyrad_tpu
    root = os.path.dirname(package.__file__)
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in sorted(dirnames) if not d.startswith(("_", "."))]
        depth = dirpath[len(root):].count(os.sep)
        if depth >= max_depth:
            dirnames[:] = []
            continue
        indent = "  " * depth
        vprint(f"{indent}{os.path.basename(dirpath)}/")
        for f in sorted(filenames):
            if f.endswith(".py"):
                vprint(f"{indent}  {f}")


def check_nan_inf(tree, name: str = "tree", raise_on_bad: bool = False) -> bool:
    """NaN/Inf check over an arbitrary pytree (reference dev_tools.py:76-92).
    Returns True when clean."""
    import jax

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) or np.issubdtype(arr.dtype, np.complexfloating):
            n_nan, n_inf = int(np.isnan(arr).sum()), int(np.isinf(arr).sum())
            if n_nan or n_inf:
                bad.append(f"{name}{jax.tree_util.keystr(path)}: {n_nan} NaN, {n_inf} Inf")
    for line in bad:
        vprint(f"WARNING: {line}")
    if bad and raise_on_bad:
        raise FloatingPointError(f"NaN/Inf found in {name}: {bad}")
    return not bad


def print_tree_sizes(tree, name: str = "tree") -> int:
    """Print per-leaf shapes/dtypes/bytes and the total (reference 94-105)."""
    import jax

    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "shape"):
            nbytes = int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize
            total += nbytes
            vprint(f"  {name}{jax.tree_util.keystr(path)}: {tuple(leaf.shape)} {leaf.dtype} {nbytes/1e6:.2f} MB")
    vprint(f"  total: {total/1e6:.2f} MB")
    return total


def check_modes_ortho(modes, atol: float = 1e-4) -> bool:
    """Verify mutual orthogonality of mixed-state modes (reference 107-125).
    Accepts a Cplx or complex ndarray of shape (n, Ny, Nx)."""
    from ptyrad_tpu.ops.cplx import Cplx, to_numpy

    arr = to_numpy(modes) if isinstance(modes, Cplx) else np.asarray(modes)
    flat = arr.reshape(arr.shape[0], -1)
    gram = flat @ flat.conj().T
    off = gram - np.diag(np.diag(gram))
    max_off = float(np.abs(off).max())
    scale = float(np.abs(np.diag(gram)).max())
    ok = max_off < atol * max(scale, 1e-12)
    vprint(f"mode orthogonality: max off-diagonal / max power = {max_off/max(scale,1e-12):.2e} ({'OK' if ok else 'NOT orthogonal'})")
    return ok


def yaml_to_json(yaml_path: str, json_path: Optional[str] = None) -> str:
    """Convert a params YAML to JSON (reference 127-143)."""
    import json

    import yaml

    with open(yaml_path, "r", encoding="utf-8") as f:
        data = yaml.safe_load(f)
    json_path = json_path or os.path.splitext(yaml_path)[0] + ".json"
    with open(json_path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2, default=str)
    return json_path


def test_loss_fn(params, buffers, geom, indices, loss_params=None):
    """Smoke-run the loss terms for a batch and print each value (reference
    dev_tools.py:146-160)."""
    import jax.numpy as jnp

    from ptyrad_tpu.losses import combined_loss
    from ptyrad_tpu.models.forward import forward, get_measurements

    import jax

    idx = jnp.asarray(np.asarray(indices))

    # one jitted program (an eager forward would pay a remote compile per op
    # on tunneled backends — CLAUDE.md)
    @jax.jit
    def run(params, bufs, idx):
        dp, (obja_p, objp_p) = forward(params, bufs, geom, idx)
        meas = get_measurements(bufs, geom, idx)
        return combined_loss(dp, meas, obja_p, objp_p, bufs.omode_occu, loss_params)

    total, terms = run(params, buffers, idx)
    for name, val in terms.items():
        vprint(f"  {name}: {float(val):.6f}")
    vprint(f"  total: {float(total):.6f}")
    return float(total), {k: float(v) for k, v in terms.items()}


def test_constraint_fn(params, buffers, geom, constraint_params):
    """Apply constraints once to a copy of the params and report what changed
    (reference dev_tools.py:162-173)."""
    import jax

    from ptyrad_tpu.constraints import ConstraintScheduler

    sched = ConstraintScheduler(constraint_params, geom)
    before = jax.tree_util.tree_map(np.asarray, params)
    # LCM of the active frequencies: niter=max(freqs) skips any constraint
    # whose freq does not divide the max (gate is niter % freq == 0) and
    # would misreport it as a no-op
    freqs = [f for _, f, _ in sched._active] or [1]
    niter = int(np.lcm.reduce(np.asarray(freqs, dtype=np.int64)))
    after_params = sched(params, buffers, niter=niter)
    after = jax.tree_util.tree_map(np.asarray, after_params)
    for (path, b), (_, a) in zip(
        jax.tree_util.tree_flatten_with_path(before)[0],
        jax.tree_util.tree_flatten_with_path(after)[0],
    ):
        delta = float(np.abs(np.asarray(a) - np.asarray(b)).max()) if np.size(b) else 0.0
        vprint(f"  params{jax.tree_util.keystr(path)}: max |delta| = {delta:.3e}")
    return after_params


# ---------------------------------------------------------------------------
# Timing / profiling (TPU-native additions)
# ---------------------------------------------------------------------------

def time_sync(*arrays) -> float:
    """Device-synchronized perf counter (reference utils/common.py:553-567).

    Blocks on the given arrays (or all live device computation is assumed
    flushed) before reading the clock. NOTE: on some tunneled backends
    block_until_ready returns at enqueue; pass arrays to force a real fetch.
    """
    import jax

    for arr in arrays:
        leaves = jax.tree_util.tree_leaves(arr)
        for leaf in leaves:
            if hasattr(leaf, "addressable_shards"):
                np.asarray(leaf.addressable_shards[0].data.ravel()[:1])
            elif hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
    return time.perf_counter()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ptyrad_tpu_trace"):
    """jax.profiler trace context: view with TensorBoard or xprof.

    Usage: `with trace("/tmp/tr"): solver.run()`
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        vprint(f"Profiler trace written to {log_dir}")
