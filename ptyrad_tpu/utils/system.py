"""System / device introspection (reference src/ptyrad/utils/common.py:212-422).

Replaces CUDA/MPS/MIG handling with JAX backend detection; `resolve_devices`
builds the data-parallel mesh when more than one device is requested.
"""

from __future__ import annotations

import platform
import sys
from typing import Optional

from ptyrad_tpu.utils.logging import vprint


def print_system_info() -> None:
    vprint("### System information ###")
    vprint(f"  platform        : {platform.platform()}")
    vprint(f"  python          : {sys.version.split()[0]}")
    for pkg in ("jax", "optax", "numpy", "scipy", "h5py", "pydantic"):
        try:
            mod = __import__(pkg)
            vprint(f"  {pkg:16s}: {getattr(mod, '__version__', '?')}")
        except ImportError:
            vprint(f"  {pkg:16s}: not installed")
    print_device_info()
    import os

    for var in ("SLURM_JOB_ID", "SLURM_NTASKS", "SLURM_GPUS_ON_NODE", "JAX_PLATFORMS", "XLA_FLAGS"):
        if os.environ.get(var):
            vprint(f"  env {var} = {os.environ[var]}")
    vprint(" ")


def print_device_info() -> None:
    try:
        import jax

        devices = jax.devices()
        vprint(f"  jax backend     : {jax.default_backend()}")
        vprint(f"  device count    : {len(devices)}")
        for d in devices:
            vprint(f"    {d}")
        vprint(f"  process index   : {jax.process_index()} / {jax.process_count()}")
    except Exception as e:  # noqa: BLE001 - report rather than crash the CLI
        vprint(f"  device detection failed: {e}")


def resolve_devices(n_devices: Optional[int]):
    """Build a data mesh over n devices (None/1 -> single-device, no mesh)."""
    if n_devices is None or n_devices <= 1:
        return None
    from ptyrad_tpu.parallel.mesh import make_mesh

    return make_mesh(n_devices)
