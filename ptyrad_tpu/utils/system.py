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


def print_device_info(timeout_s: float = 60.0) -> None:
    """Device report, bounded: backend init on tunneled TPU backends can
    HANG indefinitely (not error) when the chip is unreachable, so detection
    runs in a daemon thread and `check-tpu` always returns with a diagnosis
    instead of freezing the terminal."""
    import threading

    result: dict = {}

    def probe():
        try:
            import jax

            devices = jax.devices()
            result["lines"] = [
                f"  jax backend     : {jax.default_backend()}",
                f"  device count    : {len(devices)}",
                *[f"    {d}" for d in devices],
                f"  process index   : {jax.process_index()} / {jax.process_count()}",
            ]
        except Exception as e:  # noqa: BLE001 - report rather than crash the CLI
            result["error"] = str(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        vprint(
            f"  device detection TIMED OUT after {timeout_s:.0f}s: backend "
            "initialization is hanging, which on tunneled TPU backends means "
            "the chip is unreachable or saturated. Retry later; host-side "
            "commands (validate-params, export-meas-init) still work."
        )
    elif "error" in result:
        vprint(f"  device detection failed: {result['error']}")
    else:
        for line in result["lines"]:
            vprint(line)


def ensure_backend_alive(timeout_s: float = 180.0) -> None:
    """Fail fast with a diagnosis if backend init HANGS (dead or saturated
    tunnel chip) instead of freezing the run forever. The hang sits in
    native code where signals are never delivered, so the probe runs in a
    daemon thread — the same defense as check-tpu and bench.py. Only for
    single-process runs: under multihost, jax.devices() legitimately blocks
    until every rank joins the coordination service."""
    import threading

    done = threading.Event()

    def probe():
        try:
            import jax

            jax.devices()
        except Exception:  # noqa: BLE001 — the real run will re-raise it with context
            pass
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        raise RuntimeError(
            f"JAX backend initialization is hanging (> {timeout_s:.0f}s): the "
            "TPU chip is unreachable or saturated. Run 'ptyrad-tpu check-tpu' "
            "to diagnose; host-side commands (validate-params, "
            "export-meas-init) still work. Retry when the chip recovers."
        )


def resolve_devices(n_devices: Optional[int]):
    """Build a data mesh over n devices (None/1 -> single-device, no mesh)."""
    if n_devices is None or n_devices <= 1:
        return None
    from ptyrad_tpu.parallel.mesh import make_mesh

    return make_mesh(n_devices)
