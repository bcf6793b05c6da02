"""Native (C) runtime components, built on demand with graceful fallback.

`load_fastraw()` returns the compiled fastraw extension module, building it
with the system compiler on first use (cached in the package directory).
Callers must fall back to the pure-NumPy path when it returns None — the
framework never hard-requires a working toolchain at runtime.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
from typing import Optional

_CACHED = None
_TRIED = False


def _build_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "_build")


def load_fastraw() -> Optional[object]:
    """Import (building if needed) the fastraw C extension, or None."""
    global _CACHED, _TRIED
    if _TRIED:
        return _CACHED
    _TRIED = True
    try:
        import importlib.util

        build = _build_dir()
        suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
        so_path = os.path.join(build, f"fastraw{suffix}")
        src = os.path.join(os.path.dirname(__file__), "fastraw.c")
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
            os.makedirs(build, exist_ok=True)
            include = sysconfig.get_paths()["include"]
            cc = os.environ.get("CC", "cc")
            # compile to a per-process temp name and os.replace (atomic):
            # writing the final path directly means an interrupted or
            # concurrent build leaves a fresh-mtime corrupt .so that
            # permanently disables the fast path
            tmp_path = f"{so_path}.{os.getpid()}.tmp"
            try:
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", "-pthread",
                     f"-I{include}", src, "-o", tmp_path],
                    check=True, capture_output=True,
                )
                os.replace(tmp_path, so_path)
            finally:
                if os.path.exists(tmp_path):
                    os.remove(tmp_path)
        spec = importlib.util.spec_from_file_location("ptyrad_tpu.native.fastraw", so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _CACHED = mod
    except Exception:  # noqa: BLE001 — any failure means "use the NumPy path"
        _CACHED = None
    return _CACHED
