"""Misc host utilities: time strings, filename safety, tree converters.

Parity with reference src/ptyrad/utils/common.py:511-826 (get_time,
safe_filename, tensors<->ndarrays).
"""

from __future__ import annotations

import os
import re
import sys
from datetime import datetime

import numpy as np


def get_time(fmt="%Y%m%d") -> str:
    """Formatted local time string; True maps to date-only; False/None/''
    disable the timestamp and return '' (reference 511-551)."""
    if not fmt:
        return ""
    if fmt is True or fmt == "date":
        fmt = "%Y%m%d"
    elif fmt == "time":
        fmt = "%H%M%S"
    elif fmt == "datetime":
        fmt = "%Y%m%d_%H%M%S"
    return datetime.now().strftime(fmt)


_WINDOWS_FORBIDDEN = r'[<>:"|?*]'


def safe_filename(path: str, max_len: int = 255) -> str:
    """Sanitize a path for cross-platform use (reference 597-685): strips
    characters Windows forbids and truncates over-long basenames while
    keeping the extension."""
    directory, base = os.path.split(path)
    if sys.platform.startswith("win"):
        base = re.sub(_WINDOWS_FORBIDDEN, "_", base)
    if len(base) > max_len:
        stem, ext = os.path.splitext(base)
        base = stem[: max_len - len(ext)] + ext
    return os.path.join(directory, base)


def trees_to_ndarrays(tree):
    """Convert all array-likes in a nested structure to numpy (reference
    tensors_to_ndarrays, 778-826)."""
    from ptyrad_tpu.ops.cplx import Cplx, to_numpy

    if isinstance(tree, Cplx):
        return to_numpy(tree)
    if isinstance(tree, dict):
        return {k: trees_to_ndarrays(v) for k, v in tree.items()}
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # NamedTuple
        return type(tree)(*(trees_to_ndarrays(v) for v in tree))
    if isinstance(tree, (list, tuple)):
        return type(tree)(trees_to_ndarrays(v) for v in tree)
    if hasattr(tree, "__array__") and not isinstance(tree, np.ndarray):
        return np.asarray(tree)
    return tree
