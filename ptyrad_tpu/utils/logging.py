"""Process-0-aware logging (reference src/ptyrad/utils/common.py:93-210,424-431).

`vprint` prints only on JAX process 0 (multi-host runs log once); it routes
through the named logger when `CustomLogger` has installed handlers, else
plain print. `CustomLogger` buffers log records in memory until the run's
output directory exists, then flushes to a file there — so logs that predate
folder creation are not lost.
"""

from __future__ import annotations

import io
import logging
import os
import sys
from datetime import datetime
from typing import Optional

_LOGGER_NAME = "ptyrad_tpu"


def _is_main_process() -> bool:
    """True on JAX process 0 — WITHOUT triggering backend initialization.

    jax.process_index() initializes the platform on first call; a pure log
    statement must never block on (or crash with) an unreachable TPU
    tunnel. Until some real computation has brought a backend up, every
    process is by definition single-process, so printing is correct.
    """
    try:
        import jax
        from jax._src import xla_bridge

        if xla_bridge._backends:  # backend already up: authoritative
            return jax.process_index() == 0
        # No backend yet: don't create one. Multi-host launches initialize
        # jax.distributed BEFORE any backend exists (cli --multihost), and
        # its process_id is readable without platform init — so startup
        # logs stay rank-0-gated instead of printing on every host.
        from jax._src import distributed

        pid = distributed.global_state.process_id
        return pid is None or pid == 0
    except Exception:
        return True


def vprint(*args, verbose: bool = True, **kwargs) -> None:
    """Verbosity- and rank-gated print.

    Once CustomLogger has installed handlers, output goes through logging:
    `sep` is honored, but `end`/`file`/`flush` cannot map onto a log record
    (every call becomes one line) and are dropped."""
    if not verbose or not _is_main_process():
        return
    logger = logging.getLogger(_LOGGER_NAME)
    if logger.handlers:
        sep = kwargs.get("sep", " ")
        logger.info(sep.join(str(a) for a in args))
    else:
        print(*args, **kwargs)


class CustomLogger:
    """Buffered file+console logger that flushes to the output dir when known.

    Args mirror the reference: log_file name, file mode, optional time/jobid
    prefixes, show_timestamp.
    """

    def __init__(
        self,
        log_file: str = "ptyrad_log.txt",
        log_dir: str = "auto",
        prefix_date: bool = True,
        prefix_jobid: str = "",
        append_to_file: bool = True,
        show_timestamp: bool = True,
    ):
        self.log_file = log_file
        self.log_dir = log_dir
        self.prefix_date = prefix_date
        self.prefix_jobid = str(prefix_jobid or "")
        self.append_to_file = append_to_file
        self.show_timestamp = show_timestamp

        self.logger = logging.getLogger(_LOGGER_NAME)
        self.logger.setLevel(logging.INFO)
        self.logger.handlers.clear()
        self.logger.propagate = False

        fmt = logging.Formatter(
            "%(asctime)s | %(message)s" if show_timestamp else "%(message)s",
            datefmt="%Y-%m-%d %H:%M:%S",
        )
        console = logging.StreamHandler(sys.stdout)
        console.setFormatter(fmt)
        self.logger.addHandler(console)

        # In-memory buffer until the output dir exists
        self._buffer = io.StringIO()
        self._buffer_handler = logging.StreamHandler(self._buffer)
        self._buffer_handler.setFormatter(fmt)
        self.logger.addHandler(self._buffer_handler)
        self._file_handler: Optional[logging.FileHandler] = None

    def _file_name(self) -> str:
        name = self.log_file
        if self.prefix_jobid:
            name = f"{self.prefix_jobid}_{name}"
        if self.prefix_date:
            name = f"{datetime.now().strftime('%Y%m%d')}_{name}"
        return name

    def flush_to_dir(self, output_dir: str) -> None:
        """Write everything buffered so far into output_dir and keep logging
        there (reference CustomLogger flush semantics)."""
        if not _is_main_process():
            return
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.join(output_dir, self._file_name())
        mode = "a" if self.append_to_file else "w"
        with open(path, mode) as f:
            f.write(self._buffer.getvalue())
        # truncate the buffer (reference common.py:191-192) and detach any
        # previous file handler: a second flush (e.g. one per hypertune
        # trial) must not replay pre-flush logs into the new file or keep
        # mirroring lines into the previous trial's file
        self._buffer.truncate(0)
        self._buffer.seek(0)
        if self._file_handler is not None:
            self.logger.removeHandler(self._file_handler)
            self._file_handler.close()
        fmt = self._buffer_handler.formatter
        self._file_handler = logging.FileHandler(path, mode="a")
        self._file_handler.setFormatter(fmt)
        self.logger.addHandler(self._file_handler)

    def close(self) -> None:
        for h in list(self.logger.handlers):
            h.close()
            self.logger.removeHandler(h)
