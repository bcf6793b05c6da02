from ptyrad_tpu.engine.batching import make_batches, pad_batches, select_scan_indices
from ptyrad_tpu.engine.solver import PtyRADSolver, build_train_step, recon_loop, recon_step

__all__ = [
    "select_scan_indices",
    "make_batches",
    "pad_batches",
    "PtyRADSolver",
    "build_train_step",
    "recon_step",
    "recon_loop",
]
