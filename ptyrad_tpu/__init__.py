"""ptyrad_tpu: TPU-native ptychographic reconstruction with automatic differentiation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of PtyRAD
(reference: /root/reference, wdwzyyg/ptyrad v0.1.0b9): differentiable mixed-state
multislice ptychography reconstructing a complex object, mixed-state probe,
sub-pixel scan positions, position-dependent crystal tilts, and slice thickness
from 4D-STEM / X-ray diffraction data.

Design: a functional core (parameter pytree + pure forward/loss/constraint
functions compiled with jax.jit), data parallelism over diffraction patterns via
jax.sharding.Mesh + shard_map with psum gradient reduction, and MXU-targeted
DFT-by-matmul kernels for the small 2D FFTs that dominate the hot loop.
"""

__version__ = "0.1.0"

from ptyrad_tpu.models.state import PtychoParams, Buffers, Geometry  # noqa: F401


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing heavy deps at package load)."""
    if name == "Initializer":
        from ptyrad_tpu.initialization import Initializer

        return Initializer
    if name == "PtyRADSolver":
        from ptyrad_tpu.engine.solver import PtyRADSolver

        return PtyRADSolver
    if name == "load_params":
        from ptyrad_tpu.load import load_params

        return load_params
    raise AttributeError(f"module 'ptyrad_tpu' has no attribute '{name}'")
