"""Process-level kernel-mesh registry.

The Pallas kernels (ops/pallas_multislice.py, ops/patches.py) carry no GSPMD
partitioning rules, so inside a jitted SPMD program XLA would all-gather their
sharded operands around the kernel call. Registering the active data-parallel
mesh here lets those kernels wrap themselves in `jax.shard_map` over the
'data' axis instead: each shard runs the kernel on its local batch block and
the shared-parameter cotangents (probe, propagator, object canvas) are
`psum`-reduced over ICI — the same collective DDP's gradient allreduce rides
(reference runs its fused CUDA ops per-rank the same way,
src/ptyrad/reconstruction.py:115-141).

Kept in a leaf module (no intra-package imports) so both ops modules and
parallel/mesh.py can use it without cycles. The solver registers its mesh in
`PtyRADSolver._build`; `None` (the default) means single-device dispatch.
"""

from __future__ import annotations

from typing import Optional

DATA_AXIS = "data"

_KERNEL_MESH = None


def set_kernel_mesh(mesh) -> None:
    """Register the data-parallel mesh the Pallas kernels should shard over
    (or None to restore single-device dispatch). Size-1 meshes are treated as
    single-device."""
    global _KERNEL_MESH
    if mesh is not None and mesh.devices.size <= 1:
        mesh = None
    _KERNEL_MESH = mesh


def get_kernel_mesh():
    return _KERNEL_MESH


def kernel_mesh_size() -> int:
    """Number of shards the kernels split the batch over (1 = no mesh)."""
    return 1 if _KERNEL_MESH is None else int(_KERNEL_MESH.devices.size)
