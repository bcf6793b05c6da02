"""Device mesh and sharding for data-parallel reconstruction.

TPU-native equivalent of the reference's DDP-over-NCCL (SURVEY.md §2.9;
reference utils/common.py:58-90, reconstruction.py:115-141): a 1D
jax.sharding.Mesh over the 'data' axis shards the diffraction-pattern batch
(and optionally the measurement store) across chips, while the parameter
pytree stays replicated. Gradients reduce across the mesh inside the jitted
step — XLA's SPMD partitioner inserts the psum over ICI where the loss means
over the sharded batch axis, which is exactly DDP's allreduce, minus the
reference's complex-tensor workaround and MIG restrictions.

Beyond the reference: `shard_model(..., shard_measurements=True)` splits the
measurement array itself over the mesh (the reference keeps the entire 4D
dataset resident on every GPU, models.py:109 — its memory ceiling).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ptyrad_tpu.models.state import Buffers, PtychoParams

DATA_AXIS = "data"


@functools.partial(jax.jit, static_argnums=1)
def _pad_store(m, pad: int):
    """Device-side zero-pad of the measurement store's scan axis — one
    cached program per pad per process (a fresh traced pad per shard_model
    call would re-pay the remote compile, e.g. across hypertune trials)."""
    import jax.numpy as jnp

    return jnp.pad(m, ((0, pad), (0, 0), (0, 0)))


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1D mesh over the batch ('data') axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding."""
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """device_put that also works in multi-process (multi-host) runs.

    In a single-process run this is jax.device_put. With
    jax.process_count() > 1 a plain device_put cannot address other
    processes' devices, so the global array is assembled from per-process
    callbacks instead (every process holds the full host value — true for
    all model state here, which each rank initializes identically, exactly
    like every DDP rank running the reference's Initializer redundantly)."""
    if x is None:
        return None
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)

    def leaf(v):
        arr = np.asarray(v)
        return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

    # x may be a pytree (e.g. a Cplx pair); map the assembly over its leaves
    return jax.tree_util.tree_map(leaf, x)


def broadcast_str(s: str, max_len: int = 512) -> str:
    """Rank-0's string to every process (identity single-process).

    Multi-process runs must agree on host-side names that are NOT
    deterministic across ranks — e.g. a prefix_time output folder composed
    a clock-tick apart — before using them in collective file contracts
    (orbax saves require every rank to pass the same path)."""
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    raw = s.encode()
    if len(raw) > max_len:
        # silent truncation would make ranks mkdir/save into a path that
        # differs from the one rank 0 actually created (and could cut a
        # multibyte char mid-sequence, crashing decode below)
        raise ValueError(
            f"broadcast_str: {len(raw)}-byte string exceeds max_len={max_len}; "
            f"shorten the output folder name (recon_dir_affixes) or raise max_len"
        )
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out).rstrip(b"\x00").decode()


def shard_model(
    params: PtychoParams,
    buffers: Buffers,
    mesh: Mesh,
    shard_measurements: bool = True,
):
    """Place model state on the mesh: params replicated, measurements sharded.

    With shard_measurements=True the (N, Ky, Kx) measurement array is split
    along the scan axis, so per-chip HBM holds 1/n_devices of the dataset; the
    batched gather measurements[indices] is partitioned by XLA (batches built
    from shard-local index blocks keep it collective-free, but any index
    pattern stays correct). N is zero-padded up to a device-count multiple;
    valid scan indices never reference the padding.
    """
    import dataclasses

    import numpy as np

    rep = replicate(mesh)
    params = put_global(params, rep)
    meas_sharding = data_sharding(mesh) if shard_measurements else rep
    if shard_measurements:
        n = buffers.measurements.shape[0]
        n_dev = mesh.devices.size
        if n % n_dev:
            pad = n_dev - (n % n_dev)
            if isinstance(buffers.measurements, jax.Array):
                # device-resident: pad ON DEVICE via a cached jit —
                # np.asarray would fetch the whole dataset to host and
                # re-upload it (minutes per GB on tunneled backends)
                padded = _pad_store(buffers.measurements, pad)
            else:
                # np.pad, not eager jnp.pad: this runs on the host at setup,
                # and an eager jnp op costs a remote compile on tunneled
                # backends (CLAUDE.md); the array is device_put just below
                padded = np.pad(
                    np.asarray(buffers.measurements), ((0, pad), (0, 0), (0, 0))
                )
            buffers = dataclasses.replace(buffers, measurements=padded)

    buffers = dataclasses.replace(
        buffers,
        measurements=put_global(buffers.measurements, meas_sharding),
        **{
            f.name: put_global(getattr(buffers, f.name), rep)
            for f in dataclasses.fields(buffers)
            if f.name != "measurements"
        },
    )
    return params, buffers


def init_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (the launch-side counterpart of the
    reference's `accelerate launch`, docs/launch/multiGPU.md).

    On TPU pods with standard orchestration (GKE/XPK/ray), call with no
    arguments — jax.distributed discovers the topology. For manual launches,
    pass coordinator_address ('host:port'), num_processes, and process_id.
    After this, jax.devices() spans all hosts and the data mesh covers the
    full slice; per-host logging/saving is gated by jax.process_index() == 0.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()
