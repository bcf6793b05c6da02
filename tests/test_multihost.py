"""Verified multi-process launch: 2 CPU processes, one process-spanning mesh.

The reference's multi-GPU path is `accelerate launch` + torch DDP over NCCL
(reference docs/launch/multiGPU.md:41, utils/common.py:58-90). The TPU-native
equivalent is jax.distributed + a mesh spanning all processes' devices
(parallel/mesh.init_multihost). This test actually EXECUTES that path — two
subprocesses with a 127.0.0.1 coordinator, 4 virtual CPU devices each, one
train epoch over the 8-device process-spanning mesh — and asserts:

  * both ranks converge to the same epoch loss (the psum'd gradient
    reduction spans processes),
  * rank-0-only side effects fire exactly once (the DDP rank-0 saving
    contract, reference reconstruction.py:639).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_CHILD = r"""
import os, sys
rank, port, outdir, repo = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
sys.path.insert(0, repo)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

from ptyrad_tpu.parallel.mesh import (
    init_multihost, make_mesh, put_global, shard_model,
)

pid, nproc = init_multihost(f"127.0.0.1:{port}", 2, rank)
assert pid == rank and nproc == 2, (pid, nproc)
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ptyrad_tpu.engine.solver import build_train_epoch
from ptyrad_tpu.models import make_model
from ptyrad_tpu.optim import create_optimizer
from ptyrad_tpu.physics import make_stem_probe, make_mixed_probe, near_field_evolution
from ptyrad_tpu.physics.constants import electron_wavelength

# tiny synthetic workload, built IDENTICALLY on every rank (like every DDP
# rank running the reference Initializer redundantly)
rng = np.random.default_rng(0)
n_scans, npix, nz, pmode = 16, 16, 2, 2
kv, dx, dz = 80.0, 0.2, 2.0
lam = electron_wavelength(kv)
probe = make_stem_probe({"kv": kv, "conv_angle": 20.0, "Npix": npix, "dx": dx})
probe = make_mixed_probe(probe, pmode, [0.02])
side = 4
canvas = side * 2 + npix + 8
ys, xs = np.meshgrid(np.arange(side) * 2, np.arange(side) * 2, indexing="ij")
crop_pos = np.stack([ys.ravel() + 4, xs.ravel() + 4], -1).astype(np.int32)
obj = np.exp(1j * 0.1 * rng.standard_normal((1, nz, canvas, canvas))).astype(np.complex64)
meas = np.abs(rng.standard_normal((n_scans, npix, npix))).astype(np.float32)
init = {
    "obj": obj, "probe": probe,
    "probe_pos_shifts": np.zeros((n_scans, 2), np.float32),
    "obj_tilts": np.zeros((1, 2), np.float32), "slice_thickness": dz,
    "H": near_field_evolution((npix, npix), dx, dz, lam),
    "measurements": meas, "crop_pos": crop_pos,
    "omode_occu": np.ones(1, np.float32), "dx": dx, "lambd": lam,
    "N_scan_slow": side, "N_scan_fast": side,
}
upd = {"obja": {"lr": 1e-3, "start_iter": 1}, "objp": {"lr": 1e-3, "start_iter": 1}}

# drive the PUBLIC solver facade on the process-spanning mesh — the
# production multi-process path (shard_model via put_global, put_batch,
# replicated opt_state, deterministic cross-rank batching), not a
# hand-rolled epoch
from ptyrad_tpu.engine.solver import PtyRADSolver

mesh = make_mesh()  # all 8 devices across BOTH processes
cfg = {
    "model_params": {"update_params": upd, "optimizer_params": {"name": "Adam"}},
    "recon_params": {"NITER": 2, "BATCH_SIZE": {"size": 8}},
}
solver = PtyRADSolver(cfg, init_variables=init, mesh=mesh, verbose=False)
solver.run()
total = float(solver.history.loss_iters[-1][1])
objp_sum = float(jnp.sum(jnp.abs(solver.params.objp)))
print(f"MHOK rank={rank} loss={total:.9f} objp={objp_sum:.9f}", flush=True)

# the production save path, called on EVERY rank (workflow.py contract):
# device math incl. the probe_prop jit dispatch is collective over the
# process-spanning arrays; file writes must come out rank-0-only
from ptyrad_tpu.save import save_results
from ptyrad_tpu.optim import save_opt_state

cfg["recon_params"]["save_result"] = ["model", "obj", "probe", "probe_prop"]
save_dir = os.path.join(outdir, "save_test")
save_results(save_dir, solver.params, solver.buffers, solver.geom, cfg,
             solver.opt_state, solver.history, 2, solver.indices)
# SAME path from every rank — orbax's save is a cross-process collective
save_opt_state(solver.opt_state, os.path.join(save_dir, "optim_state"))

# beyond-reference: the canvas-sharded solver path on the PROCESS-SPANNING
# mesh — object rows sharded over 8 devices across both processes, resident
# slab-major measurement store via put_global, jitted constraint bridge
ys2 = np.repeat(np.arange(8) * (npix + 4), 2) + np.tile([2, 4], 8)
xs2 = np.tile([3, 9], 8)
crop2 = np.stack([ys2, xs2], -1).astype(np.int32)
n2 = crop2.shape[0]
canvas2_y, canvas2_x = 8 * (npix + 4), npix + 20
obj2 = np.exp(
    1j * 0.1 * rng.standard_normal((1, nz, canvas2_y, canvas2_x))
).astype(np.complex64)
init2 = {
    "obj": obj2, "probe": probe,
    "probe_pos_shifts": np.zeros((n2, 2), np.float32),
    "obj_tilts": np.zeros((1, 2), np.float32), "slice_thickness": dz,
    "H": near_field_evolution((npix, npix), dx, dz, lam),
    "measurements": np.abs(rng.standard_normal((n2, npix, npix))).astype(np.float32),
    "crop_pos": crop2,
    "omode_occu": np.ones(1, np.float32), "dx": dx, "lambd": lam,
    "N_scan_slow": 8, "N_scan_fast": 2,
}
cfg2 = {
    "model_params": {"update_params": upd, "optimizer_params": {"name": "Adam"},
                     "fwd_fused": False},
    "constraint_params": {"objp_postiv": {"freq": 2, "relax": 0.0}},
    "recon_params": {"NITER": 2, "BATCH_SIZE": {"size": n2},
                     "shard_canvas": True},
}
solver2 = PtyRADSolver(cfg2, init_variables=init2, mesh=mesh, verbose=False)
solver2.run()
loss2 = float(solver2.history.loss_iters[-1][1])
objp2 = float(jnp.sum(jnp.abs(solver2.params.objp)))
assert solver2.params.objp.shape[2] == canvas2_y  # whole canvas handed back
print(f"MHCV rank={rank} loss={loss2:.9f} objp={objp2:.9f}", flush=True)

# canvas LBFGS across processes: the scanned full-store linesearch objective
# with row-sharded diff memories, halo + linesearch collectives crossing the
# process boundary
cfg3 = {
    "model_params": {"update_params": upd, "optimizer_params": {"name": "LBFGS"},
                     "fwd_fused": False},
    "recon_params": {"NITER": 1, "BATCH_SIZE": {"size": n2},
                     "shard_canvas": True},
}
solver3 = PtyRADSolver(cfg3, init_variables=dict(init2), mesh=mesh, verbose=False)
solver3.run()
loss3 = float(solver3.history.loss_iters[-1][1])
objp3 = float(jnp.sum(jnp.abs(solver3.params.objp)))
print(f"MHLB rank={rank} loss={loss3:.9f} objp={objp3:.9f}", flush=True)

# rank-divergent host strings (e.g. prefix_time folder names) adopt rank 0's
from ptyrad_tpu.parallel.mesh import broadcast_str
agreed = broadcast_str(f"folder_rank{rank}")
assert agreed == "folder_rank0", agreed

# rank-0-only side effect (the saving contract): exactly one rank writes
if jax.process_index() == 0:
    with open(os.path.join(outdir, f"rank0_save.txt"), "w") as f:
        f.write(f"{total:.9f}")
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port



@pytest.mark.slow
def test_two_process_multihost_epoch(tmp_path):
    port = _free_port()
    child_src = _CHILD
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child_src, str(rank), str(port), str(tmp_path), REPO],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank failed:\nstdout:\n{out}\nstderr:\n{err[-4000:]}"
        outs.append(out)

    vals = {}
    cvals = {}
    lvals = {}
    for rank, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith("MHOK")]
        assert line, f"rank {rank} produced no result line:\n{out}"
        parts = dict(kv.split("=") for kv in line[0].split()[1:])
        assert int(parts["rank"]) == rank
        vals[rank] = (float(parts["loss"]), float(parts["objp"]))
        cline = [ln for ln in out.splitlines() if ln.startswith("MHCV")]
        assert cline, f"rank {rank} produced no canvas-sharded line:\n{out}"
        cparts = dict(kv.split("=") for kv in cline[0].split()[1:])
        cvals[rank] = (float(cparts["loss"]), float(cparts["objp"]))
        lline = [ln for ln in out.splitlines() if ln.startswith("MHLB")]
        assert lline, f"rank {rank} produced no canvas-LBFGS line:\n{out}"
        lparts = dict(kv.split("=") for kv in lline[0].split()[1:])
        lvals[rank] = (float(lparts["loss"]), float(lparts["objp"]))

    # both ranks agree on the reduced loss AND on the updated parameters
    assert vals[0][0] == pytest.approx(vals[1][0], rel=1e-6)
    assert vals[0][1] == pytest.approx(vals[1][1], rel=1e-6)
    assert np.isfinite(vals[0][0])

    # canvas-sharded leg: ranks agree and stay finite (the slabs span
    # processes; the halo ppermute and the store gather cross the
    # process boundary)
    assert cvals[0][0] == pytest.approx(cvals[1][0], rel=1e-6)
    assert cvals[0][1] == pytest.approx(cvals[1][1], rel=1e-6)
    assert np.isfinite(cvals[0][0])

    # canvas LBFGS leg: linesearch collectives + row-sharded diff memories
    # across the process boundary; ranks agree and stay finite
    assert lvals[0][0] == pytest.approx(lvals[1][0], rel=1e-6)
    assert lvals[0][1] == pytest.approx(lvals[1][1], rel=1e-6)
    assert np.isfinite(lvals[0][0])

    # rank-0-only saving: the file exists and was written exactly once
    saved = (tmp_path / "rank0_save.txt").read_text()
    assert float(saved) == pytest.approx(vals[0][0], rel=1e-6)

    # production save path on the mesh: checkpoint written (by rank 0),
    # and the all-ranks save_opt_state gated its write to rank 0 only
    save_dir = tmp_path / "save_test"
    assert (save_dir / "model_iter0002.hdf5").exists(), os.listdir(save_dir)
    assert (save_dir / "optim_state").exists()
