"""Generate (and optionally execute) the detailed-walkthrough notebook.

The reference ships runnable .ipynb walkthroughs
(reference demo/scripts/run_ptyrad_detailed_walkthrough.ipynb); this emits
the ptyrad_tpu counterpart from the same building blocks as
run_detailed_walkthrough.py, as a REAL notebook users can open and step
through.

    python demo/scripts/make_walkthrough_notebook.py [--execute]

Writes demo/scripts/run_ptyrad_tpu_detailed_walkthrough.ipynb; --execute
runs it with nbconvert (CPU) so the committed notebook carries outputs.
"""

import argparse
import os
import sys

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "run_ptyrad_tpu_detailed_walkthrough.ipynb")

MD = [None] * 8
CODE = [None] * 8

MD[0] = """\
# PtyRAD-TPU detailed walkthrough

Every stage the `PtyRADSolver` facade automates, driven by hand through the
public API so you can inspect or replace any piece. Mirrors the reference's
`run_ptyrad_detailed_walkthrough.ipynb` (reference demo/scripts), on a
synthetic dataset so it runs anywhere with no downloads — CPU or TPU.

Sections:
1. imports + system info
2. params + the Initializer's staged pipeline
3. functional model state + optimizer
4. forward-pass inspection
5. loss + constraints by hand
6. the manual optimization loop (what `solver.reconstruct()` runs)
7. checkpoint saving + resume
"""

CODE[0] = """\
import os, sys, tempfile, time
import numpy as np

# running from demo/scripts/: make the repo importable
sys.path.insert(0, os.path.abspath(os.path.join(os.getcwd(), "..", "..")))

NITER = 10
out_root = tempfile.mkdtemp(prefix="ptyrad_tpu_walkthrough_")

import jax

# Default to CPU so the notebook runs anywhere (on tunneled-TPU hosts every
# eager op costs a remote compile); set PTYRAD_TPU_WALKTHROUGH_CPU=0 to run
# on the real chip.
if os.environ.get("PTYRAD_TPU_WALKTHROUGH_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from ptyrad_tpu.constraints import ConstraintScheduler
from ptyrad_tpu.engine.batching import make_batches, pad_batches, select_scan_indices
from ptyrad_tpu.engine.solver import ReconHistory, build_train_epoch
from ptyrad_tpu.initialization import Initializer
from ptyrad_tpu.losses import combined_loss
from ptyrad_tpu.models import forward, get_measurements, make_model
from ptyrad_tpu.optim import create_optimizer
from ptyrad_tpu.save import make_output_folder, save_results
from ptyrad_tpu.utils.system import print_system_info
from ptyrad_tpu.visualization import plot_forward_pass, plot_scan_positions

print_system_info()
"""

MD[1] = """\
## 2. Params + the Initializer's staged pipeline

A real run would `load_params('demo/params/tBL_WSe2_reconstruct.yml')` — the
reference demo YAMLs validate unchanged. Here the dict is built inline around
a synthetic dataset saved to `.npy` and loaded back through the SAME
`meas_source` path a real file would use, including fitRBF calibration of
the pixel size from the data's bright-field disk.
"""

CODE[1] = """\
grid, npix = 16, 32
rng = np.random.default_rng(7)
y, x = np.mgrid[:npix, :npix] - npix // 2
disk = (np.hypot(y, x) < npix // 5).astype(np.float32)
meas = disk[None] * (1 + 0.05 * rng.standard_normal((grid * grid, npix, npix)))
meas = np.clip(meas, 0, None).astype(np.float32) + 1e-4
meas_path = os.path.join(out_root, "synthetic_meas.npy")
np.save(meas_path, meas)

init_params = {
    "probe_illum_type": "electron",
    "probe_kv": 80.0, "probe_conv_angle": 24.9,
    "meas_Npix": npix,
    "pos_N_scans": grid * grid, "pos_N_scan_slow": grid, "pos_N_scan_fast": grid,
    "pos_scan_step_size": 0.43,
    "meas_calibration": {"mode": "fitRBF"},   # calibrate dx from the data
    "probe_pmode_max": 2, "probe_pmode_init_pows": [0.05],
    "obj_omode_max": 1, "obj_omode_init_occu": {"occu_type": "uniform"},
    "obj_Nlayer": 2, "obj_slice_thickness": 2.0,
    "meas_source": "file", "meas_params": {"path": meas_path},
    "probe_source": "simu", "probe_params": None,
    "pos_source": "simu", "pos_params": None,
    "obj_source": "simu", "obj_params": None,
    "tilt_source": "simu", "tilt_params": {"tilt_type": "all", "init_tilts": [[0.0, 0.0]]},
}
model_params = {
    "update_params": {
        "obja": {"lr": 5e-3, "start_iter": 1},
        "objp": {"lr": 5e-3, "start_iter": 1},
        "probe": {"lr": 1e-4, "start_iter": 2},   # delayed start
    },
}
loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}
constraint_params = {
    "fix_probe_int": {"freq": 1},
    "obja_thresh": {"freq": 1, "relax": 0.0, "thresh": (0.9, 1.1)},
    "objp_postiv": {"freq": 2, "relax": 0.0, "mode": "clip_neg"},
}
recon_params = {"NITER": NITER, "BATCH_SIZE": {"size": 32},
                "GROUP_MODE": "compact", "output_dir": out_root,
                "save_result": ["model", "obj", "probe"]}
params_dict = {"init_params": init_params, "model_params": model_params,
               "loss_params": loss_params, "constraint_params": constraint_params,
               "recon_params": recon_params}

init = Initializer(init_params, verbose=False)
init.init_cache()
init.init_measurements()   # load -> reshape -> crop/pad/resample chain
init.init_calibration()    # fitRBF: dx from the bright-field disk
init.set_variables_dict()
init.init_probe()          # aberrated STEM probe + Hermite mixed modes
init.init_pos()            # raster positions (+affine/jitter if set)
init.init_obj()
init.init_omode_occu()     # mixed-state object occupancies
init.init_H()              # angular-spectrum propagator
init.init_obj_tilts()
init.init_check()          # cross-stage consistency
v = init.init_variables
print(f"calibrated dx = {init.init_params['probe_dx']:.4f} A "
      f"(fitRBF = {v['fitRBF']:.2f} px)")
plot_scan_positions(v["crop_pos"] + v["probe_pos_shifts"])
"""

MD[2] = """\
## 3. Functional model state + optimizer

`make_model` splits the init variables into the optimizable `PtychoParams`
pytree, constant `Buffers` (measurements, propagator, crop positions — passed
as jit *arguments*, never closed over), and a hashable static `Geometry`.
`create_optimizer` builds an optax `multi_transform` with per-tensor learning
rates and `start_iter` gating (the reference's per-tensor param groups,
reference reconstruction.py:285-368).
"""

CODE[2] = """\
params, buffers, geom = make_model(v, model_params)
optimizer, opt_state, lr_dict, start_dict = create_optimizer(
    {"name": "Adam"}, model_params["update_params"], params
)
print(f"geometry: {geom.n_slices} slices, probe {geom.probe_shape}, "
      f"shift_probes={geom.shift_probes}")
jax.tree_util.tree_map(lambda a: a.shape, params)
"""

MD[3] = """\
## 4. Inspect the forward pass

`forward` is a pure function: multislice propagation of the mixed-state probe
through the object patches (reference forward.py:20-80). On TPU it dispatches
to the fused Pallas kernel; here it runs the XLA path.
"""

CODE[3] = """\
idx = jnp.arange(2)
dp, (obja_p, objp_p) = jax.jit(lambda p, i: forward(p, buffers, geom, i))(params, idx)
print(f"forward dp {dp.shape}, patches {obja_p.shape}")
plot_forward_pass(params, buffers, geom, np.arange(2))
"""

MD[4] = """\
## 5. Loss + constraints by hand

`combined_loss` is the 5-term weighted sum (reference losses.py:17-155);
`ConstraintScheduler` compiles the enabled iteration-wise projections into
ONE niter-conditioned program applied between iterations (the functional
equivalent of the reference's 12 in-place mutations,
reference constraints.py:227-246).
"""

CODE[4] = """\
meas_b = get_measurements(buffers, geom, idx)
total, terms = combined_loss(dp, meas_b, obja_p, objp_p,
                             buffers.omode_occu, loss_params)
print("initial loss terms:", {k: float(val) for k, val in terms.items()})
constraint_fn = ConstraintScheduler(constraint_params, geom)
"""

MD[5] = """\
## 6. The manual optimization loop

What `solver.reconstruct()` runs: `select_scan_indices` + `make_batches`
('compact' = k-means position clustering, reference reconstruction.py:479-587),
then ONE jitted `lax.scan` over all batches per iteration
(`build_train_epoch`) with the constraint program between iterations.
"""

CODE[5] = """\
indices = select_scan_indices(geom.n_scan_slow, geom.n_scan_fast, mode="full")
batches = make_batches(indices, np.asarray(buffers.crop_pos),
                       recon_params["BATCH_SIZE"]["size"],
                       mode=recon_params["GROUP_MODE"], seed=0)
idx_all, mask_all = pad_batches(batches)
train_epoch = build_train_epoch(buffers, geom, loss_params, optimizer, start_dict)
history = ReconHistory()

idx_dev, mask_dev = jnp.asarray(idx_all), jnp.asarray(mask_all)
for niter in range(1, NITER + 1):
    t0 = time.perf_counter()
    params, opt_state, total, _ = train_epoch(
        params, opt_state, idx_dev, mask_dev, jnp.asarray(niter, jnp.int32))
    params = constraint_fn(params, buffers, niter)
    tv = float(total)
    history.loss_iters.append((niter, tv))
    history.iter_times.append(time.perf_counter() - t0)
    history.dz_iters.append((niter, float(params.slice_thickness)))
    history.avg_tilt_iters.append((niter, np.asarray(params.obj_tilts).mean(0)))
    print(f"iter {niter:2d}: loss={tv:.5f} ({history.iter_times[-1]:.2f}s)")
"""

MD[6] = """\
## 7. Checkpoint saving

`make_output_folder` builds the self-describing folder name (reference
save.py:235-512); `save_results` writes the HDF5 checkpoint — byte-compatible
with the reference's `model.hdf5`, so cross-resume works in BOTH directions —
plus object/probe TIFFs.
"""

CODE[6] = """\
out_path = make_output_folder(out_root, indices, params_dict, params, geom)
save_results(out_path, params, buffers, geom, params_dict, opt_state,
             history, NITER, indices, lr_dict=lr_dict, start_dict=start_dict)
ckpts = sorted(os.listdir(out_path))
losses = [val for _, val in history.loss_iters]
assert losses[-1] < losses[0], "loss did not decrease"
print(f"saved {[f for f in ckpts if f.endswith('.hdf5')]} + TIFFs under {out_path}")
print("Walkthrough PASSED.")
"""


def build():
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    cells = []
    for md, code in zip(MD, CODE):
        if md:
            cells.append(nbf.v4.new_markdown_cell(md))
        if code:
            cells.append(nbf.v4.new_code_cell(code))
    nb.cells = cells
    return nb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    args = ap.parse_args()
    nb = build()
    if args.execute:
        from nbconvert.preprocessors import ExecutePreprocessor

        # matplotlib Agg + CPU platform for a headless, chip-free execution
        os.environ.setdefault("MPLBACKEND", "Agg")
        ep = ExecutePreprocessor(timeout=1200, kernel_name="python3")
        ep.preprocess(nb, {"metadata": {"path": HERE}})
    with open(OUT, "w") as f:
        nbf.write(nb, f)
    print(f"wrote {OUT} ({'executed' if args.execute else 'unexecuted'})")


if __name__ == "__main__":
    main()
