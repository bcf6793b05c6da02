"""Generate (and optionally execute) the quick-example notebook.

The reference ships demo/scripts/run_ptyrad_quick_example.ipynb — load a
params file, build the solver, run. This emits the ptyrad_tpu counterpart,
with one extra convenience: if the Zenodo demo dataset is not downloaded it
falls back to a small synthetic dataset (reusing run_synthetic_demo's
simulator) so the notebook executes anywhere.

    python demo/scripts/make_quick_example_notebook.py [--execute]

Writes demo/scripts/run_ptyrad_tpu_quick_example.ipynb; --execute runs it
with nbconvert (CPU) so the committed notebook carries outputs.
"""

import argparse
import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "run_ptyrad_tpu_quick_example.ipynb")

MD0 = """\
# Quick example for PtyRAD-TPU

The three-cell workflow (mirrors the reference's
`run_ptyrad_quick_example.ipynb`): pick a params file, build, run. Everything
else — initialization, batching, the jitted training epoch, constraints,
checkpoints, figures — is driven by the params file; see `docs/params.md`
and the detailed-walkthrough notebook for what each stage does.

To reconstruct the real tBL-WSe2 demo dataset first run
`python scripts/download_demo_data.py` (Zenodo, ~1.7 GB). Without it this
notebook simulates a small synthetic 4D-STEM dataset instead, so it runs
anywhere — CPU or TPU — with no downloads.
"""

CODE0 = """\
import os, sys

# Run from demo/scripts/ -> hop to demo/ so data/ and params/ resolve;
# output/ is created under the working directory.
if os.path.basename(os.getcwd()) == "scripts":
    os.chdir("..")
sys.path.insert(0, os.path.abspath(".."))  # repo root (for a source checkout)
print("Current working dir:", os.getcwd())

import jax

# Default to CPU so the notebook runs anywhere (on tunneled-TPU hosts every
# eager op costs a remote compile); set PTYRAD_TPU_QUICK_CPU=0 for the chip.
if os.environ.get("PTYRAD_TPU_QUICK_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
"""

CODE1 = """\
from ptyrad_tpu.load import load_params
from ptyrad_tpu.utils.logging import CustomLogger
from ptyrad_tpu.utils.system import print_system_info

logger = CustomLogger(log_file="ptyrad_tpu_log.txt", log_dir="auto",
                      prefix_date=True, show_timestamp=True)
print_system_info()

# Any params file from demo/params/ works here unchanged:
#   params/tBL_WSe2_reconstruct.yml          full reconstruction
#   params/tBL_WSe2_reconstruct_minimal.yml  only the must-set fields
#   params/tBL_WSe2_hypertune.yml            hyperparameter search
#   params/PSO_reconstruct.yml               21-slice PrScO3, 256x256 patterns
params_path = "params/tBL_WSe2_reconstruct_minimal.yml"
params = load_params(params_path, validate=True)

if not os.path.exists(params["init_params"]["meas_params"]["path"]):
    # demo data not downloaded -> simulate a small dataset (known ground
    # truth) and point the params at it
    print("Demo dataset missing -> synthesizing a small one instead.")
    sys.path.insert(0, "scripts")
    from run_synthetic_demo import simulate_dataset

    os.makedirs("output", exist_ok=True)
    meas_path, true_phase, g = simulate_dataset("output")
    ip = params["init_params"]
    ip.update({
        "meas_Npix": g["npix"], "pos_N_scans": g["grid"] ** 2,
        "pos_N_scan_slow": g["grid"], "pos_N_scan_fast": g["grid"],
        "pos_scan_step_size": g["step"], "meas_flipT": None,
        "probe_defocus": 40.0, "obj_Nlayer": g["nz"],
        "obj_slice_thickness": g["dz"], "probe_pmode_max": 2,
        "meas_calibration": {"mode": "dx", "value": g["dx"]},
        "meas_params": {"path": meas_path},
    })
    params["recon_params"].update({"NITER": 20, "SAVE_ITERS": 20,
                                   "output_dir": "output/quick_example/"})
"""

CODE2 = """\
from ptyrad_tpu.engine.workflow import run_reconstruction

solver = run_reconstruction(params, logger=logger)

# the final reconstructed state (PtychoParams pytree): object amplitude /
# phase canvases, mixed-state probe, position shifts, tilts, dz
final = solver.params
print("objp canvas:", final.objp.shape, "probe modes:", final.probe.re.shape)
print("loss trajectory:", [f"{v:.4f}" for _, v in solver.history.loss_iters[-5:]])
"""

MD3 = """\
Outputs land in `recon_params.output_dir` under a self-describing folder
name: `model.hdf5` (byte-compatible with the reference — cross-resume works
in both directions), object/probe TIFFs, and the summary figures selected by
`recon_params.selected_figs`.

For hypertune params files (`if_hypertune: true`), use
`ptyrad_tpu.engine.hypertune.run_hypertune(params, logger=logger)` instead —
or just `ptyrad-tpu run --params_path <file>`, which dispatches either mode.
"""


def build():
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    nb.cells = [
        nbf.v4.new_markdown_cell(MD0),
        nbf.v4.new_code_cell(CODE0),
        nbf.v4.new_code_cell(CODE1),
        nbf.v4.new_code_cell(CODE2),
        nbf.v4.new_markdown_cell(MD3),
    ]
    return nb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    args = ap.parse_args()
    nb = build()
    if args.execute:
        from nbconvert.preprocessors import ExecutePreprocessor

        os.environ.setdefault("MPLBACKEND", "Agg")
        ep = ExecutePreprocessor(timeout=1800, kernel_name="python3")
        ep.preprocess(nb, {"metadata": {"path": HERE}})
    with open(OUT, "w") as f:
        nbf.write(nb, f)
    print(f"wrote {OUT} ({'executed' if args.execute else 'unexecuted'})")


if __name__ == "__main__":
    main()
