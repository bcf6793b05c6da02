"""On-chip hypertune smoke test: 2 trials of the built-in tuner (TPE +
sqlite storage) through the public `ptyrad-tpu run` CLI with
`if_hypertune: true`, on a synthetic dataset (reference flow:
reconstruction.py:145-240).

Tunes the default affine pair (scale, rotation) — value-only changes, so
both trials reuse one compiled program.

    python demo/scripts/run_hypertune_smoke.py [--out DIR] [--trials 2]
"""

import argparse
import os
import sys
import tempfile

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--niter", type=int, default=3)
    args = ap.parse_args()

    out_dir = args.out or tempfile.mkdtemp(prefix="ptyrad_tpu_ht_")
    os.makedirs(out_dir, exist_ok=True)
    print(f"Working directory: {out_dir}")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_synthetic_demo import simulate_dataset

    print("1/3 Simulating synthetic 4D-STEM data...")
    meas_path, _, g = simulate_dataset(out_dir, grid=16, npix=64, nz=2)

    print(f"2/3 Running {args.trials}-trial hypertune via the CLI...")
    db_path = os.path.join(out_dir, "hypertune.db")
    params = {
        "init_params": {
            "probe_kv": 80.0, "probe_conv_angle": 24.9, "probe_defocus": 40.0,
            "meas_Npix": g["npix"],
            "pos_N_scan_slow": g["grid"], "pos_N_scan_fast": g["grid"],
            "pos_scan_step_size": g["step"],
            "meas_calibration": {"mode": "dx", "value": g["dx"]},
            "probe_pmode_max": 2, "obj_Nlayer": g["nz"], "obj_slice_thickness": g["dz"],
            "meas_source": "file", "meas_params": {"path": meas_path},
            "meas_normalization": {"mode": "divide_const", "value": 1.0},
        },
        "model_params": {
            "update_params": {
                "obja": {"start_iter": 1, "lr": 5.0e-3},
                "objp": {"start_iter": 1, "lr": 5.0e-3},
            },
        },
        "recon_params": {
            "NITER": args.niter, "SAVE_ITERS": None, "BATCH_SIZE": {"size": 64},
            "output_dir": os.path.join(out_dir, "output"),
        },
        "hypertune_params": {
            "if_hypertune": True,
            "n_trials": args.trials,
            "collate_results": True,
            "sampler_params": {"name": "TPESampler", "configs": {"seed": 0}},
            "pruner_params": None,
            "error_metric": "loss",
            "storage_path": db_path,
            "study_name": "smoke",
            # default tune_params: scale + rotation enabled
        },
    }
    params_path = os.path.join(out_dir, "ht.yml")
    with open(params_path, "w") as f:
        yaml.safe_dump(params, f)

    from ptyrad_tpu.cli import main as cli_main

    rc = cli_main(["run", "--params_path", params_path])
    if rc not in (0, None):
        print(f"CLI returned {rc}")
        return 1

    print("3/3 Trial table from the shared sqlite storage:")
    from ptyrad_tpu.engine.tuner import Storage

    store = Storage(db_path, "smoke")
    trials = store.all_trials()
    print(f"{'trial':>5} {'state':>9} {'error':>10}  params")
    for t in trials:
        val = f"{t['value']:.5f}" if t["value"] is not None else "-"
        print(f"{t['number']:>5} {t['state']:>9} {val:>10}  {t['params']}")

    complete = [t for t in trials if t["state"] == "COMPLETE"]
    if len(complete) < args.trials:
        print("FAILED: not all trials completed")
        return 1
    print("Hypertune smoke PASSED.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
