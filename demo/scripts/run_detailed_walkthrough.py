"""Detailed walkthrough of the ptyrad_tpu building blocks — the script
counterpart of the reference's run_ptyrad_detailed_walkthrough.ipynb
(reference demo/scripts): every stage the PtyRADSolver facade automates,
driven by hand through the public API so you can inspect or replace any
piece.

Runs on synthetic data (no downloads) and on CPU or TPU:

    python demo/scripts/run_detailed_walkthrough.py [--niter 10] [--out DIR]

Sections mirror the notebook:
  01 imports + system info          04 forward-pass inspection
  02 params + Initializer stages    05 loss + constraints by hand
  03 model + optimizer              06 manual optimization loop + saving
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def make_synthetic_init_params(tmp_dir, grid=16, npix=32):
    """A tiny synthetic dataset through the SAME init pipeline a real raw
    file would use (meas saved to .npy and loaded back via meas_source)."""
    rng = np.random.default_rng(7)
    y, x = np.mgrid[:npix, :npix] - npix // 2
    disk = (np.hypot(y, x) < npix // 5).astype(np.float32)
    meas = disk[None] * (1 + 0.05 * rng.standard_normal((grid * grid, npix, npix)))
    meas = np.clip(meas, 0, None).astype(np.float32) + 1e-4
    meas_path = os.path.join(tmp_dir, "synthetic_meas.npy")
    np.save(meas_path, meas)
    return {
        "probe_illum_type": "electron",
        "probe_kv": 80.0,
        "probe_conv_angle": 24.9,
        "meas_Npix": npix,
        "pos_N_scans": grid * grid,
        "pos_N_scan_slow": grid,
        "pos_N_scan_fast": grid,
        "pos_scan_step_size": 0.43,
        "meas_calibration": {"mode": "fitRBF"},  # calibrate dx from the data
        "probe_pmode_max": 2,
        "probe_pmode_init_pows": [0.05],
        "obj_omode_max": 1,
        "obj_omode_init_occu": {"occu_type": "uniform"},
        "obj_Nlayer": 2,
        "obj_slice_thickness": 2.0,
        "meas_source": "file",
        "meas_params": {"path": meas_path},
        "probe_source": "simu",
        "probe_params": None,
        "pos_source": "simu",
        "pos_params": None,
        "obj_source": "simu",
        "obj_params": None,
        "tilt_source": "simu",
        "tilt_params": {"tilt_type": "all", "init_tilts": [[0.0, 0.0]]},
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--niter", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_root = args.out or tempfile.mkdtemp(prefix="ptyrad_tpu_walkthrough_")

    # ---- 01: imports + system info -------------------------------------
    import jax
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

    # ---- 02: params + the Initializer's staged pipeline ----------------
    # (a real run would `load_params('params/tBL_WSe2_reconstruct.yml')`;
    # here the dict is built inline around a synthetic dataset)
    init_params = make_synthetic_init_params(out_root)
    model_params = {
        "update_params": {
            "obja": {"lr": 5e-3, "start_iter": 1},
            "objp": {"lr": 5e-3, "start_iter": 1},
            "probe": {"lr": 1e-4, "start_iter": 2},  # delayed start
        },
    }
    loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}
    constraint_params = {
        "fix_probe_int": {"freq": 1},
        "obja_thresh": {"freq": 1, "relax": 0.0, "thresh": (0.9, 1.1)},
        "objp_postiv": {"freq": 2, "relax": 0.0, "mode": "clip_neg"},
    }
    recon_params = {"NITER": args.niter, "BATCH_SIZE": {"size": 32},
                    "GROUP_MODE": "compact", "output_dir": out_root,
                    "save_result": ["model", "obj", "probe"]}
    params_dict = {"init_params": init_params, "model_params": model_params,
                   "loss_params": loss_params,
                   "constraint_params": constraint_params,
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

    fig = plot_scan_positions(v["crop_pos"] + v["probe_pos_shifts"])
    fig.savefig(os.path.join(out_root, "walkthrough_positions.png"), dpi=80)

    # ---- 03: functional model state + optimizer ------------------------
    params, buffers, geom = make_model(v, model_params)
    optimizer, opt_state, lr_dict, start_dict = create_optimizer(
        {"name": "Adam"}, model_params["update_params"], params
    )
    print(f"geometry: {geom.n_slices} slices, probe {geom.probe_shape}, "
          f"shift_probes={geom.shift_probes}")

    # ---- 04: inspect the forward pass ----------------------------------
    idx = jnp.arange(2)
    dp, (obja_p, objp_p) = jax.jit(
        lambda p, i: forward(p, buffers, geom, i)
    )(params, idx)
    print(f"forward dp {dp.shape}, patches {obja_p.shape}")
    fig = plot_forward_pass(params, buffers, geom, np.arange(2))
    fig.savefig(os.path.join(out_root, "walkthrough_forward.png"), dpi=80)

    # ---- 05: loss + constraints by hand --------------------------------
    meas = get_measurements(buffers, geom, idx)
    total, terms = combined_loss(dp, meas, obja_p, objp_p,
                                 buffers.omode_occu, loss_params)
    print("initial loss terms:", {k: float(val) for k, val in terms.items()})
    constraint_fn = ConstraintScheduler(constraint_params, geom)

    # ---- 06: manual optimization loop (what solver.reconstruct() runs) -
    indices = select_scan_indices(geom.n_scan_slow, geom.n_scan_fast, mode="full")
    batches = make_batches(indices, np.asarray(buffers.crop_pos),
                           recon_params["BATCH_SIZE"]["size"],
                           mode=recon_params["GROUP_MODE"], seed=0)
    idx_all, mask_all = pad_batches(batches)
    train_epoch = build_train_epoch(buffers, geom, loss_params, optimizer, start_dict)
    history = ReconHistory()

    idx_dev = jnp.asarray(idx_all)
    mask_dev = jnp.asarray(mask_all)
    for niter in range(1, args.niter + 1):
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

    out_path = make_output_folder(out_root, indices, params_dict, params, geom)
    save_results(out_path, params, buffers, geom, params_dict, opt_state,
                 history, args.niter, indices,
                 lr_dict=lr_dict, start_dict=start_dict)
    ckpts = [f for f in os.listdir(out_path) if f.endswith(".hdf5")]
    print(f"saved {ckpts} + TIFFs under {out_path}")

    losses = [v for _, v in history.loss_iters]
    assert losses[-1] < losses[0], "loss did not decrease"
    print("Walkthrough PASSED.")


if __name__ == "__main__":
    main()
