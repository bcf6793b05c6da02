"""Self-contained end-to-end demo: simulate a 4D-STEM dataset from a known
multislice object, reconstruct it through the full CLI pipeline, and report
the recovered phase's correlation with the ground truth.

No downloads required (the reference's demos need Zenodo datasets). Runs on
TPU or CPU:

    python demo/scripts/run_synthetic_demo.py [--out DIR] [--niter 60]
"""

import argparse
import os
import sys
import tempfile

import numpy as np
import yaml


def simulate_dataset(out_dir: str, grid: int = 24, npix: int = 64, nz: int = 2):
    """Forward-simulate diffraction data from a known object; returns
    (meas_path, ground-truth phase, scan geometry)."""
    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.models import forward, make_model
    from ptyrad_tpu.physics import make_mixed_probe, make_stem_probe, near_field_evolution
    from ptyrad_tpu.physics.constants import electron_wavelength

    rng = np.random.default_rng(42)
    kv, conv, dx, dz = 80.0, 24.9, 0.3, 2.0
    lam = electron_wavelength(kv)
    step_px = 3

    probe = make_stem_probe({"kv": kv, "conv_angle": conv, "Npix": npix, "dx": dx, "df": 40.0})
    probe = make_mixed_probe(probe, 2, [0.05])

    canvas = grid * step_px + npix + 8
    ys, xs = np.meshgrid(np.arange(grid) * step_px, np.arange(grid) * step_px, indexing="ij")
    crop_pos = np.stack([ys.ravel() + 4, xs.ravel() + 4], -1).astype(np.int32)

    yy, xx = np.mgrid[0:canvas, 0:canvas].astype(float)
    phase = np.zeros((nz, canvas, canvas), np.float32)
    for z in range(nz):
        for _ in range(60):
            cy, cx = rng.integers(10, canvas - 10, 2)
            phase[z] += 0.25 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 6.0)
    true_obj = np.exp(1j * phase)[None].astype(np.complex64)

    sim_init = {
        "obj": true_obj, "probe": probe,
        "probe_pos_shifts": np.zeros((grid * grid, 2), np.float32),
        "obj_tilts": np.zeros((1, 2), np.float32), "slice_thickness": dz,
        "H": near_field_evolution((npix, npix), dx, dz, lam),
        "measurements": np.zeros((grid * grid, npix, npix), np.float32),
        "crop_pos": crop_pos, "omode_occu": np.ones(1, np.float32),
        "dx": dx, "lambd": lam, "N_scan_slow": grid, "N_scan_fast": grid,
    }
    params, buffers, geom = make_model(sim_init)
    dp, _ = jax.jit(lambda p, i: forward(p, buffers, geom, i))(params, jnp.arange(grid * grid))
    meas = np.asarray(dp)

    meas_path = os.path.join(out_dir, "synthetic_4dstem.npy")
    np.save(meas_path, meas)
    geometry = dict(grid=grid, npix=npix, nz=nz, dx=dx, dz=dz, step=step_px * dx,
                    scan_center=crop_pos.mean(0) + npix / 2)
    return meas_path, phase.sum(0), geometry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="Working directory (default: temp)")
    ap.add_argument("--niter", type=int, default=60)
    args = ap.parse_args()

    out_dir = args.out or tempfile.mkdtemp(prefix="ptyrad_tpu_demo_")
    os.makedirs(out_dir, exist_ok=True)
    print(f"Working directory: {out_dir}")

    print("1/3 Simulating synthetic 4D-STEM data from a known object...")
    meas_path, true_phase, g = simulate_dataset(out_dir)

    print("2/3 Writing params file and reconstructing via the CLI pipeline...")
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
            "pos_scan_rand_std": 0.0,
        },
        "model_params": {
            "update_params": {
                "obja": {"start_iter": 1, "lr": 5.0e-3},
                "objp": {"start_iter": 1, "lr": 5.0e-3},
                "probe": {"start_iter": 5, "lr": 1.0e-4},
            },
        },
        "constraint_params": {"objp_postiv": {"freq": 1}, "obja_thresh": {"freq": 1}},
        "recon_params": {
            "NITER": args.niter, "SAVE_ITERS": args.niter, "BATCH_SIZE": {"size": 32},
            "output_dir": os.path.join(out_dir, "output"), "prefix_time": False,
            "save_result": ["model", "objp"], "selected_figs": ["loss", "pos"],
            "result_modes": {"obj_dim": [2, 3], "FOV": ["full"], "bit": ["raw"]},
        },
    }
    params_path = os.path.join(out_dir, "demo.yml")
    with open(params_path, "w") as f:
        yaml.safe_dump(params, f)

    from ptyrad_tpu.engine.workflow import run_reconstruction
    from ptyrad_tpu.load import load_params

    solver = run_reconstruction(load_params(params_path), verbose=True)

    print("3/3 Comparing with ground truth...")
    rec = np.asarray(solver.params.objp).sum(axis=(0, 1))
    # reconstruction and simulation canvases differ; compare windows centered
    # on each frame's scan center
    rec_center = (np.asarray(solver.buffers.crop_pos).mean(0) + g["npix"] / 2).astype(int)
    true_center = np.asarray(g["scan_center"]).astype(int)
    half = (g["grid"] - 1) * 3 // 2  # scan half-span in px

    def window(img, c):
        return img[c[0] - half:c[0] + half, c[1] - half:c[1] + half]

    rec_w, true_w = window(rec, rec_center), window(true_phase, true_center)
    corr = np.corrcoef(rec_w.ravel(), true_w.ravel())[0, 1]
    losses = [v for _, v in solver.history.loss_iters]
    print(f"Loss: {losses[0]:.4f} -> {losses[-1]:.4f} over {len(losses)} iterations")
    print(f"Phase correlation with ground truth: {corr:.3f}")
    print(f"Outputs in: {solver.output_path}")
    if corr < 0.8:
        print("WARNING: correlation below 0.8 — increase --niter")
        return 1
    print("Demo PASSED.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
