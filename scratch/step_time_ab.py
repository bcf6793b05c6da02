"""A/B the tBL-scale train step: loss-folded fused kernel vs generic path.

Runs build_train_epoch over 64 batches of 32 (2,048 DPs at 128^2, 6 pmode,
6 slices, demo lrs incl. probe_pos_shifts) and reports ms/step. Usage:
  python scratch/step_time_ab.py         # folded (production default)
  python scratch/step_time_ab.py --off   # fold disabled (generic loss path)
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    fold_off = "--off" in sys.argv
    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.engine import solver as S
    from ptyrad_tpu.models import forward as fwd_mod, make_model
    from ptyrad_tpu.optim import create_optimizer
    from ptyrad_tpu.physics import make_mixed_probe, make_stem_probe, near_field_evolution
    from ptyrad_tpu.physics.constants import electron_wavelength

    if fold_off:
        S.fused_loss_terms = lambda *a, **k: None

    n_scans, npix, pmode, nz, batch = 2048, 128, 6, 6, 32
    kv, conv, dx, dz = 80.0, 24.9, 0.1494, 2.0
    lam = electron_wavelength(kv)
    rng = np.random.default_rng(0)
    probe = make_stem_probe({"kv": kv, "conv_angle": conv, "Npix": npix, "dx": dx})
    probe = make_mixed_probe(probe, pmode, [0.02])
    side = 46
    canvas = side * 3 + npix + 8
    ys, xs = np.meshgrid(np.arange(side) * 3, np.arange(side) * 3, indexing="ij")
    crop_pos = np.stack([ys.ravel() + 4, xs.ravel() + 4], -1)[:n_scans].astype(np.int32)
    obj = np.exp(1j * 0.1 * rng.standard_normal((1, nz, canvas, canvas))).astype(np.complex64)
    meas = np.abs(rng.standard_normal((n_scans, npix, npix))).astype(np.float32)

    upd = {"obja": {"lr": 5e-4, "start_iter": 1}, "objp": {"lr": 5e-4, "start_iter": 1},
           "probe": {"lr": 1e-4, "start_iter": 1},
           "probe_pos_shifts": {"lr": 1e-4, "start_iter": 1}}
    init = {"obj": obj, "probe": probe,
            "probe_pos_shifts": np.zeros((n_scans, 2), np.float32),
            "obj_tilts": np.zeros((1, 2), np.float32), "slice_thickness": dz,
            "H": near_field_evolution((npix, npix), dx, dz, lam),
            "measurements": meas, "crop_pos": crop_pos,
            "omode_occu": np.ones(1, np.float32), "dx": dx, "lambd": lam,
            "N_scan_slow": side, "N_scan_fast": side}
    params, buffers, geom = make_model(init, {"update_params": upd})
    loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5},
                   "loss_sparse": {"state": True, "weight": 0.1, "ln_order": 1}}
    optimizer, opt_state, _, start = create_optimizer({"name": "Adam"}, upd, params)
    train_epoch = S.build_train_epoch(buffers, geom, loss_params, optimizer, start)
    n_batches = n_scans // batch
    idx_all = jnp.asarray(np.random.default_rng(0).permutation(n_scans)
                          .reshape(n_batches, batch), jnp.int32)
    mask_all = jnp.ones(idx_all.shape, jnp.float32)

    def one(params, opt_state, niter):
        params, opt_state, total, _ = train_epoch(
            params, opt_state, idx_all, mask_all, jnp.asarray(niter, jnp.int32))
        np.asarray(total)
        return params, opt_state, float(total)

    t0 = time.perf_counter()
    params, opt_state, total = one(params, opt_state, 1)
    print(f"compile+first epoch {time.perf_counter()-t0:.1f}s loss={total:.4f} "
          f"fold_off={fold_off}", flush=True)
    best = float("inf")
    for niter in range(2, 10):
        t0 = time.perf_counter()
        params, opt_state, total = one(params, opt_state, niter)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"  epoch {niter}: {dt/n_batches*1e3:.2f} ms/step", flush=True)
    print(f"tBL step: {best/n_batches*1e3:.2f} ms ({batch/(best/n_batches):.0f} "
          f"patterns/s) fold_off={fold_off} loss={total:.4f}", flush=True)


if __name__ == "__main__":
    main()
