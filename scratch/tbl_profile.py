"""jax.profiler trace of the tBL-scale train epoch (device-time breakdown)."""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.engine.solver import build_train_epoch
    from ptyrad_tpu.models import make_model
    from ptyrad_tpu.optim import create_optimizer
    from ptyrad_tpu.physics import make_mixed_probe, make_stem_probe, near_field_evolution
    from ptyrad_tpu.physics.constants import electron_wavelength

    n_scans, npix, pmode, nz, batch = 1024, 128, 6, 6, 32
    kv, conv, dx, dz = 80.0, 24.9, 0.1494, 2.0
    lam = electron_wavelength(kv)
    rng = np.random.default_rng(1)
    probe = make_stem_probe({"kv": kv, "conv_angle": conv, "Npix": npix, "dx": dx})
    probe = make_mixed_probe(probe, pmode, [0.02])
    side = 32
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
    train_epoch = build_train_epoch(buffers, geom, loss_params, optimizer, start)
    n_batches = n_scans // batch  # 32
    idx_all = jnp.asarray(np.arange(n_scans).reshape(n_batches, batch), jnp.int32)
    mask_all = jnp.ones(idx_all.shape, jnp.float32)

    def one(params, opt_state, niter):
        params, opt_state, total, _ = train_epoch(
            params, opt_state, idx_all, mask_all, jnp.asarray(niter, jnp.int32))
        np.asarray(total)
        return params, opt_state, float(total)

    t0 = time.perf_counter()
    params, opt_state, total = one(params, opt_state, 1)
    print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)

    logdir = "/tmp/tbl_prof"
    with jax.profiler.trace(logdir):
        params, opt_state, total = one(params, opt_state, 2)
    print(f"trace written ({n_batches} steps in the epoch)", flush=True)

    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace json found under", logdir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    durs = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        durs[e.get("name", "")] = durs.get(e.get("name", ""), 0.0) + e.get("dur", 0) / 1e3
    for name, ms in sorted(durs.items(), key=lambda kv: -kv[1])[:28]:
        print(f"{ms:9.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
