"""jax.profiler trace of the PSO train epoch (device-time breakdown).

Writes a trace to /tmp/pso_prof and prints the top ops by device duration
parsed from the trace's .pb (if parseable) — otherwise just records the
trace for manual inspection.
"""
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

    n_scans, npix, pmode, nz, batch = 512, 256, 4, 21, 32
    kv, conv, dx, dz = 300.0, 25.0, 0.4, 10.0
    lam = electron_wavelength(kv)
    rng = np.random.default_rng(1)
    probe = make_stem_probe({"kv": kv, "conv_angle": conv, "Npix": npix, "dx": dx})
    probe = make_mixed_probe(probe, pmode, [0.02])
    side = 23
    canvas = side * 3 + npix + 8
    ys, xs = np.meshgrid(np.arange(side) * 3, np.arange(side) * 3, indexing="ij")
    crop_pos = np.stack([ys.ravel() + 4, xs.ravel() + 4], -1)[:n_scans].astype(np.int32)
    obj = np.exp(1j * 0.1 * rng.standard_normal((1, nz, canvas, canvas))).astype(np.complex64)
    meas = np.abs(rng.standard_normal((n_scans, npix, npix))).astype(np.float32)

    upd = {"obja": {"lr": 5e-4, "start_iter": 1}, "objp": {"lr": 5e-4, "start_iter": 1},
           "probe": {"lr": 1e-4, "start_iter": 1}}
    init = {"obj": obj, "probe": probe,
            "probe_pos_shifts": np.zeros((n_scans, 2), np.float32),
            "obj_tilts": np.zeros((1, 2), np.float32), "slice_thickness": dz,
            "H": near_field_evolution((npix, npix), dx, dz, lam),
            "measurements": meas, "crop_pos": crop_pos,
            "omode_occu": np.ones(1, np.float32), "dx": dx, "lambd": lam,
            "N_scan_slow": side, "N_scan_fast": side}
    params, buffers, geom = make_model(init, {"update_params": upd})
    loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}
    optimizer, opt_state, _, start = create_optimizer({"name": "Adam"}, upd, params)
    train_epoch = build_train_epoch(buffers, geom, loss_params, optimizer, start)
    n_batches = n_scans // batch
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

    logdir = "/tmp/pso_prof"
    with jax.profiler.trace(logdir):
        params, opt_state, total = one(params, opt_state, 2)
    print("trace written", flush=True)

    # crude trace.json.gz parse: sum device-stream event durations by name
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace json found under", logdir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # identify TPU device thread ids (names containing 'TPU' and 'XLA Op' etc.)
    durs = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        args = e.get("args") or {}
        cat = args.get("group_by", "")
        durs[name] = durs.get(name, 0.0) + e.get("dur", 0) / 1e3  # ms
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:25]
    for name, ms in top:
        print(f"{ms:9.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
