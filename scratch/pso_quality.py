"""PSO-scale convergence check on the TPU: is the rising bench loss real
divergence or early-epoch transient? Runs 12 iterations and reports loss
curve + phase correlation with ground truth."""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.constraints import ConstraintScheduler
    from ptyrad_tpu.engine.solver import build_train_epoch
    from ptyrad_tpu.models import forward, make_model
    from ptyrad_tpu.optim import create_optimizer
    from ptyrad_tpu.physics import make_mixed_probe, make_stem_probe, near_field_evolution
    from ptyrad_tpu.physics.constants import electron_wavelength

    # smaller scan count than bench (1,024 DPs) so 12 iters stay <4 min
    n_scans, npix, pmode, nz, batch, grid, step_px = 1024, 256, 4, 21, 32, 32, 3
    kv, conv, dx, dz = 300.0, 25.0, 0.4, 10.0
    lam = electron_wavelength(kv)
    rng = np.random.default_rng(1)
    probe = make_stem_probe({"kv": kv, "conv_angle": conv, "Npix": npix, "dx": dx})
    probe = make_mixed_probe(probe, pmode, [0.02])
    canvas = grid * step_px + npix + 8
    ys, xs = np.meshgrid(np.arange(grid) * step_px, np.arange(grid) * step_px, indexing="ij")
    crop_pos = np.stack([ys.ravel() + 4, xs.ravel() + 4], -1).astype(np.int32)
    yy, xx = np.mgrid[0:canvas, 0:canvas].astype(np.float32)
    cols = np.zeros((canvas, canvas), np.float32)
    for _ in range(80):
        cy, cx = rng.integers(12, canvas - 12, 2)
        cols += 0.1 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0)
    zprof = (0.8 + 0.2 * np.cos(np.linspace(0, np.pi, nz))).astype(np.float32)
    phase = zprof[:, None, None] * cols[None]
    true_obj = np.exp(1j * phase)[None].astype(np.complex64)

    init = {"obj": true_obj, "probe": probe,
            "probe_pos_shifts": np.zeros((n_scans, 2), np.float32),
            "obj_tilts": np.zeros((1, 2), np.float32), "slice_thickness": dz,
            "H": near_field_evolution((npix, npix), dx, dz, lam),
            "measurements": np.zeros((1, npix, npix), np.float32),
            "crop_pos": crop_pos, "omode_occu": np.ones(1, np.float32),
            "dx": dx, "lambd": lam, "N_scan_slow": grid, "N_scan_fast": grid}
    params, buffers, geom = make_model(init)
    sim = jax.jit(lambda p, i: forward(p, buffers, geom, i)[0])
    meas = np.empty((n_scans, npix, npix), np.float32)
    for s in range(0, n_scans, 256):
        meas[s:s + 256] = np.asarray(sim(params, jnp.arange(s, s + 256)))
    print("simulated", flush=True)

    init["measurements"] = meas
    init["obj"] = np.ones_like(true_obj)
    upd = {"obja": {"lr": 5e-4, "start_iter": 1}, "objp": {"lr": 5e-4, "start_iter": 1},
           "probe": {"lr": 1e-4, "start_iter": 1}}
    params, buffers, geom = make_model(init, {"update_params": upd})
    loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}
    optimizer, opt_state, _, start = create_optimizer({"name": "Adam"}, upd, params)
    train_epoch = build_train_epoch(buffers, geom, loss_params, optimizer, start)
    cset = {
        "ortho_pmode": {"freq": 1},
        "fix_probe_int": {"freq": 1},
        "kz_filter": {"freq": 1, "obj_type": "both", "beta": 1.0, "alpha": 1.0},
        "obja_thresh": {"freq": 1, "relax": 0.0, "thresh": (0.98, 1.02)},
        "objp_postiv": {"freq": 1, "relax": 0.0, "mode": "clip_neg"},
    }
    if os.environ.get("NO_KZ"):
        cset.pop("kz_filter")
    constraint_fn = ConstraintScheduler(cset, geom)
    n_batches = n_scans // batch
    idx_all = jnp.asarray(np.random.default_rng(0).permutation(n_scans)
                          .reshape(n_batches, batch), jnp.int32)
    mask_all = jnp.ones(idx_all.shape, jnp.float32)

    for niter in range(1, 13):
        t0 = time.perf_counter()
        params, opt_state, total, _ = train_epoch(
            params, opt_state, idx_all, mask_all, jnp.asarray(niter, jnp.int32))
        params = constraint_fn(params, buffers, niter)
        tv = float(total)
        print(f"iter {niter:2d}: loss={tv:.5f}  ({time.perf_counter()-t0:.1f}s)",
              flush=True)

    rec = np.asarray(params.objp).sum(axis=(0, 1))
    tru = phase.sum(0)
    lo = 4 + npix // 2
    hi = lo + (grid - 1) * step_px
    corr = float(np.corrcoef(rec[lo:hi, lo:hi].ravel(), tru[lo:hi, lo:hi].ravel())[0, 1])
    print(f"phase corr: {corr:.3f}", flush=True)


if __name__ == "__main__":
    main()
