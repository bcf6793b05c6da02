"""Hyperparameter tuning workflow: staged re-initialization + pruning.

Parity with reference src/ptyrad/reconstruction.py:145-240 (hypertune) and
905-1118 (optuna_objective): each trial samples from up to 22 tunable params
(optimizer, batch size, 6 learning rates, dx, probe params, Nlayer, dz,
4 affine terms, tilts), selectively re-runs ONLY the Initializer stages the
sampled value invalidates, builds a fresh model, reports per-iteration error
for pruning, and collates pruned/final results with error-stamped filenames.

Multi-worker: N independent processes share one sqlite storage (the
reference's Slurm LoopSubmit pattern); uses optuna when installed, else the
built-in engine (engine/tuner.py) with the same semantics.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Optional

import numpy as np

from ptyrad_tpu.engine import tuner as builtin_tuner
from ptyrad_tpu.initialization import Initializer
from ptyrad_tpu.utils.logging import vprint

LR_TO_TENSOR = {
    "plr": "probe", "oalr": "obja", "oplr": "objp",
    "slr": "probe_pos_shifts", "tlr": "obj_tilts", "dzlr": "slice_thickness",
}


def _suggest(trial, suggest: str, name: str, kwargs: dict):
    kw = {k: v for k, v in kwargs.items() if k != "optim_configs"}
    if suggest == "cat":
        return trial.suggest_categorical(name, **kw)
    if suggest == "int":
        return trial.suggest_int(name, **kw)
    if suggest == "float":
        return trial.suggest_float(name, **kw)
    raise ValueError(f"suggest method '{suggest}' not supported")


def parse_hypertune_params_to_str(params: dict) -> str:
    return "".join(
        f"_{k}_{v:.4g}" if isinstance(v, float) else f"_{k}_{v}" for k, v in params.items()
    )


def apply_trial_params(trial, params: dict, init: Initializer) -> dict:
    """Sample enabled tune_params and re-run only the invalidated init stages
    (reference reconstruction.py:962-1049). Mutates `init`; returns a fresh
    deep-copied params dict with the sampled values applied."""
    params = deepcopy(params)
    tune = params["hypertune_params"]["tune_params"]

    def on(name):
        return tune[name]["state"]

    def val(name):
        return _suggest(trial, tune[name]["suggest"], name, tune[name]["kwargs"])

    if on("batch_size"):
        params["recon_params"]["BATCH_SIZE"]["size"] = val("batch_size")

    if on("optimizer"):
        optim_name = val("optimizer")
        params["model_params"]["optimizer_params"]["name"] = optim_name
        params["model_params"]["optimizer_params"]["configs"] = (
            tune["optimizer"]["kwargs"].get("optim_configs", {}).get(optim_name, {})
        )

    for vname, tensor in LR_TO_TENSOR.items():
        if on(vname):
            params["model_params"]["update_params"].setdefault(tensor, {"start_iter": 1})
            params["model_params"]["update_params"][tensor]["lr"] = val(vname)
            params["model_params"]["update_params"][tensor].setdefault("start_iter", 1)

    # dx invalidates calibration + everything geometric
    if on("dx"):
        init.init_params["meas_calibration"] = {"mode": "dx", "value": val("dx")}
        init.init_calibration()
        init.set_variables_dict()
        init.init_probe()
        init.init_pos()
        init.init_obj()
        init.init_H()

    # probe shape params invalidate only the probe
    remake_probe = False
    for vname, field in [
        ("pmode_max", "probe_pmode_max"), ("conv_angle", "probe_conv_angle"),
        ("defocus", "probe_defocus"), ("c3", "probe_c3"), ("c5", "probe_c5"),
    ]:
        if on(vname):
            init.init_params[field] = val(vname)
            remake_probe = True
    if remake_probe:
        init.init_probe()

    if on("Nlayer"):
        init.init_params["obj_Nlayer"] = val("Nlayer")
        init.init_obj()

    if on("dz"):
        init.init_params["obj_slice_thickness"] = val("dz")
        init.set_variables_dict()
        init.init_obj()
        init.init_H()

    # affine invalidates positions + object extent. Re-init whenever any
    # affine param is TUNED — gating on value != identity would leave the
    # shared Initializer holding the PREVIOUS trial's positions when this
    # trial happens to sample exactly the identity (cross-trial
    # contamination: recorded params would not reproduce the trial's error)
    affine_init = params["init_params"].get("pos_scan_affine") or [1, 0, 0, 0]
    defaults = dict(zip(["scale", "asymmetry", "rotation", "shear"], affine_init))
    affine_tuned = any(on(v) for v in ("scale", "asymmetry", "rotation", "shear"))
    scan_affine = [val(v) if on(v) else defaults[v] for v in ("scale", "asymmetry", "rotation", "shear")]
    if affine_tuned or scan_affine != [1, 0, 0, 0]:
        init.init_params["pos_scan_affine"] = scan_affine
        init.init_pos()
        init.init_obj()

    # global tilt override — same rule: tuned means re-set every trial
    if on("tilt_y") or on("tilt_x"):
        obj_tilts = [[val("tilt_y") if on("tilt_y") else 0.0,
                      val("tilt_x") if on("tilt_x") else 0.0]]
        init.init_variables["obj_tilts"] = np.asarray(obj_tilts, dtype=np.float32)

    return params


def compute_hypertune_error(solver, error_metric: str) -> float:
    if error_metric == "loss":
        return float(solver.history.loss_iters[-1][1])
    if error_metric == "contrast":
        from ptyrad_tpu.losses import objp_contrast

        return -objp_contrast(
            np.asarray(solver.params.objp), np.asarray(solver.buffers.crop_pos),
            solver.geom.probe_shape, solver.indices,
        )
    raise ValueError(f"Unsupported error_metric '{error_metric}'; use 'loss' or 'contrast'")


def hypertune_objective(trial, params: dict, init: Initializer, mesh=None, verbose: bool = False) -> float:
    """One trial: apply sampled params, rebuild the model, run NITER iterations
    with per-iteration pruning reports, collate results.

    Robustness (beyond the reference, which aborts the whole study on the
    first bad trial, reconstruction.py:234): a Mosaic VMEM compile failure
    inside a trial retries the trial once with the Pallas kernels disabled
    (mirroring the solver's reconstruct() fallback), and run_hypertune
    passes catch=(FloatingPointError,) so diverged trials are recorded as
    failed without killing the study."""
    from ptyrad_tpu.engine.solver import PtyRADSolver

    trial_params = apply_trial_params(trial, params, init)
    recon_params = trial_params["recon_params"]
    ht = trial_params["hypertune_params"]
    n_iter = int(recon_params.get("NITER", 50))
    trial_id = "t" + str(trial.number).zfill(4)

    try:
        solver, error, pruned = _run_trial_loop(
            trial, trial_params, init, mesh, verbose, ht, n_iter, fwd_fused=True
        )
    except Exception as e:  # noqa: BLE001 — inspect for Mosaic VMEM overflow
        if not PtyRADSolver._mosaic_vmem_error(e):
            raise
        vprint(
            f"WARNING: trial {trial_id}: fused Pallas kernel exceeded VMEM "
            f"at compile time; retrying the trial with kernels disabled. "
            f"Mosaic said: {e}"
        )
        solver, error, pruned = _run_trial_loop(
            trial, trial_params, init, mesh, verbose, ht, n_iter, fwd_fused=False
        )

    if ht.get("collate_results", True):
        _collate_trial(trial, trial_params, init, solver, error, trial_id, ht, recon_params)

    if pruned:
        raise _pruned_exception()
    return error


def _run_trial_loop(trial, trial_params, init, mesh, verbose, ht, n_iter,
                    fwd_fused=True):
    """Build the trial solver and run its iteration loop; returns
    (solver, error, pruned). fwd_fused=False disables the Pallas kernels
    (the Mosaic-OOM retry path)."""
    import dataclasses as _dc

    from ptyrad_tpu.engine.solver import PtyRADSolver

    solver = PtyRADSolver(trial_params, init_variables=init.init_variables, mesh=mesh, verbose=verbose)
    if not fwd_fused:
        from ptyrad_tpu.ops.patches import set_force_xla

        # disable BOTH kernel families: geom.fwd_fused gates the multislice
        # kernels, set_force_xla the patch gather/scatter (either may be the
        # one that overflowed Mosaic). The flag resets in the next solver's
        # __init__, so later trials try the kernels again.
        solver.geom = _dc.replace(solver.geom, fwd_fused=False)
        set_force_xla(True)
    solver.prepare()
    solver._build()

    import time as _time

    import jax
    import jax.numpy as jnp

    # drive trials through the fused lax.scan epoch (one dispatch/iteration),
    # same as reconstruct() — the per-batch recon_step loop costs a host
    # round-trip per batch plus a float() sync per loss term, which on
    # tunneled backends multiplies trial wall-clock by the batch count
    # (reference reuses its production step the same way,
    # reconstruction.py:1057-1081)
    train_epoch = solver.train_epoch
    from ptyrad_tpu.engine.solver import put_iter_batches

    canvas = solver._canvas is not None
    if canvas:
        # shard_canvas trials iterate exactly like _canvas_loop: scanned
        # store epoch (or the full-store LBFGS step) + the jitted
        # constraint bridge; only slot indices travel per iteration
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ptyrad_tpu.parallel.canvas import canvas_iteration_batches
        from ptyrad_tpu.parallel.mesh import put_global

        _, store_c, epoch_c, n_batches_c = solver._canvas
        bsh = NamedSharding(solver.mesh, P(None, "data"))
        canvas_lbfgs = getattr(solver, "_canvas_is_lbfgs", False)
        if canvas_lbfgs:
            s0, m0, v0 = canvas_iteration_batches(store_c, n_batches_c, 0)
            lb_inputs = (put_global(s0, bsh), put_global(m0, bsh),
                         jnp.asarray(v0))
    else:
        batch_idx_np = np.asarray(solver.batch_idx)
        batch_mask_np = np.asarray(solver.batch_mask)

    def put_iter(niter):
        # same per-iteration batch-order shuffle AND transfer path as
        # recon_loop — trials must see the training dynamics of the
        # production run they predict
        return put_iter_batches(niter, batch_idx_np, batch_mask_np,
                                solver._put_batch)

    # NOTE: this loop intentionally mirrors the three production iteration
    # bodies (solver.recon_loop, PtyRADSolver._canvas_loop, _lbfgs_loop) so
    # trials see the dynamics of the run they predict, but without history
    # side-effects and with raise-on-divergence + mid-loop prune/report
    # semantics those loops don't have. When changing the dispatch order,
    # constraint bridging, or timing in any of them, mirror it here.
    error = None
    pruned = False
    for niter in range(1, n_iter + 1):
        t0 = _time.perf_counter()
        if canvas:
            if canvas_lbfgs:
                solver.params, solver.opt_state, value = epoch_c(
                    solver.params, solver.opt_state, store_c.meas_store,
                    *lb_inputs, jnp.asarray(niter, jnp.int32))
                term_avgs = {"loss_total": float(value)}
            else:
                slots, mask_b, nval = canvas_iteration_batches(
                    store_c, n_batches_c, niter)
                solver.params, solver.opt_state, _total, terms_dev = epoch_c(
                    solver.params, solver.opt_state, store_c.meas_store,
                    put_global(slots, bsh), put_global(mask_b, bsh),
                    jnp.asarray(nval), jnp.asarray(niter, jnp.int32))
                term_avgs = {k: float(np.mean(np.asarray(v)))
                             for k, v in terms_dev.items()}
            if solver.constraint_fn.due(niter):
                solver.params = solver._canvas_bridge(
                    solver.params, solver._canvas_cbuffers,
                    jnp.asarray(niter, jnp.int32))
            jax.block_until_ready(solver.params.obja)
        elif train_epoch is not None:
            idx_dev, mask_dev = put_iter(niter)
            solver.params, solver.opt_state, _total_dev, terms_dev = train_epoch(
                solver.params, solver.opt_state, idx_dev, mask_dev,
                jnp.asarray(niter, jnp.int32),
            )
            term_avgs = {k: float(np.mean(np.asarray(v))) for k, v in terms_dev.items()}
            solver.params = solver.constraint_fn(solver.params, solver.buffers, niter)
            jax.block_until_ready(solver.params.obja)
        else:  # LBFGS: the solver builds lbfgs_step (train_step is None)
            # pass the loop's niter so freeze_unstarted_params gates tensors
            # by start_iter exactly as the production run would
            idx_dev, mask_dev = put_iter(niter)
            solver.params, solver.opt_state, value = solver.lbfgs_step(
                solver.params, solver.opt_state, idx_dev, mask_dev, niter
            )
            solver.params = solver.constraint_fn(solver.params, solver.buffers, niter)
            term_avgs = {"loss_total": float(value)}
        total = float(sum(term_avgs.values()))
        if not np.isfinite(total):
            # divergence halt (mirrors recon_loop, solver.py): a NaN trial
            # value would break the TPE sort order and is unprunable
            # (nan > median is False) — fail the trial instead
            raise FloatingPointError(
                f"trial diverged: non-finite loss at iter {niter}"
            )
        solver.history.loss_iters.append((niter, total))
        solver.history.term_iters.append(term_avgs)
        solver.history.iter_times.append(_time.perf_counter() - t0)
        solver.history.dz_iters.append((niter, float(solver.params.slice_thickness)))
        solver.history.avg_tilt_iters.append((niter, np.asarray(solver.params.obj_tilts).mean(0)))

        if ht.get("pruner_params") is not None:
            if canvas:
                # the error metric reads whole canvases (padded row-sharded
                # params are not host-addressable on a process-spanning
                # mesh); swap in the gathered view just for the metric
                params_sh = solver.params
                solver.params = solver._canvas_gather(params_sh)
                error = compute_hypertune_error(solver, ht["error_metric"])
                solver.params = params_sh
            else:
                error = compute_hypertune_error(solver, ht["error_metric"])
            trial.report(error, niter)
            if trial.should_prune():
                pruned = True
                break

    if canvas:
        # collation (save_results/plot_summary) and the final error metric
        # consume whole canvases — same bridge _canvas_loop crosses on exit;
        # the optimizer state crosses only if collation will write it
        solver.params = solver._canvas_gather(solver.params)
        if "optim_state" in (trial_params.get("recon_params", {})
                             .get("save_result") or []):
            solver.opt_state = solver._canvas_opt_gather(solver.opt_state)
    if error is None:
        error = compute_hypertune_error(solver, ht["error_metric"])
    return solver, error, pruned


def _collate_trial(trial, trial_params, init, solver, error, trial_id, ht, recon_params):
    from ptyrad_tpu.save import save_results

    params_str = parse_hypertune_params_to_str(trial.params) if ht.get("append_params", True) else ""
    collate_str = f"_error_{error:.5f}_{trial_id}{params_str}"
    try:
        out_dir = recon_params.get("output_dir", "output/")
        save_results(
            out_dir, solver.params, solver.buffers,
            solver.geom, trial_params, solver.opt_state, solver.history,
            len(solver.history.loss_iters), solver.indices, collate_str=collate_str,
        )
        selected = recon_params.get("selected_figs") or []
        if selected:
            from ptyrad_tpu.visualization import plot_summary

            plot_summary(
                out_dir, solver.params, solver.buffers, solver.geom,
                solver.history, len(solver.history.loss_iters), solver.indices,
                selected_figs=selected, init_variables=init.init_variables,
                collate_str=collate_str,
            )
    except Exception as e:  # noqa: BLE001 — result collation must not fail the trial
        vprint(f"WARNING: collate save failed for {trial_id}: {e}")


def _pruned_exception():
    try:
        import optuna

        return optuna.exceptions.TrialPruned()
    except ImportError:
        return builtin_tuner.TrialPruned()


def run_hypertune(params: dict, mesh=None, logger=None, jobid: Optional[str] = None, use_optuna: Optional[bool] = None):
    """Create/load the (shared) study and optimize (reference
    reconstruction.py:145-240). Returns the study."""
    ht = params["hypertune_params"]
    init = Initializer(params["init_params"], verbose=False)
    init.init_all()

    if use_optuna is None:
        try:
            import optuna  # noqa: F401

            use_optuna = True
        except ImportError:
            use_optuna = False

    n_trials = int(ht.get("n_trials", 50))
    timeout = ht.get("timeout")

    if use_optuna:
        import optuna

        sampler_cls = getattr(optuna.samplers, ht["sampler_params"]["name"])
        sampler = sampler_cls(**(ht["sampler_params"].get("configs") or {}))
        pruner = None
        if ht.get("pruner_params") is not None:
            pruner_cls = getattr(optuna.pruners, ht["pruner_params"]["name"])
            pruner = pruner_cls(**(ht["pruner_params"].get("configs") or {}))
        storage = ht.get("storage_path", "hypertune.db")
        if storage is not None and not storage.startswith("sqlite:"):
            # None = in-memory study, like the reference's storage=None
            # (reference/src/ptyrad/reconstruction.py:145-240)
            storage = f"sqlite:///{storage}"
        study = optuna.create_study(
            study_name=ht.get("study_name", "ptyrad_hypertune"),
            storage=storage,
            sampler=sampler, pruner=pruner, direction="minimize", load_if_exists=True,
        )
    else:
        study = builtin_tuner.create_study(
            study_name=ht.get("study_name", "ptyrad_hypertune"),
            # same default as the optuna branch (and the schema): a params
            # dict without storage_path must mean the same persistent shared
            # study under both engines, not in-memory under one of them
            storage_path=ht.get("storage_path", "hypertune.db"),
            sampler_params=ht.get("sampler_params"),
            pruner_params=ht.get("pruner_params"),
            load_if_exists=True,
        )

    vprint(f"Starting hypertune: {n_trials} trials, engine={'optuna' if use_optuna else 'builtin'}")
    optimize_kwargs = {}
    if use_optuna:
        # a diverged trial raises FloatingPointError (hypertune_objective's
        # divergence halt); without catch= optuna aborts the WHOLE study on
        # the first bad trial — the reference has exactly that bug
        # (reconstruction.py:234). The builtin engine catches per-trial
        # unconditionally (tuner.py Study.optimize).
        optimize_kwargs["catch"] = (FloatingPointError,)
    study.optimize(
        lambda trial: hypertune_objective(trial, params, init, mesh=mesh),
        n_trials=n_trials, timeout=timeout, **optimize_kwargs,
    )
    try:
        best = study.best_trial
    except ValueError:
        # optuna raises when no trial completed (the builtin engine returns
        # None); a study where every trial failed must still report cleanly
        best = None
    if best is None:
        vprint("WARNING: no completed trials — nothing to report as best")
    if best is not None:
        if isinstance(best, dict):
            vprint(f"Best trial: #{best['number']} value={best['value']:.6g} params={best['params']}")
        else:
            vprint(f"Best trial: #{best.number} value={best.value:.6g} params={best.params}")
    return study
