"""Hypertune engine, tuner, and visualization tests."""

import os

import numpy as np
import pytest

from ptyrad_tpu.engine import tuner
from ptyrad_tpu.engine.hypertune import apply_trial_params, run_hypertune
from ptyrad_tpu.initialization import Initializer

from test_init_io import base_init_params


class TestTunerCore:
    def test_random_sampler_bounds(self):
        s = tuner.RandomSampler(seed=0)
        for _ in range(50):
            v = s.sample("x", {"kind": "float", "low": 1.0, "high": 2.0}, [])
            assert 1.0 <= v <= 2.0
        v = s.sample("n", {"kind": "int", "low": 2, "high": 5}, [])
        assert isinstance(v, int) and 2 <= v <= 5
        v = s.sample("c", {"kind": "cat", "choices": ["a", "b"]}, [])
        assert v in ("a", "b")

    def test_log_scale_sampling(self):
        s = tuner.RandomSampler(seed=0)
        vals = [s.sample("lr", {"kind": "float", "low": 1e-5, "high": 1e-1, "log": True}, [])
                for _ in range(200)]
        # log-uniform: ~half the samples below the geometric mean 1e-3
        frac_low = np.mean([v < 1e-3 for v in vals])
        assert 0.3 < frac_low < 0.7

    def test_grid_sampler_cycles(self):
        s = tuner.GridSampler()
        spec = {"kind": "cat", "choices": ["a", "b", "c"]}
        hist = []
        out = []
        for i in range(6):
            v = s.sample("c", spec, hist)
            out.append(v)
            hist.append({"state": "COMPLETE", "value": 0.0, "params": {"c": v}, "reports": {}})
        assert out == ["a", "b", "c", "a", "b", "c"]

    def test_study_minimizes_quadratic(self, tmp_path):
        """TPE should concentrate samples near the optimum of (x-0.7)^2."""
        study = tuner.create_study("quad", sampler_params={"name": "TPESampler", "configs": {"seed": 0, "n_startup_trials": 8}})

        def objective(trial):
            x = trial.suggest_float("x", 0.0, 1.0)
            return (x - 0.7) ** 2

        study.optimize(objective, n_trials=40)
        best = study.best_trial
        assert best is not None
        assert abs(best["params"]["x"] - 0.7) < 0.15
        # TPE beats the random-phase average in its exploitation phase
        xs = [t["params"]["x"] for t in study.trials if t["state"] == "COMPLETE"]
        late = xs[20:]
        assert np.mean(np.abs(np.array(late) - 0.7)) < 0.25

    def test_tpe_beats_random_on_toy_objective(self):
        """Characterization of the builtin TPE (a 1D-KDE approximation of
        optuna's): within a 40-trial budget on a seeded 2D quadratic it must
        find a better optimum than RandomSampler on average (VERDICT r1 #9)."""

        def objective(trial):
            x = trial.suggest_float("x", -1.0, 1.0)
            y = trial.suggest_float("y", -1.0, 1.0)
            return (x - 0.3) ** 2 + (y + 0.2) ** 2

        def best_after(sampler_name, seed):
            study = tuner.create_study(
                f"{sampler_name}_{seed}",
                sampler_params={"name": sampler_name,
                                "configs": {"seed": seed, "n_startup_trials": 10}},
            )
            study.optimize(objective, n_trials=40)
            return study.best_trial["value"]

        seeds = range(5)
        tpe = np.mean([best_after("TPESampler", s) for s in seeds])
        rnd = np.mean([best_after("RandomSampler", s) for s in seeds])
        assert tpe < rnd, (tpe, rnd)
        assert tpe < 0.025  # absolute quality: near the optimum

    def test_sqlite_storage_shared(self, tmp_path):
        """Two studies over one sqlite file see each other's trials (the
        multi-worker cooperation mechanism)."""
        db = str(tmp_path / "study.db")
        s1 = tuner.create_study("shared", storage_path=db)
        s1.optimize(lambda t: t.suggest_float("x", 0, 1) ** 2, n_trials=5)
        s2 = tuner.create_study("shared", storage_path=db)
        assert len(s2.trials) == 5
        s2.optimize(lambda t: t.suggest_float("x", 0, 1) ** 2, n_trials=3)
        assert len(s1.trials) == 8

    @pytest.mark.slow
    def test_concurrent_workers_share_study(self, tmp_path):
        """TWO LIVE OS PROCESSES racing on one sqlite study — the reference's
        actual multi-worker pattern (N Slurm jobs, load_if_exists=True;
        demo/scripts/LoopSubmit.sh:1-35). Asserts no lost or duplicated trial
        numbers, every trial lands in a terminal state with params+reports,
        and the merged study is readable (VERDICT r4 item 4)."""
        import subprocess
        import sys

        db = str(tmp_path / "study.db")
        n_per_worker = 6
        child_src = r"""
import random
import sys
import time

import jax

# env vars alone are overridden by the axon sitecustomize (CLAUDE.md); the
# config update — BEFORE any backend use — is what actually pins CPU. The
# tuner itself is host-only, but vprint's rank gating calls
# jax.process_index(), which would otherwise initialize the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, sys.argv[3])
from ptyrad_tpu.engine.tuner import RandomSampler, Study

db, seed = sys.argv[1], int(sys.argv[2])
study = Study("shared", db, sampler=RandomSampler(seed))

def objective(trial):
    x = trial.suggest_float("x", -1.0, 1.0)
    for step in range(1, 4):
        trial.report(abs(x) + 1.0 / step, step)
        time.sleep(random.random() * 0.02)  # interleave the two writers
    return (x - 0.2) ** 2

study.optimize(objective, n_trials=%d)
print("worker done", len(study.trials))
""" % n_per_worker
        import os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"  # workers must never touch the TPU tunnel
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", child_src, db, str(seed), repo],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
            )
            for seed in (0, 1)
        ]
        # generous: each child pays a full jax import on a contended 1-CPU host
        outs = [p.communicate(timeout=600) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"

        merged = tuner.create_study("shared", storage_path=db)
        trials = merged.trials
        assert len(trials) == 2 * n_per_worker
        numbers = [t["number"] for t in trials]
        assert len(set(numbers)) == len(numbers), f"duplicated trial ids: {numbers}"
        assert all(t["state"] == "COMPLETE" for t in trials)
        assert all("x" in t["params"] and len(t["reports"]) == 3 for t in trials)
        assert merged.best_trial is not None
        assert merged.best_trial["value"] <= min(t["value"] for t in trials) + 1e-12

    def test_grid_sampler_covers_cartesian_product(self):
        """Two axes of different lengths must yield every combination, not
        just the lockstep diagonal (review r3)."""
        s = tuner.GridSampler()
        spec_a = {"kind": "cat", "choices": ["x", "y"]}
        spec_b = {"kind": "int", "low": 0, "high": 2, "step": 1}
        history = []
        seen = set()
        for t in range(6):
            a = s.sample("a", spec_a, history)
            b = s.sample("b", spec_b, history)
            seen.add((a, b))
            history.append({"params": {"a": a, "b": b}, "state": "COMPLETE", "value": 0.0})
        assert seen == {(a, b) for a in ["x", "y"] for b in [0, 1, 2]}

    def test_hyperband_rejects_degenerate_configs(self):
        with pytest.raises(ValueError):
            tuner.HyperbandPruner(reduction_factor=1)
        with pytest.raises(ValueError):
            tuner.HyperbandPruner(min_resource=0)

    def test_median_pruner(self):
        study = tuner.Study(sampler=tuner.RandomSampler(seed=1),
                            pruner=tuner.MedianPruner(n_startup_trials=2))
        pruned_flags = []

        def objective(trial):
            x = trial.suggest_float("x", 0.0, 1.0)
            for step in range(1, 6):
                trial.report(x * step, step)  # larger x = consistently worse
                if trial.should_prune():
                    pruned_flags.append(trial.number)
                    raise tuner.TrialPruned()
            return x * 5

        study.optimize(objective, n_trials=20)
        states = [t["state"] for t in study.trials]
        assert "PRUNED" in states and "COMPLETE" in states

    def test_failed_trial_does_not_kill_study(self):
        study = tuner.Study(sampler=tuner.RandomSampler(seed=0))

        def objective(trial):
            x = trial.suggest_float("x", 0, 1)
            if trial.number == 1:
                raise RuntimeError("boom")
            return x

        study.optimize(objective, n_trials=4)
        states = [t["state"] for t in study.trials]
        assert states.count("FAILED") == 1
        assert states.count("COMPLETE") == 3

    def test_unknown_sampler_pruner(self):
        with pytest.raises(ValueError):
            tuner.create_study("s", sampler_params={"name": "Bogus"})
        with pytest.raises(ValueError):
            tuner.create_study("s", pruner_params={"name": "Bogus"})


def hypertune_cfg(rng, tmp_path, n_trials=3, niter=2, tune_over=None):
    tune = {name: {"state": False, "suggest": "float", "kwargs": {"low": 0, "high": 1}}
            for name in ["optimizer", "batch_size", "plr", "oalr", "oplr", "slr", "tlr",
                         "dzlr", "dx", "pmode_max", "conv_angle", "defocus", "c3", "c5",
                         "Nlayer", "dz", "scale", "asymmetry", "rotation", "shear",
                         "tilt_y", "tilt_x"]}
    tune.update(tune_over or {})
    return {
        "init_params": base_init_params(rng),
        "model_params": {
            "optimizer_params": {"name": "Adam"},
            "update_params": {"objp": {"lr": 2e-3, "start_iter": 1}},
        },
        "loss_params": {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}},
        "recon_params": {
            "NITER": niter, "BATCH_SIZE": {"size": 8}, "SAVE_ITERS": None,
            "output_dir": str(tmp_path / "ht_out"),
        },
        "hypertune_params": {
            "if_hypertune": True, "collate_results": False, "append_params": True,
            "sampler_params": {"name": "RandomSampler", "configs": {"seed": 0}},
            "pruner_params": None, "n_trials": n_trials, "timeout": None,
            "error_metric": "loss",
            "storage_path": str(tmp_path / "ht.db"), "study_name": "test",
            "tune_params": tune,
        },
    }


class TestHypertune:
    def test_staged_reinit_dz(self, rng, tmp_path):
        """Sampling dz must rebuild H and the derived variables."""
        cfg = hypertune_cfg(rng, tmp_path, tune_over={
            "dz": {"state": True, "suggest": "float", "kwargs": {"low": 3.0, "high": 3.0, "step": 1.0}},
        })
        init = Initializer(cfg["init_params"], verbose=False).init_all()
        H_before = init.init_variables["H"].copy()
        study = tuner.Study(sampler=tuner.RandomSampler(seed=0))
        trial = tuner.Trial(study, study.storage.create_trial())
        new_params = apply_trial_params(trial, cfg, init)
        assert trial.params["dz"] == 3.0
        assert init.init_variables["slice_thickness"] == 3.0
        assert not np.allclose(init.init_variables["H"], H_before)

    def test_staged_reinit_lr_and_affine(self, rng, tmp_path):
        cfg = hypertune_cfg(rng, tmp_path, tune_over={
            "oplr": {"state": True, "suggest": "cat", "kwargs": {"choices": [7e-3]}},
            "scale": {"state": True, "suggest": "cat", "kwargs": {"choices": [1.5]}},
        })
        init = Initializer(cfg["init_params"], verbose=False).init_all()
        ext_before = init.init_variables["crop_pos"].max(0) - init.init_variables["crop_pos"].min(0)
        study = tuner.Study(sampler=tuner.RandomSampler(seed=0))
        trial = tuner.Trial(study, study.storage.create_trial())
        new_params = apply_trial_params(trial, cfg, init)
        assert new_params["model_params"]["update_params"]["objp"]["lr"] == 7e-3
        ext_after = init.init_variables["crop_pos"].max(0) - init.init_variables["crop_pos"].min(0)
        assert (ext_after > ext_before).all()

    def test_identity_affine_trial_resets_previous_trial_state(self, rng, tmp_path):
        """A trial sampling exactly the identity affine must still re-run
        init_pos: gating on value != identity leaves the shared Initializer
        holding the PREVIOUS trial's scaled positions (cross-trial
        contamination, review r3)."""
        init = Initializer(base_init_params(rng), verbose=False).init_all()
        baseline = init.init_variables["crop_pos"].copy()

        def one_trial(scale_choice):
            cfg = hypertune_cfg(rng, tmp_path, tune_over={
                "scale": {"state": True, "suggest": "cat",
                          "kwargs": {"choices": [scale_choice]}},
            })
            study = tuner.Study(sampler=tuner.RandomSampler(seed=0))
            trial = tuner.Trial(study, study.storage.create_trial())
            apply_trial_params(trial, cfg, init)

        one_trial(1.5)
        scaled = init.init_variables["crop_pos"].copy()
        assert not np.array_equal(scaled, baseline)
        one_trial(1.0)  # identity — must RESET, not keep the 1.5 positions
        np.testing.assert_array_equal(init.init_variables["crop_pos"], baseline)

    @pytest.mark.slow
    def test_lbfgs_trials_run(self, rng, tmp_path):
        """LBFGS hypertune trials must drive solver.lbfgs_step (train_step is
        None for LBFGS) instead of crashing in the per-batch path
        (review finding r3)."""
        cfg = hypertune_cfg(rng, tmp_path, n_trials=2, niter=2, tune_over={
            "oplr": {"state": True, "suggest": "float",
                     "kwargs": {"low": 1e-2, "high": 1e-1, "log": True}},
        })
        cfg["model_params"]["optimizer_params"] = {"name": "LBFGS"}
        study = run_hypertune(cfg, use_optuna=False)
        done = [t for t in study.trials if t["state"] == "COMPLETE"]
        assert len(done) == 2
        assert all(t["value"] is not None and np.isfinite(t["value"]) for t in done)

    @pytest.mark.slow
    def test_shard_canvas_trials_run(self, rng, tmp_path):
        """Hypertune trials under recon_params.shard_canvas drive the
        scanned store epoch + the jitted constraint bridge (train_epoch is
        None in canvas mode), and collate WHOLE canvases (the gather at the
        end of _run_trial_loop) — not padded row-sharded ones."""
        import glob

        from ptyrad_tpu.parallel.mesh import make_mesh

        cfg = hypertune_cfg(rng, tmp_path, n_trials=2, niter=2, tune_over={
            "oplr": {"state": True, "suggest": "float",
                     "kwargs": {"low": 1e-3, "high": 1e-2, "log": True}},
        })
        # taller canvas so 2 slabs each hold >= one probe height
        cfg["init_params"] = base_init_params(
            rng, n_scans=36, pos_scan_step_size=2.0)
        cfg["recon_params"]["shard_canvas"] = True
        cfg["recon_params"]["save_result"] = ["model", "objp"]
        cfg["constraint_params"] = {"objp_postiv": {"freq": 1, "relax": 0.0}}
        cfg["hypertune_params"]["collate_results"] = True
        study = run_hypertune(cfg, mesh=make_mesh(2), use_optuna=False)
        done = [t for t in study.trials if t["state"] == "COMPLETE"]
        assert len(done) == 2
        assert all(t["value"] is not None and np.isfinite(t["value"])
                   for t in done)
        # collation saved whole-canvas checkpoints
        ckpts = glob.glob(str(tmp_path / "ht_out" / "**" / "model*.hdf5"),
                          recursive=True)
        assert len(ckpts) == 2

    def test_run_hypertune_end_to_end(self, rng, tmp_path):
        cfg = hypertune_cfg(rng, tmp_path, n_trials=3, niter=2, tune_over={
            "oplr": {"state": True, "suggest": "float", "kwargs": {"low": 1e-3, "high": 1e-2, "log": True}},
        })
        study = run_hypertune(cfg, use_optuna=False)
        done = [t for t in study.trials if t["state"] == "COMPLETE"]
        assert len(done) == 3
        assert all(t["value"] is not None and np.isfinite(t["value"]) for t in done)
        assert all("oplr" in t["params"] for t in done)
        assert os.path.exists(str(tmp_path / "ht.db"))


class TestVisualization:
    @pytest.mark.slow
    def test_plot_summary_writes_pngs(self, rng, tmp_path):
        from ptyrad_tpu.engine.solver import PtyRADSolver
        from ptyrad_tpu.visualization import plot_summary

        init = Initializer(base_init_params(rng), verbose=False).init_all()
        cfg = {
            "model_params": {"update_params": {"objp": {"lr": 1e-3, "start_iter": 1}}},
            "recon_params": {"NITER": 2, "BATCH_SIZE": {"size": 8}},
        }
        solver = PtyRADSolver(cfg, init_variables=init.init_variables, verbose=False)
        solver.run()
        out = str(tmp_path / "figs")
        plot_summary(
            out, solver.params, solver.buffers, solver.geom, solver.history,
            2, solver.indices,
            selected_figs=["loss", "forward", "probe_r_amp", "probe_k_phase", "pos", "dz", "tilt_avg"],
            init_variables=init.init_variables,
        )
        files = os.listdir(out)
        for name in ("loss", "forward", "probe_r_amp", "probe_k_phase", "pos", "dz", "tilt_avg"):
            assert any(f"summary_{name}" in f for f in files), f"missing {name}: {files}"

    def test_plot_summary_reference_aliases(self, rng, tmp_path):
        """selected_figs 'all' enables every figure and 'slice_thickness'
        maps to the dz plot (reference visualization.py:438-518 — review r4)."""
        from ptyrad_tpu.engine.solver import PtyRADSolver
        from ptyrad_tpu.visualization import plot_summary

        init = Initializer(base_init_params(rng), verbose=False).init_all()
        cfg = {
            "model_params": {"update_params": {"objp": {"lr": 1e-3, "start_iter": 1}}},
            "recon_params": {"NITER": 2, "BATCH_SIZE": {"size": 8}},
        }
        solver = PtyRADSolver(cfg, init_variables=init.init_variables, verbose=False)
        solver.run()
        out = str(tmp_path / "figs_all")
        plot_summary(out, solver.params, solver.buffers, solver.geom,
                     solver.history, 2, solver.indices,
                     selected_figs=["all"], init_variables=init.init_variables)
        files = os.listdir(out)
        for name in ("loss", "forward", "probe_k_phase", "pos", "dz"):
            assert any(f"summary_{name}" in f for f in files), (name, files)

        out2 = str(tmp_path / "figs_dz")
        plot_summary(out2, solver.params, solver.buffers, solver.geom,
                     solver.history, 2, solver.indices,
                     selected_figs=["slice_thickness"])
        assert any("summary_dz" in f for f in os.listdir(out2))

    def test_individual_plots(self, rng):
        import matplotlib.pyplot as plt

        from ptyrad_tpu.visualization import (
            plot_affine_transformation,
            plot_loss_curves,
            plot_obj_tilts,
            plot_pos_grouping,
            plot_scan_positions,
            plot_sigmoid_mask,
        )

        figs = [
            plot_loss_curves([(i, 1.0 / (i + 1)) for i in range(20)]),
            plot_scan_positions(rng.random((16, 2)) * 10, init_pos=rng.random((16, 2)) * 10),
            plot_obj_tilts(rng.random((16, 2)) * 10, rng.standard_normal((16, 2))),
            plot_affine_transformation(1.1, 0.05, 3.0, 1.0),
            plot_pos_grouping(rng.random((32, 2)) * 10, [np.arange(8), np.arange(8, 16)]),
            plot_sigmoid_mask(32, 0.5, 0.05),
        ]
        for f in figs:
            assert f is not None
            plt.close(f)


class TestTunerReviewFixesR3:
    def test_builtin_study_catches_optuna_pruned(self, tmp_path, fake_optuna):
        """When optuna is installed the objective raises optuna's
        TrialPruned; the builtin Study must record PRUNED, not FAILED
        (review r3). Runs against the faithful optuna double (the real
        package is not installable offline — fake_optuna fixture)."""
        optuna = fake_optuna

        def objective(trial):
            trial.report(1.0, 1)
            raise optuna.exceptions.TrialPruned()

        study = tuner.Study(sampler=tuner.RandomSampler(seed=0))
        study.optimize(objective, n_trials=2)
        assert [t["state"] for t in study.trials] == ["PRUNED", "PRUNED"]
        assert all(t["value"] == 1.0 for t in study.trials)

    def test_random_step_snap_clamped(self):
        s = tuner.RandomSampler(seed=0)
        spec = {"kind": "float", "low": 0.0, "high": 1.0, "step": 0.6}
        vals = {s.sample("x", spec, []) for _ in range(200)}
        assert all(0.0 <= v <= 1.0 for v in vals)

    def test_grid_axis_respects_bounds_and_log(self):
        g = tuner.GridSampler()
        lin = g._axis("a", {"kind": "float", "low": 0.0, "high": 1.0, "step": 0.6})
        assert max(lin) <= 1.0 + 1e-12
        lg = g._axis("b", {"kind": "float", "low": 1e-5, "high": 1e-1, "log": True})
        assert min(lg) == pytest.approx(1e-5) and max(lg) == pytest.approx(1e-1)
        # geometric: half the points below the geometric midpoint
        assert sum(v < 1e-3 for v in lg) == 5

    def test_load_if_exists_false_clears_only_this_study(self, tmp_path):
        db = str(tmp_path / "shared.db")
        a = tuner.create_study("A", db)
        a.storage.create_trial()
        b = tuner.create_study("B", db, load_if_exists=False)
        assert len(a.storage.all_trials()) == 1  # study A untouched
        b2 = tuner.create_study("B", db, load_if_exists=False)
        assert len(b2.storage.all_trials()) == 0

    def test_grid_int_log_axis_yields_deduped_ints(self):
        """suggest_int(log=True) on a grid axis must record the int actually
        used — rounded and deduped, not raw geometric floats (review r4)."""
        g = tuner.GridSampler()
        ax = g._axis("n", {"kind": "int", "low": 1, "high": 64, "log": True})
        assert all(isinstance(v, int) for v in ax)
        assert len(set(ax)) == len(ax) and ax == sorted(ax)
        assert ax[0] == 1 and ax[-1] == 64

    def test_storage_path_none_means_in_memory(self):
        """schema allows storage_path: null (reference passes storage=None to
        optuna for an in-memory study); the builtin engine and the optuna
        branch must both accept it (review r4)."""
        from ptyrad_tpu.params.schema import HypertuneParams

        hp = HypertuneParams(storage_path=None)
        assert hp.storage_path is None
        study = tuner.create_study("mem", None)
        assert study.storage.path is None

    def test_log_space_low_zero_rejected(self):
        study = tuner.Study(sampler=tuner.RandomSampler(seed=0))
        trial = tuner.Trial(study, study.storage.create_trial())
        with pytest.raises(ValueError, match="low > 0"):
            trial.suggest_float("dz", 0.0, 2.0, log=True)


@pytest.fixture
def fake_optuna(monkeypatch):
    """Install the faithful optuna stand-in (tests/fake_optuna.py) so the
    optuna branches of run_hypertune/_suggest/trial.report execute. optuna
    itself is not installable offline; the double mirrors the 3.x semantics
    the integration relies on (see fake_optuna docstring)."""
    import sys

    import fake_optuna as fo

    fo._STUDIES.clear()
    mod = fo.make_module()
    monkeypatch.setitem(sys.modules, "optuna", mod)
    monkeypatch.setitem(sys.modules, "optuna.samplers", mod.samplers)
    monkeypatch.setitem(sys.modules, "optuna.pruners", mod.pruners)
    monkeypatch.setitem(sys.modules, "optuna.exceptions", mod.exceptions)
    return mod


class TestOptunaBranch:
    def test_run_hypertune_optuna_end_to_end(self, rng, tmp_path, fake_optuna):
        """The optuna code path (sampler/pruner by name, sqlite URL, suggest,
        study.optimize, best_trial) runs end to end against the double."""
        cfg = hypertune_cfg(rng, tmp_path, n_trials=3, niter=2, tune_over={
            "oplr": {"state": True, "suggest": "float",
                     "kwargs": {"low": 1e-3, "high": 1e-2, "log": True}},
        })
        cfg["hypertune_params"]["sampler_params"] = {"name": "TPESampler", "configs": {"seed": 0}}
        study = run_hypertune(cfg, use_optuna=True)
        assert isinstance(study, fake_optuna.Study)
        assert study.storage.startswith("sqlite:///")
        states = [t.state for t in study.trials]
        assert states == ["COMPLETE"] * 3
        assert all("oplr" in t.params and 1e-3 <= t.params["oplr"] <= 1e-2
                   for t in study.trials)
        assert np.isfinite(study.best_trial.value)

    def test_optuna_pruner_reports_intermediates(self, rng, tmp_path, fake_optuna):
        """With pruner_params set, the objective reports per-iteration errors
        through trial.report (the optuna pruning contract)."""
        cfg = hypertune_cfg(rng, tmp_path, n_trials=2, niter=3, tune_over={
            "oplr": {"state": True, "suggest": "float",
                     "kwargs": {"low": 1e-3, "high": 1e-2, "log": True}},
        })
        cfg["hypertune_params"]["pruner_params"] = {
            "name": "MedianPruner", "configs": {"n_startup_trials": 5}}
        study = run_hypertune(cfg, use_optuna=True)
        for t in study.trials:
            assert set(t.intermediate_values) == {1, 2, 3}

    @pytest.mark.slow
    def test_diverging_trial_does_not_kill_optuna_study(self, rng, tmp_path, fake_optuna):
        """One diverging trial (huge SGD lr -> inf loss -> FloatingPointError)
        must be recorded as failed while the study keeps optimizing — the
        catch=(FloatingPointError,) run_hypertune passes. The reference has
        the abort bug (study.optimize without catch,
        reconstruction.py:234)."""
        cfg = hypertune_cfg(rng, tmp_path, n_trials=4, niter=3, tune_over={
            "oalr": {"state": True, "suggest": "cat",
                     "kwargs": {"choices": [1e22, 1e-4]}},
        })
        cfg["model_params"]["optimizer_params"] = {"name": "SGD"}
        study = run_hypertune(cfg, use_optuna=True)
        states = [t.state for t in study.trials]
        assert len(states) == 4, "study aborted early — catch= missing"
        assert "FAIL" in states, f"no trial diverged (states={states}); tighten the lr"
        assert "COMPLETE" in states
        # without catch the same study DOES abort (optuna semantics)
        fake_optuna.create_study.__globals__["_STUDIES"].clear()
        from ptyrad_tpu.engine.hypertune import Initializer as _Init, hypertune_objective
        init = _Init(cfg["init_params"], verbose=False)
        init.init_all()
        bare = fake_optuna.create_study(
            study_name="bare", storage=None,
            sampler=fake_optuna.samplers.RandomSampler(seed=0))
        with pytest.raises(FloatingPointError):
            for _ in range(8):
                bare.optimize(lambda t: hypertune_objective(t, cfg, init), n_trials=1)


class TestTunerReviewFixesR5:
    def test_suggest_int_log_requires_positive_low(self, tmp_path):
        """suggest_int(log=True, low=0) must raise a pointed ValueError at
        the search-space definition — not die in math.log inside the sampler
        and burn the whole trial budget on opaque FAILED trials (review r5;
        suggest_float already had this guard)."""
        study = tuner.Study(sampler=tuner.RandomSampler(seed=0))

        def objective(trial):
            return float(trial.suggest_int("n", 0, 64, log=True))

        study.optimize(objective, n_trials=1)
        (t,) = study.trials
        assert t["state"] == "FAILED"
        # and calling the suggest directly names the problem
        trial = tuner.Trial(study, study.storage.create_trial())
        with pytest.raises(ValueError, match="requires low > 0"):
            trial.suggest_int("n", 0, 64, log=True)

    def test_grid_endpoint_survives_large_magnitude_axes(self):
        """The grid's high endpoint must not be dropped when one ulp of
        accumulated float error exceeds an absolute 1e-12 (|high| ~ 1e6):
        the filter tolerance is relative and near-endpoint values clamp to
        high (review r5)."""
        g = tuner.GridSampler()
        ax = g._axis("x", {"kind": "float", "low": 0.0, "high": 1e6})
        assert len(ax) == 10
        assert ax[-1] == 1e6
        # clamping never pushes a value past high
        assert all(v <= 1e6 for v in ax)
