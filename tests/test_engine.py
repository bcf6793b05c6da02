"""Engine tests: batching, optimizer gating, solver convergence, sharding parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptyrad_tpu.engine.batching import make_batches, pad_batches, select_scan_indices
from ptyrad_tpu.engine.solver import PtyRADSolver, build_train_step
from ptyrad_tpu.models import forward, make_model
from ptyrad_tpu.optim import create_optimizer, mask_unstarted_grads, parse_update_params
from ptyrad_tpu.parallel.mesh import data_sharding, make_mesh, shard_model
from ptyrad_tpu.physics import make_stem_probe, near_field_evolution
from ptyrad_tpu.physics.constants import electron_wavelength


# ---------------------------------------------------------------------------
# Synthetic workload: simulate measurements from a known object
# ---------------------------------------------------------------------------

def make_synthetic(rng, grid=6, npix=32, step=3, phase_amp=0.3):
    lam = electron_wavelength(80.0)
    dx = 0.3
    probe = make_stem_probe({"kv": 80.0, "conv_angle": 24.9, "Npix": npix, "dx": dx, "df": 30.0})
    canvas = grid * step + npix + 6
    ys, xs = np.meshgrid(np.arange(grid) * step, np.arange(grid) * step, indexing="ij")
    crop_pos = np.stack([ys.ravel() + 3, xs.ravel() + 3], -1).astype(np.int32)

    yy, xx = np.mgrid[0:canvas, 0:canvas].astype(np.float64)
    true_phase = np.zeros((canvas, canvas))
    for _ in range(15):
        cy, cx = rng.integers(8, canvas - 8, 2)
        true_phase += phase_amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 6.0)
    true_obj = np.exp(1j * true_phase)[None, None].astype(np.complex64)

    base = {
        "obj": true_obj,
        "probe": probe[None],
        "probe_pos_shifts": np.zeros((grid * grid, 2), np.float32),
        "obj_tilts": np.zeros((1, 2), np.float32),
        "slice_thickness": 2.0,
        "H": near_field_evolution((npix, npix), dx, 2.0, lam),
        "measurements": np.zeros((grid * grid, npix, npix), np.float32),
        "crop_pos": crop_pos,
        "omode_occu": np.ones(1, np.float32),
        "dx": dx,
        "lambd": lam,
        "N_scan_slow": grid,
        "N_scan_fast": grid,
    }
    params, buffers, geom = make_model(base)
    dp, _ = jax.jit(lambda p, i: forward(p, buffers, geom, i))(
        params, jnp.arange(grid * grid)
    )
    meas = np.asarray(dp)
    recon_init = dict(base)
    recon_init["obj"] = np.ones_like(true_obj)
    recon_init["measurements"] = meas
    return recon_init, true_phase


class TestIndices:
    def test_full(self):
        assert np.array_equal(select_scan_indices(4, 5), np.arange(20))

    def test_center(self):
        idx = select_scan_indices(4, 4, 2, 2, mode="center")
        assert np.array_equal(idx, [5, 6, 9, 10])

    def test_sub(self):
        idx = select_scan_indices(4, 4, 2, 2, mode="sub")
        assert np.array_equal(idx, [0, 3, 12, 15])

    def test_bad_mode(self):
        with pytest.raises(ValueError):
            select_scan_indices(4, 4, mode="bogus")

    def test_single_subscan_dim_defaults_independently(self):
        """Giving just one subscan dim must default the other, not crash
        with int-minus-None (review r3)."""
        idx = select_scan_indices(4, 4, subscan_slow=2, mode="center")
        assert idx.shape == (2 * 2,)  # fast defaulted to 4//2
        idx = select_scan_indices(4, 4, subscan_fast=2, mode="sub")
        assert idx.shape == (2 * 2,)


class TestBatches:
    @pytest.mark.parametrize("mode", ["random", "compact", "sparse"])
    def test_partition_property(self, rng, mode):
        pos = rng.random((64, 2)) * 100
        indices = np.arange(64)
        batches = make_batches(indices, pos, 8, mode=mode, seed=0)
        flat = np.sort(np.concatenate(batches))
        assert np.array_equal(flat, indices)

    def test_compact_degenerate_positions_no_empty_batches(self):
        """Identical scan positions collapse k-means clusters; compact mode
        must drop empty clusters instead of handing pad_batches a
        zero-length batch (IndexError at prepare time — review r3)."""
        pos = np.zeros((16, 2))
        batches = make_batches(np.arange(16), pos, 4, mode="compact", seed=0)
        assert all(len(b) for b in batches)
        assert np.array_equal(np.sort(np.concatenate(batches)), np.arange(16))
        idx, mask = pad_batches(batches)
        assert np.isfinite(idx).all()

    def test_compact_is_spatially_tight(self, rng):
        # compact groups should have smaller intra-group spread than random
        pos = rng.random((128, 2)) * 100
        indices = np.arange(128)

        def mean_spread(batches):
            return np.mean([np.linalg.norm(pos[b] - pos[b].mean(0), axis=1).mean() for b in batches])

        compact = make_batches(indices, pos, 16, mode="compact", seed=0)
        random_b = make_batches(indices, pos, 16, mode="random", seed=0)
        assert mean_spread(compact) < 0.6 * mean_spread(random_b)

    def test_sparse_is_spread_out(self, rng):
        pos = rng.random((64, 2)) * 100
        indices = np.arange(64)
        sparse = make_batches(indices, pos, 8, mode="sparse", seed=0)
        compact = make_batches(indices, pos, 8, mode="compact", seed=0)

        def min_intra_dist(batches):
            vals = []
            for b in batches:
                if len(b) > 1:
                    d = np.linalg.norm(pos[b][:, None] - pos[b][None], axis=-1)
                    np.fill_diagonal(d, np.inf)
                    vals.append(d.min())
            return np.mean(vals)

        assert min_intra_dist(sparse) > min_intra_dist(compact)

    def test_sparse_degenerate_positions(self):
        # all scan positions coincide -> every k-means centroid resolves to
        # the same nearest position; seeds must still be distinct
        # (regression: ADVICE r1 — duplicate seed tripped the final assert)
        pos = np.zeros((32, 2))
        indices = np.arange(32)
        batches = make_batches(indices, pos, 8, mode="sparse", seed=0)
        flat = np.sort(np.concatenate(batches))
        np.testing.assert_array_equal(flat, indices)

    def test_pad_batches(self):
        batches = [np.array([1, 2, 3]), np.array([4, 5]), np.array([6])]
        idx, mask = pad_batches(batches, multiple_of=4)
        assert idx.shape == (3, 4)
        np.testing.assert_array_equal(mask.sum(axis=1), [3, 2, 1])
        np.testing.assert_array_equal(idx[2], [6, 6, 6, 6])


class TestOptim:
    def test_parse_update_params(self):
        lr, start = parse_update_params({"obja": {"lr": 1e-3, "start_iter": 5}})
        assert lr["obja"] == 1e-3 and start["obja"] == 5
        assert lr["probe"] == 0.0

    def test_zero_lr_leaves_frozen(self, rng):
        init, _ = make_synthetic(rng)
        params, buffers, geom = make_model(init)
        tx, state, _, start = create_optimizer(
            {"name": "Adam"}, {"objp": {"lr": 1e-2, "start_iter": 1}}, params
        )
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert float(jnp.abs(updates.obja).max()) == 0.0       # frozen
        assert float(jnp.abs(updates.probe.re).max()) == 0.0   # frozen
        assert float(jnp.abs(updates.objp).max()) > 0.0        # active

    def test_start_iter_gating(self, rng):
        init, _ = make_synthetic(rng)
        params, _, _ = make_model(init)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        _, start = parse_update_params(
            {"objp": {"lr": 1, "start_iter": 10}, "obja": {"lr": 1, "start_iter": 1}}
        )
        g5 = mask_unstarted_grads(grads, jnp.asarray(5), start)
        assert float(jnp.abs(g5.objp).max()) == 0.0
        assert float(jnp.abs(g5.obja).max()) == 1.0
        g10 = mask_unstarted_grads(grads, jnp.asarray(10), start)
        assert float(jnp.abs(g10.objp).max()) == 1.0

    def test_never_start(self, rng):
        init, _ = make_synthetic(rng)
        params, _, _ = make_model(init)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        _, start = parse_update_params({"objp": {"lr": 1, "start_iter": None}})
        g = mask_unstarted_grads(grads, jnp.asarray(100), start)
        assert float(jnp.abs(g.objp).max()) == 0.0

    def test_unknown_optimizer_rejected(self, rng):
        init, _ = make_synthetic(rng)
        params, _, _ = make_model(init)
        with pytest.raises(ValueError):
            create_optimizer({"name": "Bogus"}, {}, params)

    def test_torch_named_configs_translate(self, rng):
        """Reference params files carry torch.optim kwargs ('see pytorch docs
        for configs', reference demo ymls): betas must map to b1/b2, torch-only
        keys must be dropped with a warning — not TypeError at build time."""
        init, _ = make_synthetic(rng)
        params, _, _ = make_model(init)
        tx, state, _, _ = create_optimizer(
            {"name": "Adam",
             "configs": {"betas": [0.5, 0.9], "eps": 1e-7, "amsgrad": True}},
            {"objp": {"lr": 1e-2, "start_iter": 1}}, params,
        )
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert np.isfinite(float(jnp.abs(updates.objp).max()))

    def test_lbfgs_torch_configs_build(self, rng):
        """LBFGS with the reference's torch configs (lr, history_size,
        max_iter) builds: lr is FORCED to the min nonzero per-tensor lr like
        the reference (reconstruction.py:348-352), history_size maps to
        memory_size, max_iter (torch-only) is dropped."""
        init, _ = make_synthetic(rng)
        params, _, _ = make_model(init)
        tx, state, lr_dict, _ = create_optimizer(
            {"name": "LBFGS",
             "configs": {"lr": 123.0, "history_size": 7, "max_iter": 4}},
            {"objp": {"lr": 1e-2, "start_iter": 1}}, params,
        )
        assert lr_dict["objp"] == 1e-2
        assert state is not None

    def test_full_torch_optim_registry(self, rng):
        """Reference contract: ANY torch.optim name instantiates
        (reference reconstruction.py:285-368). Every public torch.optim 2.x
        optimizer name must be mapped, build, and yield finite updates."""
        import torch.optim as to

        from ptyrad_tpu.optim import OPTIMIZER_REGISTRY

        torch_names = [n for n in dir(to) if n[0].isupper() and n != "Optimizer"]
        missing = [n for n in torch_names if n not in OPTIMIZER_REGISTRY]
        assert not missing, f"torch.optim names unmapped: {missing}"

        init, _ = make_synthetic(rng)
        params, _, _ = make_model(init)
        upd = {"objp": {"lr": 1e-3, "start_iter": 1}}
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        for name in torch_names:
            if name == "LBFGS":
                continue  # extra-args linesearch API; covered by its own tests
            tx, st, _, _ = create_optimizer({"name": name}, upd, params)
            updates, _ = tx.update(grads, st, params)
            assert np.isfinite(float(jnp.abs(updates.objp).max())), name

    def test_asgd_matches_torch(self):
        """_asgd replicates torch.optim.ASGD's parameter trajectory (eta
        schedule + lambd decay coupling) to f32 tolerance over 5 steps."""
        import torch

        from ptyrad_tpu.optim import _asgd

        x0 = np.linspace(0.5, 1.5, 8).astype(np.float32)
        g = np.linspace(-1.0, 1.0, 8).astype(np.float32)
        xt = torch.tensor(x0, requires_grad=True)
        opt = torch.optim.ASGD([xt], lr=0.1, lambd=1e-2, alpha=0.75)
        for _ in range(5):
            xt.grad = torch.tensor(g)
            opt.step()

        tx = _asgd(0.1, lambd=1e-2, alpha=0.75)
        x = jnp.asarray(x0)
        st = tx.init(x)
        for _ in range(5):
            u, st = tx.update(jnp.asarray(g), st, x)
            x = x + u
        np.testing.assert_allclose(np.asarray(x), xt.detach().numpy(), rtol=1e-5)

    def test_rprop_torch_configs_translate(self, rng):
        """torch Rprop's etas/step_sizes kwargs map onto optax.rprop's
        eta_minus/eta_plus/min_step_size/max_step_size."""
        init, _ = make_synthetic(rng)
        params, _, _ = make_model(init)
        tx, st, _, _ = create_optimizer(
            {"name": "Rprop",
             "configs": {"etas": (0.4, 1.3), "step_sizes": (1e-5, 10.0)}},
            {"objp": {"lr": 1e-3, "start_iter": 1}}, params,
        )
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, st, params)
        assert np.isfinite(float(jnp.abs(updates.objp).max()))

    def test_adam_weight_decay_couples_like_torch(self, rng):
        """torch Adam's weight_decay is COUPLED L2 (grad += wd*param before
        moment estimation); optax.adam has no such kwarg, so the translation
        must chain add_decayed_weights instead of silently dropping the
        regularization a reference config asks for (review r4)."""
        init, _ = make_synthetic(rng)
        params, _, _ = make_model(init)
        upd = {"obja": {"lr": 1e-2, "start_iter": 1}}  # obja starts at 1.0
        tx_wd, st_wd, _, _ = create_optimizer(
            {"name": "Adam", "configs": {"weight_decay": 0.5}}, upd, params)
        tx0, st0, _, _ = create_optimizer({"name": "Adam"}, upd, params)
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        u_wd, _ = tx_wd.update(grads, st_wd, params)
        u0, _ = tx0.update(grads, st0, params)
        # zero grads: decay-coupled Adam normalizes wd*param to a full step,
        # plain Adam moves nothing
        assert float(jnp.abs(u0.obja).max()) == 0.0
        assert float(jnp.abs(u_wd.obja).max()) > 0.0

    def test_adamw_decay_respects_start_iter(self, rng):
        """Decoupled weight decay (AdamW) emits -lr*wd*param even for zero
        grads; the train step must mask UPDATES (not just grads) so tensors
        whose start_iter hasn't arrived stay bit-identical (the reference
        freezes via requires_grad, skipping them entirely)."""
        init, _ = make_synthetic(rng)
        params, buffers, geom = make_model(init)
        tx, state, _, start = create_optimizer(
            {"name": "AdamW", "configs": {"weight_decay": 0.5}},
            {"objp": {"lr": 1e-2, "start_iter": 1},
             "obja": {"lr": 1e-2, "start_iter": 50}}, params,
        )
        train_step, _ = build_train_step(
            buffers, geom,
            {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}},
            tx, start,
        )
        obja_before = np.asarray(params.obja).copy()
        objp_before = np.asarray(params.objp).copy()
        idx = jnp.arange(12)
        mask = jnp.ones(12, jnp.float32)
        params2, *_ = train_step(params, state, idx, mask, jnp.asarray(1, jnp.int32))
        np.testing.assert_array_equal(np.asarray(params2.obja), obja_before)
        assert np.abs(np.asarray(params2.objp) - objp_before).max() > 0  # active one moved

    def test_epoch_batch_order_shuffles_per_iteration(self, rng):
        """The reference shuffles batch ORDER every iteration
        (reconstruction.py:1059 shuffle(batches)); the loop must feed the
        epoch a different, niter-seeded permutation each iteration —
        deterministic across reruns (multi-process ranks must agree)."""
        from ptyrad_tpu.engine.solver import recon_loop

        init, _ = make_synthetic(rng)
        params, buffers, geom = make_model(init)
        n_batches, bsz = 6, 6
        batch_idx = np.arange(36, dtype=np.int32).reshape(n_batches, bsz)
        batch_mask = np.ones((n_batches, bsz), np.float32)

        def run(n_iter):
            seen = []

            def spy_epoch(p, s, idx, mask, niter):
                seen.append(np.asarray(idx).copy())
                terms = {"loss_single": jnp.full((idx.shape[0],), 0.1, jnp.float32)}
                return p, s, jnp.asarray(0.1), terms

            recon_loop(None, params, None, batch_idx, batch_mask, n_iter,
                       None, buffers, verbose=False, train_epoch=spy_epoch)
            return seen

        seen = run(3)
        orders = [tuple(b[:, 0]) for b in seen]
        assert len(set(orders)) > 1  # order changes across iterations
        for b in seen:  # every batch present exactly once, rows intact
            assert sorted(b.ravel().tolist()) == list(range(36))
        assert [o.tolist() for o in run(3)] == [o.tolist() for o in seen]  # reproducible


def solver_params(niter=30, lr=5e-3, group="random", batch=12, optimizer="Adam", extra=None):
    d = {
        "model_params": {
            "optimizer_params": {"name": optimizer},
            "update_params": {"objp": {"lr": lr, "start_iter": 1},
                              "obja": {"lr": lr, "start_iter": 1}},
        },
        "loss_params": {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}},
        "constraint_params": {"objp_postiv": {"freq": 1, "relax": 0.0}},
        "recon_params": {"NITER": niter, "BATCH_SIZE": {"size": batch}, "GROUP_MODE": group},
    }
    if extra:
        d.update(extra)
    return d


def phase_corr(params, true_phase, margin=10):
    """Correlation of the recovered phase with ground truth — the convergence
    gate (a loss-ratio gate would pass a half-broken optimizer)."""
    rec = np.asarray(params.objp)[0, 0, margin:-margin, margin:-margin].ravel()
    tru = true_phase[margin:-margin, margin:-margin].ravel()
    return np.corrcoef(rec, tru)[0, 1]


class TestMultihostLaunch:
    def test_init_multihost_plumbs_manual_args(self, monkeypatch):
        """init_multihost must forward manual coordinator args to
        jax.distributed.initialize and auto-discover with none (the pod
        itself is untestable here; the plumbing is)."""
        from ptyrad_tpu.parallel import mesh as M

        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        idx, count = M.init_multihost("10.0.0.1:1234", 4, 0)
        assert (idx, count) == (0, 4)
        assert calls[-1] == {"coordinator_address": "10.0.0.1:1234",
                             "num_processes": 4, "process_id": 0}
        M.init_multihost()
        assert calls[-1] == {}

    def test_cli_multihost_flag_calls_init(self, monkeypatch):
        import argparse

        from ptyrad_tpu import cli as C
        from ptyrad_tpu.parallel import mesh as M

        called = []
        monkeypatch.setattr(M, "init_multihost",
                            lambda **kw: (called.append(kw), (0, 2))[1])
        args = argparse.Namespace(multihost=True, coordinator_address="h:1",
                                  num_processes=2, process_id=1)
        C._maybe_init_multihost(args)
        assert called == [{"coordinator_address": "h:1", "num_processes": 2,
                           "process_id": 1}]
        C._maybe_init_multihost(argparse.Namespace(multihost=False))
        assert len(called) == 1

    def test_cli_export_meas_init_flags(self, rng, tmp_path, monkeypatch):
        """--output/--reshape/--append mirror the reference export contract
        (reference cli.py:45-82): path decomposes into dir/name/format,
        reshape applies, append_shape defaults off (review r4)."""
        import argparse

        import h5py

        from ptyrad_tpu import cli as C
        from test_init_io import base_init_params

        p = {"init_params": base_init_params(rng)}
        monkeypatch.setattr(C, "load_params", lambda *a, **k: p, raising=False)
        import ptyrad_tpu.load as L

        monkeypatch.setattr(L, "load_params", lambda *a, **k: p)
        out = tmp_path / "exports" / "my_meas.mat"
        args = argparse.Namespace(
            params_path="ignored.yml", skip_validate=True,
            output=str(out), reshape=[4, 4, 32, 32], append=False,
        )
        C.cmd_export_meas_init(args)
        assert out.exists()
        with h5py.File(out, "r") as hf:
            assert hf["meas"].shape == (4, 4, 32, 32)

    def test_cli_jobid_zero_no_log_prefix(self):
        """The default jobid '0' must not prefix the log file name
        (reference common.py:165 gates on jobid != 0 — review r4)."""
        from ptyrad_tpu.cli import _jobid_prefix

        assert _jobid_prefix("0") == ""
        assert _jobid_prefix(0) == ""
        assert _jobid_prefix(None) == ""
        assert _jobid_prefix("2") == "2"


class TestMosaicErrorMatcher:
    def test_compile_stage_signals_match(self):
        m = PtyRADSolver._mosaic_vmem_error
        assert m(RuntimeError(
            "Ran out of memory in memory space vmem while allocating on stack"))
        assert m(RuntimeError("Scoped allocation ... exceeded scoped vmem limit"))
        assert m(RuntimeError("MosaicError: INTERNAL: remote_compile failed"))

    def test_runtime_hbm_oom_does_not_match(self):
        """A runtime HBM OOM must NOT trigger the kernels-off retry: the
        donated params/opt_state buffers are already consumed, so the retry
        would die on deleted arrays and mask the real error (review r3)."""
        m = PtyRADSolver._mosaic_vmem_error
        assert not m(RuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory allocating 1073741824 bytes in hbm"))
        assert not m(RuntimeError("loss is nan after vmem kernel"))
        assert not m(RuntimeError("some unrelated failure"))


class TestMixedPrecisionWiring:
    def test_matmul_dtype_reaches_fourier_config(self, rng):
        """model_params.matmul_dtype (reference --mixed_precision) must reach
        ops.fourier.set_matmul_dtype when the solver builds, and reset works."""
        from ptyrad_tpu.ops.fourier import get_matmul_dtype, set_matmul_dtype

        init, _ = make_synthetic(rng)
        cfg = solver_params(niter=1)
        cfg["model_params"]["matmul_dtype"] = "bfloat16"
        solver = PtyRADSolver(cfg, init_variables=init, mesh=None, verbose=False)
        solver.prepare()
        try:
            solver._build()
            assert get_matmul_dtype() == "bfloat16"
        finally:
            set_matmul_dtype("float32", silent=True)

    def test_cli_mixed_precision_flag_sets_dtype(self):
        """--mixed_precision overrides model_params.matmul_dtype (reference
        docs/launch/multiGPU.md:41)."""
        import argparse

        from ptyrad_tpu.cli import _apply_common_overrides

        params = {}
        args = argparse.Namespace(mixed_precision=True)
        _apply_common_overrides(params, args)
        assert params["model_params"]["matmul_dtype"] == "bfloat16"
        assert params["model_params"]["compute_dtype"] == "bfloat16"

    def test_compute_dtype_implies_bf16_gemms(self, rng):
        """compute_dtype='bfloat16' alone must switch the DFT/kernel GEMM
        operand dtype too — that is how the policy reaches both Pallas
        kernel families (they read ops.fourier's setting at trace time)."""
        from ptyrad_tpu.ops.fourier import get_matmul_dtype, set_matmul_dtype

        init, _ = make_synthetic(rng)
        cfg = solver_params(niter=1)
        cfg["model_params"]["compute_dtype"] = "bfloat16"
        solver = PtyRADSolver(cfg, init_variables=init, mesh=None, verbose=False)
        solver.prepare()
        try:
            solver._build()
            assert get_matmul_dtype() == "bfloat16"
            assert solver.geom.compute_dtype == "bfloat16"
        finally:
            set_matmul_dtype("float32", silent=True)


class TestMeasDtype:
    """Reduced-precision measurement storage (schema meas_dtype): the
    dataset dominates HBM at production scale; bf16/f16 storage halves it
    with the loss math still f32 (upcast at the per-batch gather)."""

    def test_bf16_storage_halves_bytes_and_matches_loss(self, rng):
        init, _ = make_synthetic(rng)
        p32, b32, g32 = make_model(init)
        p16, b16, g16 = make_model(init, {"meas_dtype": "bfloat16"})
        assert b16.measurements.dtype == jnp.bfloat16
        assert b16.measurements.nbytes * 2 == b32.measurements.nbytes
        lp = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}
        tx, st, _, start = create_optimizer(
            {"name": "Adam"}, {"objp": {"lr": 1e-2, "start_iter": 1}}, p32)
        _, ev32 = build_train_step(b32, g32, lp, tx, start)
        _, ev16 = build_train_step(b16, g16, lp, tx, start)
        idx, mask = jnp.arange(12), jnp.ones(12, jnp.float32)
        (t32, _), (t16, _) = ev32(p32, idx, mask), ev16(p16, idx, mask)
        assert float(t16) == pytest.approx(float(t32), rel=2e-2)

    def test_f16_solver_still_converges(self, rng):
        init, true_phase = make_synthetic(rng)
        cfg = solver_params(niter=40)
        cfg["model_params"]["meas_dtype"] = "float16"
        solver = PtyRADSolver(cfg, init_variables=init, mesh=None, verbose=False)
        params, _ = solver.run()
        assert solver.buffers.measurements.dtype == jnp.float16
        assert phase_corr(params, true_phase) > 0.8

    def test_schema_accepts_meas_dtype(self):
        from ptyrad_tpu.params.schema import ModelParams

        assert ModelParams(meas_dtype="bfloat16").meas_dtype == "bfloat16"
        with pytest.raises(Exception):
            ModelParams(meas_dtype="int8")

    def test_f16_overflow_clips_with_warning(self, rng):
        # f16 overflows to inf above 65504 — the store must saturate (and
        # say so) instead of silently poisoning the loss with inf -> NaN
        init, _ = make_synthetic(rng)
        init = dict(init)
        meas = np.asarray(init["measurements"], np.float32).copy()
        meas[0, 0, 0] = 1.0e6
        init["measurements"] = meas
        with pytest.warns(UserWarning, match="float16 range"):
            _, b16, _ = make_model(init, {"meas_dtype": "float16"})
        stored = np.asarray(b16.measurements, np.float32)
        assert np.isfinite(stored).all()
        assert stored.max() == pytest.approx(65504.0, rel=1e-3)

    def test_broadcast_str_rejects_overlong(self, monkeypatch):
        # silent truncation would desynchronize the collective save path
        from ptyrad_tpu.parallel import mesh as pmesh

        monkeypatch.setattr(pmesh.jax, "process_count", lambda: 2)
        with pytest.raises(ValueError, match="exceeds max_len"):
            pmesh.broadcast_str("x" * 600)


class TestSolverEndToEnd:
    def test_reconstruction_converges(self, rng):
        init, true_phase = make_synthetic(rng)
        solver = PtyRADSolver(solver_params(niter=40), init_variables=init, mesh=None, verbose=False)
        params, history = solver.run()
        assert phase_corr(params, true_phase) > 0.8

    @pytest.mark.parametrize("group", ["compact", "sparse"])
    def test_grouped_batching_converges(self, rng, group):
        init, true_phase = make_synthetic(rng)
        solver = PtyRADSolver(
            solver_params(niter=25, group=group), init_variables=init, mesh=None, verbose=False
        )
        params, history = solver.run()
        assert phase_corr(params, true_phase) > 0.6

    @pytest.mark.slow
    def test_lbfgs_converges(self, rng):
        init, true_phase = make_synthetic(rng)
        solver = PtyRADSolver(
            solver_params(niter=15, optimizer="LBFGS"), init_variables=init, mesh=None, verbose=False
        )
        params, history = solver.run()
        assert phase_corr(params, true_phase) > 0.5

    @pytest.mark.slow
    def test_lbfgs_microbatched_objective_is_exact_batch_mean(self, rng):
        """The grad-accumulated LBFGS objective (rematerialized lax.scan over
        mini-batches, reference reconstruction.py:697-735) must equal the
        plain mean of per-batch losses — i.e. the scan+remat machinery
        changes memory, not math. (The batch-mean objective itself differs
        from the single-full-batch loss by design, exactly as the
        reference's group-accumulated closure does; convergence of the
        micro-batched path is gated by test_lbfgs_converges.)"""
        import jax

        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn, get_measurements

        init, _ = make_synthetic(rng)
        s = PtyRADSolver(
            solver_params(niter=1, optimizer="LBFGS", batch=12),  # 3 batches
            init_variables=dict(init), verbose=False,
        )
        s.prepare()
        s._build()
        params0 = jax.tree_util.tree_map(lambda x: jnp.array(x), s.params)
        _, _, value = s.lbfgs_step(
            s.params, s.opt_state, jnp.asarray(s.batch_idx), jnp.asarray(s.batch_mask)
        )

        lp = solver_params()["loss_params"]
        totals = []
        for bidx, bmask in zip(s.batch_idx, s.batch_mask):
            dp, (oa, op_) = fwd_fn(params0, s.buffers, s.geom, jnp.asarray(bidx))
            meas = get_measurements(s.buffers, s.geom, jnp.asarray(bidx))
            t, _ = combined_loss(dp, meas, oa, op_, s.buffers.omode_occu, lp,
                                 jnp.asarray(bmask))
            totals.append(float(t))
        assert float(value) == pytest.approx(float(np.mean(totals)), rel=1e-5)

    def test_grad_accumulation_matches_big_batch(self, rng):
        # One step over 2 accumulated half-batches == one step over the full batch
        init, _ = make_synthetic(rng)
        params, buffers, geom = make_model(init)
        upd = {"objp": {"lr": 1e-2, "start_iter": 1}}
        idx_full = jnp.arange(12)
        mask_full = jnp.ones(12, jnp.float32)

        def clone(tree):
            # train_step donates params; keep pristine copies for reuse
            return jax.tree_util.tree_map(lambda x: jnp.array(x), tree)

        tx1, st1, _, start1 = create_optimizer({"name": "SGD"}, upd, params)
        step1, _ = build_train_step(buffers, geom, None, tx1, start1)
        p_full, *_ = step1(clone(params), st1, idx_full, mask_full, jnp.asarray(1))

        tx2, st2, _, start2 = create_optimizer({"name": "SGD"}, upd, params, grad_accumulation=2)
        step2, _ = build_train_step(buffers, geom, None, tx2, start2)
        p_acc, st2b, *_ = step2(clone(params), st2, idx_full[:6], mask_full[:6], jnp.asarray(1))
        p_acc, *_ = step2(p_acc, st2b, idx_full[6:], mask_full[6:], jnp.asarray(1))

        # MultiSteps averages grads over the 2 microbatches; the full-batch loss
        # is the mean of the two half-batch losses only approximately (NRMSE is
        # nonlinear), so compare loosely but require same scale of update
        d_full = np.asarray(p_full.objp) - np.asarray(params.objp)
        d_acc = np.asarray(p_acc.objp) - np.asarray(params.objp)
        assert np.corrcoef(d_full.ravel(), d_acc.ravel())[0, 1] > 0.95


class TestOptStateHdf5Resume:
    def test_resume_from_own_checkpoint_bitwise(self, rng, tmp_path):
        """Adam moments restored from a model.hdf5 written by save_results
        must produce bitwise-identical next-step updates (VERDICT r1 #6;
        reference reconstruction.py:287-368)."""
        import os

        from ptyrad_tpu.optim import load_opt_state_hdf5
        from ptyrad_tpu.save import save_dict_to_hdf5

        init, _ = make_synthetic(rng)
        params, buffers, geom = make_model(init)
        upd = {
            "obja": {"lr": 5e-3, "start_iter": 1},
            "objp": {"lr": 5e-3, "start_iter": 1},
            "probe": {"lr": 1e-4, "start_iter": 1},
        }
        tx, st0, _, start = create_optimizer({"name": "Adam"}, upd, params)
        step, _ = build_train_step(buffers, geom, None, tx, start)

        def clone(tree):
            return jax.tree_util.tree_map(
                lambda x: jnp.array(x) if hasattr(x, "shape") else x, tree
            )

        idx = jnp.arange(12)
        mask = jnp.ones(12, jnp.float32)
        p1, st1, *_ = step(clone(params), clone(st0), idx, mask, jnp.asarray(1))
        p2, st2, *_ = step(p1, st1, idx, mask, jnp.asarray(2))

        # serialize st2 exactly as save.make_save_dict does
        flat, _ = jax.tree_util.tree_flatten_with_path(st2)
        sd = {
            jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat if hasattr(leaf, "shape")
        }
        path = str(tmp_path / "model_iter0002.hdf5")
        save_dict_to_hdf5({"optim_state_dict": sd}, path)

        st2_restored = load_opt_state_hdf5(tx.init(params), path, upd)
        p3a, *_ = step(clone(p2), clone(st2), idx, mask, jnp.asarray(3))
        p3b, *_ = step(clone(p2), st2_restored, idx, mask, jnp.asarray(3))
        np.testing.assert_array_equal(np.asarray(p3a.objp), np.asarray(p3b.objp))
        np.testing.assert_array_equal(np.asarray(p3a.obja), np.asarray(p3b.obja))
        np.testing.assert_array_equal(np.asarray(p3a.probe.re), np.asarray(p3b.probe.re))

    def test_structural_mismatch_raises_not_silent(self, rng, tmp_path):
        """Resuming into a structurally different optimizer (grad
        accumulation wraps every state path in MultiSteps) must raise, not
        silently hand back a fresh state (review finding r2)."""
        from ptyrad_tpu.optim import load_opt_state_hdf5
        from ptyrad_tpu.save import save_dict_to_hdf5

        init, _ = make_synthetic(rng)
        params, buffers, geom = make_model(init)
        upd = {"objp": {"lr": 5e-3, "start_iter": 1}}
        tx, st, _, _ = create_optimizer({"name": "Adam"}, upd, params)
        flat, _ = jax.tree_util.tree_flatten_with_path(st)
        sd = {jax.tree_util.keystr(p): np.asarray(l) for p, l in flat if hasattr(l, "shape")}
        path = str(tmp_path / "m.hdf5")
        save_dict_to_hdf5({"optim_state_dict": sd}, path)

        tx2, st2, _, _ = create_optimizer({"name": "Adam"}, upd, params, grad_accumulation=2)
        with pytest.raises(ValueError, match="mismatch"):
            load_opt_state_hdf5(st2, path, upd)

    def test_canonical_fallback_survives_optax_renames(self, rng, tmp_path):
        """A checkpoint whose keystrs were written by a different optax
        version (internal wrapper paths renamed, same structure) must still
        restore exactly via the canonical-token fallback (VERDICT r2 weak #5:
        keystr coupling to optax internals)."""
        from ptyrad_tpu.optim import load_opt_state_hdf5
        from ptyrad_tpu.save import save_dict_to_hdf5

        init, _ = make_synthetic(rng)
        params, buffers, geom = make_model(init)
        upd = {
            "objp": {"lr": 5e-3, "start_iter": 1},
            "probe": {"lr": 1e-4, "start_iter": 1},
        }
        tx, st, _, start = create_optimizer({"name": "Adam"}, upd, params)
        step, _ = build_train_step(buffers, geom, None, tx, start)
        idx = jnp.arange(12)
        mask = jnp.ones(12, jnp.float32)
        _, st1, *_ = step(params, st, idx, mask, jnp.asarray(1))

        flat, _ = jax.tree_util.tree_flatten_with_path(st1)
        sd = {
            # simulate a hypothetical optax rename of the wrapper path
            jax.tree_util.keystr(p)
            .replace("inner_states", "states")
            .replace("inner_state", "base_state"): np.asarray(l)
            for p, l in flat if hasattr(l, "shape")
        }
        path = str(tmp_path / "renamed.hdf5")
        save_dict_to_hdf5({"optim_state_dict": sd}, path)

        restored = load_opt_state_hdf5(tx.init(params), path, upd)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(st1)[0],
            jax.tree_util.tree_flatten_with_path(restored)[0],
        ):
            if hasattr(a, "shape"):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_solver_load_state_from_hdf5(self, rng, tmp_path):
        """The solver's optimizer_params.load_state accepts a model.hdf5 path."""
        import os

        from ptyrad_tpu.save import save_results

        init, _ = make_synthetic(rng)
        cfg = solver_params(niter=2, batch=999)
        cfg["recon_params"]["save_result"] = ["model", "optim_state"]
        sA = PtyRADSolver(cfg, init_variables=init, verbose=False)
        sA.run()
        out = str(tmp_path / "ck")
        save_results(out, sA.params, sA.buffers, sA.geom, cfg, sA.opt_state,
                     sA.history, 2, sA.indices)
        ckpt = os.path.join(out, "model_iter0002.hdf5")

        cfgB = solver_params(niter=1, batch=999)
        cfgB["model_params"]["optimizer_params"]["load_state"] = ckpt
        sB = PtyRADSolver(cfgB, init_variables=init, verbose=False)
        sB.prepare()
        sB._build()
        # restored moments equal the checkpointed ones, not a fresh zero state
        a = sA.opt_state.inner_states["objp"].inner_state[0]
        b = sB.opt_state.inner_states["objp"].inner_state[0]
        assert int(b.count) == int(a.count) == 2
        np.testing.assert_array_equal(np.asarray(b.mu.objp), np.asarray(a.mu.objp))
        np.testing.assert_array_equal(np.asarray(b.nu.objp), np.asarray(a.nu.objp))


class TestSharding:
    @pytest.mark.slow
    def test_sharded_matches_single_device(self, rng):
        """DDP-equivalence: one train step on an 8-device mesh must match the
        single-device step to float tolerance."""
        init, _ = make_synthetic(rng)
        params, buffers, geom = make_model(init)
        upd = {"objp": {"lr": 1e-2, "start_iter": 1}, "obja": {"lr": 1e-2, "start_iter": 1}}
        idx = jnp.arange(16)
        mask = jnp.ones(16, jnp.float32)

        def clone(tree):
            return jax.tree_util.tree_map(lambda x: jnp.array(x), tree)

        tx, st, _, start = create_optimizer({"name": "Adam"}, upd, params)
        step, _ = build_train_step(buffers, geom, None, tx, start)
        p_single, _, loss_single_dev, _ = step(clone(params), st, idx, mask, jnp.asarray(1))

        mesh = make_mesh(8)
        params_s, buffers_s = shard_model(clone(params), buffers, mesh, shard_measurements=True)
        tx2, st2, _, _ = create_optimizer({"name": "Adam"}, upd, params)
        step_s, _ = build_train_step(buffers_s, geom, None, tx2, start)
        idx_s = jax.device_put(idx, data_sharding(mesh))
        mask_s = jax.device_put(mask, data_sharding(mesh))
        p_shard, _, loss_shard, _ = step_s(params_s, st2, idx_s, mask_s, jnp.asarray(1))

        assert float(loss_single_dev) == pytest.approx(float(loss_shard), rel=1e-5)
        np.testing.assert_allclose(
            np.asarray(p_single.objp), np.asarray(p_shard.objp), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(p_single.probe.re), np.asarray(p_shard.probe.re), atol=1e-6
        )

    @pytest.mark.slow
    @pytest.mark.parametrize("shift_probes", [False, True])
    def test_sharded_fused_kernels_match_single_device(self, rng, shift_probes):
        """With the kernel mesh registered, the fused multislice kernel and the
        Pallas gather/scatter run per-shard under shard_map (interpret mode on
        the CPU mesh) and must match the single-device fused step: batch blocks
        are shard-local, shared probe/H/object cotangents psum over 'data'."""
        from ptyrad_tpu.ops import pallas_multislice as pm
        from ptyrad_tpu.ops import patches as patches_mod
        from ptyrad_tpu.ops.mesh_env import set_kernel_mesh

        init, _ = make_synthetic(rng)
        upd = {
            "objp": {"lr": 1e-2, "start_iter": 1},
            "obja": {"lr": 1e-2, "start_iter": 1},
            "probe": {"lr": 1e-3, "start_iter": 1},
        }
        if shift_probes:
            upd["probe_pos_shifts"] = {"lr": 1e-4, "start_iter": 1}
            # nonzero initial shifts: the data was simulated at zero shift, so
            # starting there leaves the shift gradient at fp-noise level and
            # Adam's normalization amplifies the noise into spurious diffs
            init = dict(init)
            init["probe_pos_shifts"] = rng.uniform(-0.5, 0.5, (36, 2)).astype(np.float32)
        params, buffers, geom = make_model(init, {"update_params": upd})
        assert geom.fwd_fused and geom.shift_probes == shift_probes
        idx = jnp.arange(16)
        mask = jnp.ones(16, jnp.float32)

        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn, get_measurements

        def loss_fn(params, bufs):
            dp, (oa, op_) = fwd_fn(params, bufs, geom, idx)
            meas = get_measurements(bufs, geom, idx)
            total, _ = combined_loss(dp, meas, oa, op_, bufs.omode_occu, None, mask)
            return total

        # raw gradients, not optimizer steps: Adam's normalization turns
        # fp-noise gradient differences at dead pixels into full-step diffs
        pm.set_interpret(True)
        patches_mod.set_interpret(True)
        try:
            loss1, g1 = jax.jit(jax.value_and_grad(loss_fn))(params, buffers)
            loss1, g1 = jax.tree_util.tree_map(np.asarray, (loss1, g1))

            mesh = make_mesh(8)
            set_kernel_mesh(mesh)
            params_s, buffers_s = shard_model(params, buffers, mesh)
            idx_s = jax.device_put(idx, data_sharding(mesh))
            loss8, g8 = jax.jit(jax.value_and_grad(loss_fn))(params_s, buffers_s)
        finally:
            set_kernel_mesh(None)
            pm.set_interpret(False)
            patches_mod.set_interpret(False)

        assert float(loss1) == pytest.approx(float(loss8), rel=1e-5)
        # atol: accumulation order differs (per-shard scatter + psum tree vs
        # one sequential grid), so fp noise ~1e-6 on O(1e-2) gradients is real
        np.testing.assert_allclose(g1.objp, np.asarray(g8.objp), atol=1e-5)
        np.testing.assert_allclose(g1.obja, np.asarray(g8.obja), atol=1e-5)
        # probe grad sums B ramp-rotated spectra (cancellation-heavy), so the
        # psum-tree reorder noise is amplified further
        np.testing.assert_allclose(g1.probe.re, np.asarray(g8.probe.re), atol=5e-5)
        np.testing.assert_allclose(g1.probe.im, np.asarray(g8.probe.im), atol=5e-5)
        if shift_probes:
            np.testing.assert_allclose(
                g1.probe_pos_shifts, np.asarray(g8.probe_pos_shifts), atol=1e-7
            )

    @pytest.mark.slow
    def test_lbfgs_on_mesh_matches_single_device(self, rng):
        """Full-batch LBFGS is supported on a data-parallel mesh: XLA SPMD
        reduces the sharded-measurement gradient, so unlike the reference
        (which must auto-switch LBFGS->Adam under DDP,
        reconstruction.py:118-122) the same optimizer runs unchanged."""
        init, _ = make_synthetic(rng)
        cfg = solver_params(niter=3, optimizer="LBFGS", batch=999)
        s1 = PtyRADSolver(cfg, init_variables=dict(init), verbose=False)
        s1.run()
        s8 = PtyRADSolver(cfg, init_variables=dict(init), n_devices=8, verbose=False)
        s8.run()
        # atol: the sharded remat-scan objective reorders reductions slightly
        np.testing.assert_allclose(
            np.asarray(s1.params.objp), np.asarray(s8.params.objp), atol=5e-5
        )
        l1 = [v for _, v in s1.history.loss_iters]
        l8 = [v for _, v in s8.history.loss_iters]
        np.testing.assert_allclose(l1, l8, rtol=1e-4)

    def test_solver_on_mesh_converges(self, rng):
        init, true_phase = make_synthetic(rng)
        mesh = make_mesh(8)
        solver = PtyRADSolver(
            solver_params(niter=20, batch=16), init_variables=init, mesh=mesh, verbose=False
        )
        params, history = solver.run()
        assert phase_corr(params, true_phase) > 0.6


class TestMosaicVmemFallback:
    def test_reconstruct_degrades_to_xla_path(self, rng, monkeypatch):
        """If Mosaic rejects a kernel at compile time (VMEM heuristic was
        optimistic), reconstruct() must fall back to the XLA path and finish
        instead of crashing (compile failures never consume donated buffers)."""
        import ptyrad_tpu.engine.solver as solver_mod

        init, true_phase = make_synthetic(rng)
        real_loop = solver_mod.recon_loop
        calls = {"n": 0}

        def failing_then_real(*args, **kwargs):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Ran out of scoped vector memory (VMEM) "
                    "while compiling Mosaic kernel"
                )
            return real_loop(*args, **kwargs)

        monkeypatch.setattr(solver_mod, "recon_loop", failing_then_real)
        solver = PtyRADSolver(solver_params(niter=10), init_variables=init, verbose=False)
        params, history = solver.run()
        assert calls["n"] == 2
        assert not solver.geom.fwd_fused
        assert len(history.loss_iters) == 10

    def test_real_errors_still_raise(self, rng, monkeypatch):
        import ptyrad_tpu.engine.solver as solver_mod

        init, _ = make_synthetic(rng)

        def always_fail(*args, **kwargs):
            raise RuntimeError("something unrelated broke")

        monkeypatch.setattr(solver_mod, "recon_loop", always_fail)
        solver = PtyRADSolver(solver_params(niter=2), init_variables=init, verbose=False)
        with pytest.raises(RuntimeError, match="unrelated"):
            solver.run()


class TestNanGuard:
    def test_divergence_halts_loop(self, rng):
        """An exploding learning rate must stop the loop at the first
        non-finite loss instead of running all iterations."""
        from ptyrad_tpu.engine.solver import PtyRADSolver

        init, _ = make_synthetic(rng)
        # a corrupted measurement poisons the loss with NaN at iteration 1
        meas = init["measurements"].copy()
        meas[0, 0, 0] = np.nan
        init["measurements"] = meas
        cfg = solver_params(niter=30)
        solver = PtyRADSolver(cfg, init_variables=init, verbose=False)
        params, history = solver.run()
        losses = [v for _, v in history.loss_iters]
        assert any(not np.isfinite(v) for v in losses)
        assert len(losses) < 30


class TestSolverReviewFixesR3b:
    def test_indices_mode_subscan_keys_respected(self, rng):
        """INDICES_MODE subscan_slow/subscan_fast (the schema's key names)
        must reach select_scan_indices — they were read under a nonexistent
        'subscan' key and silently ignored (review r3)."""
        init, _ = make_synthetic(rng)  # 6x6 scan
        cfg = solver_params(niter=1, extra={
            "recon_params": {"NITER": 1, "BATCH_SIZE": {"size": 8},
                             "INDICES_MODE": {"mode": "center",
                                              "subscan_slow": 4,
                                              "subscan_fast": 2}},
        })
        solver = PtyRADSolver(cfg, init_variables=init, mesh=None, verbose=False)
        solver.prepare()
        assert len(solver.indices) == 4 * 2

    @pytest.mark.slow
    def test_lbfgs_respects_start_iter(self, rng):
        """A tensor with start_iter > 1 must not move during earlier LBFGS
        iterations (the gating lives inside the objective via stop_gradient
        so linesearch-internal gradients are gated too — review r3)."""
        init, _ = make_synthetic(rng)
        upd = {"objp": {"lr": 1e-2, "start_iter": 1},
               "obja": {"lr": 1e-2, "start_iter": 5}}
        cfg = solver_params(niter=2, optimizer="LBFGS")
        cfg["model_params"]["update_params"] = upd
        solver = PtyRADSolver(cfg, init_variables=init, mesh=None, verbose=False)
        solver.prepare()
        solver._build()
        obja0 = np.asarray(solver.params.obja).copy()
        objp0 = np.asarray(solver.params.objp).copy()
        params, opt_state, value = solver.lbfgs_step(
            solver.params, solver.opt_state, jnp.asarray(solver.batch_idx),
            jnp.asarray(solver.batch_mask), niter=1,
        )
        np.testing.assert_array_equal(np.asarray(params.obja), obja0)
        assert not np.array_equal(np.asarray(params.objp), objp0)

    def test_lbfgs_ignores_grad_accumulation_wrapper(self, rng):
        """grad_accumulation must not wrap LBFGS in MultiSteps: its step is
        already a full-dataset objective, and the wrapper would discard k-1
        of every k linesearch steps (review r3)."""
        init, _ = make_synthetic(rng)
        upd = {"objp": {"lr": 1e-2, "start_iter": 1}}
        params, buffers, geom = make_model(init)
        tx, st, _, _ = create_optimizer({"name": "LBFGS"}, upd, params,
                                        grad_accumulation=4)
        import optax

        # a MultiSteps wrapper would expose .mini_step in the state
        assert not hasattr(st, "mini_step")


class TestCanvasSharding:
    """Object-canvas spatial sharding prototype (parallel/canvas.py; VERDICT
    r4 item 3, SURVEY.md:377-380): loss and ALL gradients — including the
    row-sharded canvas gradient, whose halo strips ride the ppermute
    transpose — must equal the replicated path's on the 8-device CPU mesh."""

    def _setup(self, rng, grid=8, npix=32, step=3):
        # taller canvas so 8 slabs each hold >= one probe height
        lam = electron_wavelength(80.0)
        dx = 0.3
        probe = make_stem_probe(
            {"kv": 80.0, "conv_angle": 24.9, "Npix": npix, "dx": dx, "df": 30.0})
        n_dev = 8
        rows_local = 40
        canvas_y = rows_local * n_dev
        canvas_x = grid * step + npix + 6
        # grid rows spread so each slab gets exactly grid/n_dev... place one
        # scan row per slab: y starts at slab*rows_local + 2
        ys = (np.arange(grid) % n_dev) * rows_local + 2
        xs = np.arange(grid) * step + 3
        Y, X = np.meshgrid(ys, xs, indexing="ij")
        crop_pos = np.stack([Y.ravel(), X.ravel()], -1).astype(np.int32)

        yy, xx = np.mgrid[0:canvas_y, 0:canvas_x].astype(np.float64)
        phase = np.zeros((canvas_y, canvas_x))
        for _ in range(30):
            cy, cx = rng.integers(8, canvas_y - 8), rng.integers(8, canvas_x - 8)
            phase += 0.3 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 6.0)
        obj = np.exp(1j * phase)[None, None].astype(np.complex64)
        obj = np.tile(obj, (1, 2, 1, 1))  # 2 slices

        init = {
            "obj": obj,
            "probe": probe[None],
            "probe_pos_shifts": np.zeros((grid * grid, 2), np.float32),
            "obj_tilts": np.zeros((1, 2), np.float32),
            "slice_thickness": 2.0,
            "H": near_field_evolution((npix, npix), dx, 2.0, lam),
            "measurements": np.abs(
                rng.standard_normal((grid * grid, npix, npix))
            ).astype(np.float32),
            "crop_pos": crop_pos,
            "omode_occu": np.ones(1, np.float32),
            "dx": dx,
            "lambd": lam,
            "N_scan_slow": grid,
            "N_scan_fast": grid,
        }
        return init

    def test_sharded_canvas_matches_replicated(self, rng):
        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_sharded_loss,
            plan_canvas_sharding,
            shard_canvas_params,
            unshard_canvas,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng)
        params, buffers, geom = make_model(init, {"fwd_fused": False})
        noy = geom.obj_shape[2]
        loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}

        # replicated reference: full-batch loss + grads on one device
        def ref_loss(p):
            dp, (oa, op_) = fwd_fn(p, buffers, geom, jnp.arange(geom.n_scans))
            total, _ = combined_loss(
                dp, buffers.measurements, oa, op_, buffers.omode_occu,
                loss_params, None)
            return total

        ref_val, ref_grad = jax.jit(jax.value_and_grad(ref_loss))(params)

        mesh = make_mesh(8)
        plan = plan_canvas_sharding(
            np.asarray(buffers.crop_pos), noy, geom.probe_shape[0], 8)
        assert plan.b_local * 8 == geom.n_scans
        loss_fn, (pos_l, meas_l) = build_canvas_sharded_loss(
            buffers, geom, mesh, plan, loss_params)
        params_sh = shard_canvas_params(params, plan, mesh)
        val, grad = jax.jit(jax.value_and_grad(loss_fn))(params_sh, pos_l, meas_l)

        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        for name in ("obja", "objp"):
            a = np.asarray(getattr(ref_grad, name))
            b = unshard_canvas(getattr(grad, name), noy)
            tol = 1e-5 * max(float(np.abs(a).max()), 1e-3)
            np.testing.assert_allclose(b, a, atol=tol, err_msg=name)
            # padding rows receive exactly zero gradient
            full = np.asarray(getattr(grad, name))
            assert np.all(full[:, :, noy:, :] == 0.0)
        np.testing.assert_allclose(
            np.asarray(grad.probe.re), np.asarray(ref_grad.probe.re),
            atol=1e-5 * max(float(np.abs(np.asarray(ref_grad.probe.re)).max()), 1e-3))

    def test_canvas_sharded_training_matches_replicated(self, rng):
        """FIVE Adam iterations through build_canvas_train_step (optimizer
        moments row-sharded with the canvas) equal the replicated full-batch
        loop's trajectory — the prototype trains, not just differentiates."""
        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_train_step,
            plan_canvas_sharding,
            shard_canvas_params,
            unshard_canvas,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng)
        upd = {"obja": {"lr": 1e-3, "start_iter": 1},
               "objp": {"lr": 1e-3, "start_iter": 1}}
        params, buffers, geom = make_model(init, {"fwd_fused": False,
                                                  "update_params": upd})
        noy = geom.obj_shape[2]
        loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}

        # replicated reference trajectory
        def ref_loss(p):
            dp, (oa, op_) = fwd_fn(p, buffers, geom, jnp.arange(geom.n_scans))
            total, _ = combined_loss(
                dp, buffers.measurements, oa, op_, buffers.omode_occu,
                loss_params, None)
            return total

        tx_r, st_r, _, _ = create_optimizer({"name": "Adam"}, upd, params)
        vg = jax.jit(jax.value_and_grad(ref_loss))
        p_r, losses_r = params, []
        import optax as _optax
        for _ in range(5):
            val, g = vg(p_r)
            up, st_r = tx_r.update(g, st_r, p_r)
            p_r = _optax.apply_updates(p_r, up)
            losses_r.append(float(val))

        mesh = make_mesh(8)
        plan = plan_canvas_sharding(
            np.asarray(buffers.crop_pos), noy, geom.probe_shape[0], 8)
        params_sh = shard_canvas_params(params, plan, mesh)
        tx_s, st_s, _, _ = create_optimizer({"name": "Adam"}, upd, params_sh)
        step, (pos_l, meas_l) = build_canvas_train_step(
            buffers, geom, mesh, plan, loss_params, tx_s)
        p_s, losses_s = params_sh, []
        for _ in range(5):
            p_s, st_s, val = step(p_s, st_s, pos_l, meas_l)
            losses_s.append(float(val))

        np.testing.assert_allclose(losses_s, losses_r, rtol=1e-5)
        # post-Adam tolerance: f32 reduction-order noise across shards can
        # nudge near-zero gradients through Adam's eps normalization
        # (observed max 3.3e-5 at lr 1e-3 over 5 steps; the raw-gradient
        # equality is the sharp check, test_sharded_canvas_matches_replicated)
        np.testing.assert_allclose(
            unshard_canvas(p_s.objp, noy), np.asarray(p_r.objp), atol=1e-4)

    def test_sparse_loss_term_matches_replicated(self, rng):
        """loss_single + loss_sparse (the tBL demo's actual loss config)
        through the sharded path: the sparse term's per-mode voxel means
        psum across slabs and must match combined_loss exactly."""
        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_sharded_loss,
            plan_canvas_sharding,
            shard_canvas_params,
            unshard_canvas,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        # a nonuniform phase so the sparse term has structure
        params, buffers, geom = make_model(init, {"fwd_fused": False})
        noy = geom.obj_shape[2]
        loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5},
                       "loss_sparse": {"state": True, "weight": 0.2, "ln_order": 1}}

        def ref_loss(p):
            dp, (oa, op_) = fwd_fn(p, buffers, geom, jnp.arange(geom.n_scans))
            total, _ = combined_loss(
                dp, buffers.measurements, oa, op_, buffers.omode_occu,
                loss_params, None)
            return total

        ref_val, ref_grad = jax.jit(jax.value_and_grad(ref_loss))(params)

        mesh = make_mesh(8)
        plan = plan_canvas_sharding(
            np.asarray(buffers.crop_pos), noy, geom.probe_shape[0], 8)
        loss_fn, (pos_l, meas_l) = build_canvas_sharded_loss(
            buffers, geom, mesh, plan, loss_params)
        params_sh = shard_canvas_params(params, plan, mesh)
        val, grad = jax.jit(jax.value_and_grad(loss_fn))(params_sh, pos_l, meas_l)

        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        a = np.asarray(ref_grad.objp)
        b = unshard_canvas(grad.objp, noy)
        np.testing.assert_allclose(
            b, a, atol=1e-5 * max(float(np.abs(a).max()), 1e-3))

    def test_solver_shard_canvas_matches_replicated_fullbatch(self, rng):
        """The PUBLIC path (recon_params.shard_canvas): PtyRADSolver on an
        8-device mesh with row-sharded canvases + the resident measurement
        store must reproduce the replicated solver's full-batch Adam
        trajectory — constraints included (bridged through the replicated
        layout on the iterations they fire)."""
        from ptyrad_tpu.engine.solver import PtyRADSolver
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        n = init["measurements"].shape[0]
        cfg = {
            "model_params": {
                "fwd_fused": False,
                "optimizer_params": {"name": "Adam"},
                "update_params": {"objp": {"lr": 5e-3, "start_iter": 1},
                                  "obja": {"lr": 5e-3, "start_iter": 1}},
            },
            "loss_params": {"loss_single": {"state": True, "weight": 1.0,
                                            "dp_pow": 0.5}},
            "constraint_params": {"objp_postiv": {"freq": 2, "relax": 0.0}},
            "recon_params": {"NITER": 4, "BATCH_SIZE": {"size": n},
                             "GROUP_MODE": "random"},
        }
        solver_rep = PtyRADSolver(cfg, init_variables=init, mesh=None,
                                  verbose=False)
        p_rep, hist_rep = solver_rep.run()

        import copy

        cfg_sh = copy.deepcopy(cfg)
        cfg_sh["recon_params"]["shard_canvas"] = True
        solver_sh = PtyRADSolver(cfg_sh, init_variables=init,
                                 mesh=make_mesh(8), verbose=False)
        p_sh, hist_sh = solver_sh.run()

        np.testing.assert_allclose(
            [v for _, v in hist_sh.loss_iters],
            [v for _, v in hist_rep.loss_iters], rtol=2e-5)
        # reconstruct() hands back WHOLE canvases (padding rows dropped)
        assert p_sh.objp.shape == p_rep.objp.shape
        np.testing.assert_allclose(
            np.asarray(p_sh.objp), np.asarray(p_rep.objp), atol=1e-4)

    @pytest.mark.slow
    def test_solver_shard_canvas_bf16_policy_composes(self, rng):
        """compute_dtype='bfloat16' reaches the canvas-sharded loss too
        (multislice_dp's compute_dtype rides geom into the shard): the
        canvas bf16 trajectory must track the REPLICATED bf16 one — same
        math, different layout. (bf16 vs f32 is gated separately on a
        dose-realistic synthetic; on noise-only data the dtypes decorrelate
        by construction, so that is deliberately not the comparison here.)"""
        import copy

        from ptyrad_tpu.engine.solver import PtyRADSolver
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        n = init["measurements"].shape[0]
        cfg = {
            "model_params": {
                "fwd_fused": False,
                "compute_dtype": "bfloat16",
                "optimizer_params": {"name": "Adam"},
                "update_params": {"objp": {"lr": 5e-3, "start_iter": 1}},
            },
            "loss_params": {"loss_single": {"state": True, "weight": 1.0,
                                            "dp_pow": 0.5}},
            "recon_params": {"NITER": 2, "BATCH_SIZE": {"size": n},
                             "GROUP_MODE": "random"},
        }
        objp0 = np.angle(np.asarray(init["obj"]))
        p_rep, _ = PtyRADSolver(cfg, init_variables=copy.deepcopy(init),
                                mesh=None, verbose=False).run()

        cfg_sh = copy.deepcopy(cfg)
        cfg_sh["recon_params"]["shard_canvas"] = True
        solver_sh = PtyRADSolver(cfg_sh, init_variables=copy.deepcopy(init),
                                 mesh=make_mesh(8), verbose=False)
        assert solver_sh.geom.compute_dtype == "bfloat16"
        p_sh, hist_sh = solver_sh.run()

        assert all(np.isfinite(v) for _, v in hist_sh.loss_iters)
        d_rep = (np.asarray(p_rep.objp) - objp0).ravel()
        d_sh = (np.asarray(p_sh.objp) - objp0).ravel()
        assert np.corrcoef(d_rep, d_sh)[0, 1] > 0.99
        np.testing.assert_allclose(
            np.asarray(p_sh.objp), np.asarray(p_rep.objp), atol=2e-2)

    @pytest.mark.slow
    def test_solver_shard_canvas_grad_accumulation(self, rng):
        """shard_canvas + BATCH_SIZE.grad_accumulation: MultiSteps wraps the
        sharded optimizer, its canvas-shaped acc_grads are born row-sharded,
        and accumulating 2 half-batches tracks the full-batch update (same
        loose gate as the replicated test — the objective is nonlinear, so
        microbatch-mean != full-batch gradient exactly)."""
        import copy

        from ptyrad_tpu.engine.solver import PtyRADSolver
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        n = init["measurements"].shape[0]
        cfg = {
            "model_params": {
                "fwd_fused": False,
                "optimizer_params": {"name": "SGD"},
                "update_params": {"objp": {"lr": 1e-2, "start_iter": 1}},
            },
            "loss_params": {"loss_single": {"state": True, "weight": 1.0,
                                            "dp_pow": 0.5}},
            "recon_params": {"NITER": 1, "BATCH_SIZE": {"size": n},
                             "GROUP_MODE": "random", "shard_canvas": True},
        }
        objp0 = np.angle(np.asarray(init["obj"]))
        solver_f = PtyRADSolver(cfg, init_variables=copy.deepcopy(init),
                                mesh=make_mesh(8), verbose=False)
        p_full, _ = solver_f.run()

        cfg_acc = copy.deepcopy(cfg)
        cfg_acc["recon_params"]["BATCH_SIZE"] = {
            "size": n // 2, "grad_accumulation": 2}
        solver_a = PtyRADSolver(cfg_acc, init_variables=copy.deepcopy(init),
                                mesh=make_mesh(8), verbose=False)
        solver_a.prepare()
        solver_a._build()
        # MultiSteps acc_grads (canvas-shaped, padded) live row-sharded
        acc = [leaf for leaf in jax.tree_util.tree_leaves(solver_a.opt_state)
               if getattr(leaf, "ndim", 0) == 4]
        assert acc and all("data" in str(a.sharding.spec) for a in acc)
        p_acc, _ = solver_a.run()

        d_full = np.asarray(p_full.objp) - objp0
        d_acc = np.asarray(p_acc.objp) - objp0
        assert np.corrcoef(d_full.ravel(), d_acc.ravel())[0, 1] > 0.95

    @pytest.mark.slow
    def test_solver_shard_canvas_lbfgs_matches_replicated(self, rng):
        """shard_canvas + LBFGS — a combination the reference cannot express
        (its LBFGS closure is incompatible with DDP): the scanned full-store
        linesearch objective on the row-sharded canvas must reproduce the
        replicated LBFGS trajectory, with the stacked diff memories BORN
        row-sharded (canvas_state_shardings jit-init), never replicated."""
        import copy

        from ptyrad_tpu.engine.solver import PtyRADSolver
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        n = init["measurements"].shape[0]
        cfg = {
            "model_params": {
                "fwd_fused": False,
                "optimizer_params": {"name": "LBFGS"},
                "update_params": {"objp": {"lr": 1e-2, "start_iter": 1},
                                  "obja": {"lr": 1e-2, "start_iter": 1}},
            },
            "loss_params": {"loss_single": {"state": True, "weight": 1.0,
                                            "dp_pow": 0.5}},
            "recon_params": {"NITER": 3, "BATCH_SIZE": {"size": n},
                             "GROUP_MODE": "random"},
        }
        solver_rep = PtyRADSolver(cfg, init_variables=copy.deepcopy(init),
                                  mesh=None, verbose=False)
        p_rep, hist_rep = solver_rep.run()

        cfg_sh = copy.deepcopy(cfg)
        cfg_sh["recon_params"]["shard_canvas"] = True
        solver_sh = PtyRADSolver(cfg_sh, init_variables=copy.deepcopy(init),
                                 mesh=make_mesh(8), verbose=False)
        solver_sh.prepare()
        solver_sh._build()
        # the m-deep diff memories (5D: (m, omode, Nz, rows, cols)) must be
        # row-sharded over the mesh, not replicated
        mem = [leaf for leaf in jax.tree_util.tree_leaves(solver_sh.opt_state)
               if getattr(leaf, "ndim", 0) == 5]
        assert mem, "no stacked LBFGS memory leaves found"
        assert all("data" in str(leaf.sharding.spec) for leaf in mem)

        p_sh, hist_sh = solver_sh.run()
        np.testing.assert_allclose(
            [v for _, v in hist_sh.loss_iters],
            [v for _, v in hist_rep.loss_iters], rtol=1e-4)
        assert p_sh.objp.shape == p_rep.objp.shape
        np.testing.assert_allclose(
            np.asarray(p_sh.objp), np.asarray(p_rep.objp), atol=1e-3)

    @pytest.mark.slow
    def test_solver_shard_canvas_opt_state_resume(self, rng, tmp_path):
        """shard_canvas optimizer-state resume (r4 restriction lifted):
        checkpoints go out in the replicated/unpadded layout
        (build_opt_state_gather), resume pads + re-shards the canvas moments
        exactly (make_opt_state_coerce), and the same file also resumes a
        replicated-mode run — one canonical format across modes."""
        import copy

        from ptyrad_tpu.engine.solver import PtyRADSolver
        from ptyrad_tpu.optim import save_opt_state
        from ptyrad_tpu.parallel.mesh import make_mesh

        def flat(state):
            return [
                (jax.tree_util.keystr(p), np.asarray(leaf))
                for p, leaf in jax.tree_util.tree_flatten_with_path(state)[0]
                if hasattr(leaf, "shape")
            ]

        init = self._setup(rng, grid=6)
        n = init["measurements"].shape[0]
        cfg = {
            "model_params": {
                "fwd_fused": False,
                "optimizer_params": {"name": "Adam"},
                "update_params": {"objp": {"lr": 5e-3, "start_iter": 1},
                                  "obja": {"lr": 5e-3, "start_iter": 1}},
            },
            "loss_params": {"loss_single": {"state": True, "weight": 1.0,
                                            "dp_pow": 0.5}},
            "recon_params": {"NITER": 2, "BATCH_SIZE": {"size": n},
                             "GROUP_MODE": "random", "shard_canvas": True,
                             # the exit gather to the canonical host layout
                             # happens only when something will write it
                             "save_result": ["model", "objp", "optim_state"]},
        }
        solver = PtyRADSolver(cfg, init_variables=copy.deepcopy(init),
                              mesh=make_mesh(8), verbose=False)
        solver.run()
        saved = flat(solver.opt_state)
        # the gathered state's canvas moments carry the UNPADDED extent —
        # i.e. the exact shapes a replicated-mode checkpoint would have
        objp_shape = tuple(np.asarray(solver.params.objp).shape)
        mu_objp = [v for k, v in saved if "mu" in k and k.endswith("objp")]
        assert mu_objp and mu_objp[0].shape == objp_shape
        path = str(tmp_path / "optim_state")
        save_opt_state(solver.opt_state, path)

        cfg2 = copy.deepcopy(cfg)
        cfg2["model_params"]["optimizer_params"]["load_state"] = path
        solver2 = PtyRADSolver(cfg2, init_variables=copy.deepcopy(init),
                               mesh=make_mesh(8), verbose=False)
        solver2.prepare()
        solver2._build()
        restored = flat(solver2._canvas_opt_gather(solver2.opt_state))
        assert [k for k, _ in restored] == [k for k, _ in saved]
        for (k, a), (_, b) in zip(saved, restored):
            np.testing.assert_array_equal(b, a, err_msg=k)
        p2, hist2 = solver2.run()
        assert np.isfinite(hist2.loss_iters[-1][1])

        # cross-mode: the canvas-written file resumes a REPLICATED run
        cfg3 = copy.deepcopy(cfg2)
        cfg3["recon_params"].pop("shard_canvas")
        solver3 = PtyRADSolver(cfg3, init_variables=copy.deepcopy(init),
                               mesh=None, verbose=False)
        solver3.prepare()
        solver3._build()
        for (k, a), (_, b) in zip(saved, flat(solver3.opt_state)):
            np.testing.assert_array_equal(b, a, err_msg=k)

    def test_canvas_epoch_scan_matches_replicated_minibatches(self, rng):
        """build_canvas_train_epoch: one jitted lax.scan over per-slab
        minibatches (the production solver shape — engine/solver's
        build_train_epoch analog). Two epochs x two minibatches of Adam
        must reproduce the replicated minibatch trajectory batch for
        batch, with mask/n_valid as traced per-batch values."""
        import optax as _optax

        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_train_epoch,
            plan_canvas_epoch,
            shard_canvas_params,
            unshard_canvas,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        upd = {"obja": {"lr": 1e-3, "start_iter": 1},
               "objp": {"lr": 1e-3, "start_iter": 1}}
        params, buffers, geom = make_model(init, {"fwd_fused": False,
                                                  "update_params": upd})
        noy = geom.obj_shape[2]
        loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}

        mesh = make_mesh(8)
        plan = plan_canvas_epoch(
            np.asarray(buffers.crop_pos), noy, geom.probe_shape[0], 8,
            n_batches=2, seed=3)

        # replicated trajectory over the SAME minibatch index groups
        def ref_loss(p, idx):
            dp, (oa, op_) = fwd_fn(p, buffers, geom, idx)
            total, _ = combined_loss(
                dp, buffers.measurements[idx], oa, op_, buffers.omode_occu,
                loss_params, None)
            return total

        groups = [plan.pos_index[b][plan.mask[b] == 1] for b in range(2)]
        assert all(len(g) for g in groups)
        tx_r, st_r, _, _ = create_optimizer({"name": "Adam"}, upd, params)
        vg = jax.jit(jax.value_and_grad(ref_loss))
        p_r, losses_r = params, []
        for _ in range(2):
            for g_idx in groups:
                val, g = vg(p_r, jnp.asarray(g_idx))
                up, st_r = tx_r.update(g, st_r, p_r)
                p_r = _optax.apply_updates(p_r, up)
                losses_r.append(float(val))

        params_sh = shard_canvas_params(params, plan.base, mesh)
        tx_s, st_s, _, _ = create_optimizer({"name": "Adam"}, upd, params_sh)
        epoch, inputs = build_canvas_train_epoch(
            buffers, geom, mesh, plan, loss_params, tx_s)
        p_s, st, losses_s = params_sh, st_s, []
        for _ in range(2):
            p_s, st, losses = epoch(p_s, st, *inputs)
            losses_s.extend(float(v) for v in np.asarray(losses))

        np.testing.assert_allclose(losses_s, losses_r, rtol=2e-5)
        np.testing.assert_allclose(
            unshard_canvas(p_s.objp, noy), np.asarray(p_r.objp), atol=1e-4)

    def test_all_loss_terms_and_pad_match_replicated(self, rng):
        """All five loss terms at once (omode 2 so simlar has cross-mode
        variance) PLUS the on-the-fly measurement pad through the sharded
        path: every term recomposes from one fused psum of masked partial
        sums — pacbed's global batch-averaged patterns included — and the
        pad runs on the slab-local batch. Loss and gradients must equal the
        replicated combined_loss path's."""
        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn
        from ptyrad_tpu.models.forward import get_measurements
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_sharded_loss,
            plan_canvas_sharding,
            shard_canvas_params,
            unshard_canvas,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        # two incoherent object modes: simlar's cross-mode std is nonzero
        obj = np.asarray(init["obj"])
        ripple = np.exp(
            1j * 0.1 * rng.standard_normal(obj.shape[-2:])).astype(np.complex64)
        init["obj"] = np.concatenate([obj, obj * ripple], axis=0)
        init["omode_occu"] = np.array([0.6, 0.4], np.float32)
        # raw 24^2 measurements embedded on the fly in a fitted background
        init["measurements"] = init["measurements"][:, 4:28, 4:28].copy()
        init["on_the_fly_meas_padded"] = (
            0.05 * np.abs(rng.standard_normal((32, 32)))).astype(np.float32)
        init["on_the_fly_meas_padded_idx"] = [4, 28, 4, 28]
        params, buffers, geom = make_model(init, {"fwd_fused": False})
        assert geom.meas_pad_idx == (4, 28, 4, 28)
        noy = geom.obj_shape[2]
        loss_params = {
            "loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5},
            "loss_poissn": {"state": True, "weight": 0.5, "dp_pow": 1.0},
            "loss_pacbed": {"state": True, "weight": 0.3, "dp_pow": 0.2},
            "loss_sparse": {"state": True, "weight": 0.1, "ln_order": 1},
            "loss_simlar": {"state": True, "weight": 0.2, "obj_type": "both",
                            "blur_std": 1.0, "scale_factor": [1.0, 1.0]},
        }

        def ref_loss(p):
            idx = jnp.arange(geom.n_scans)
            dp, (oa, op_) = fwd_fn(p, buffers, geom, idx)
            meas = get_measurements(buffers, geom, idx)
            total, _ = combined_loss(
                dp, meas, oa, op_, buffers.omode_occu, loss_params, None)
            return total

        ref_val, ref_grad = jax.jit(jax.value_and_grad(ref_loss))(params)

        mesh = make_mesh(8)
        plan = plan_canvas_sharding(
            np.asarray(buffers.crop_pos), noy, geom.probe_shape[0], 8)
        loss_fn, (pos_l, meas_l) = build_canvas_sharded_loss(
            buffers, geom, mesh, plan, loss_params)
        params_sh = shard_canvas_params(params, plan, mesh)
        val, grad = jax.jit(jax.value_and_grad(loss_fn))(params_sh, pos_l, meas_l)

        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        for name in ("objp", "obja"):
            a = np.asarray(getattr(ref_grad, name))
            b = unshard_canvas(getattr(grad, name), noy)
            np.testing.assert_allclose(
                b, a, atol=2e-5 * max(float(np.abs(a).max()), 1e-3), err_msg=name)
        a = np.asarray(ref_grad.probe.re)
        np.testing.assert_allclose(
            np.asarray(grad.probe.re), a,
            atol=2e-5 * max(float(np.abs(a).max()), 1e-3))

    def test_on_the_fly_resample_matches_replicated(self, rng):
        """The other on-the-fly measurement leg: intensity-conserving
        bilinear resample (raw 64^2 -> detector 32^2) applied to the
        slab-local batch inside the shard."""
        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn
        from ptyrad_tpu.models.forward import get_measurements
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_sharded_loss,
            plan_canvas_sharding,
            shard_canvas_params,
            unshard_canvas,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        n = init["measurements"].shape[0]
        init["measurements"] = np.abs(
            rng.standard_normal((n, 64, 64))).astype(np.float32)
        init["on_the_fly_meas_scale_factors"] = [0.5, 0.5]
        params, buffers, geom = make_model(init, {"fwd_fused": False})
        assert geom.meas_scale_factors == (0.5, 0.5)
        noy = geom.obj_shape[2]
        loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}

        def ref_loss(p):
            idx = jnp.arange(geom.n_scans)
            dp, (oa, op_) = fwd_fn(p, buffers, geom, idx)
            meas = get_measurements(buffers, geom, idx)
            total, _ = combined_loss(
                dp, meas, oa, op_, buffers.omode_occu, loss_params, None)
            return total

        ref_val, ref_grad = jax.jit(jax.value_and_grad(ref_loss))(params)

        mesh = make_mesh(8)
        plan = plan_canvas_sharding(
            np.asarray(buffers.crop_pos), noy, geom.probe_shape[0], 8)
        loss_fn, (pos_l, meas_l) = build_canvas_sharded_loss(
            buffers, geom, mesh, plan, loss_params)
        params_sh = shard_canvas_params(params, plan, mesh)
        val, grad = jax.jit(jax.value_and_grad(loss_fn))(params_sh, pos_l, meas_l)

        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        a = np.asarray(ref_grad.objp)
        np.testing.assert_allclose(
            unshard_canvas(grad.objp, noy), a,
            atol=1e-5 * max(float(np.abs(a).max()), 1e-3))

    def test_tilts_and_dz_optimization_match_replicated(self, rng):
        """Per-position crystal tilts + optimizable slice thickness through
        the sharded path: propagators are built inside each shard from slab-
        gathered tilt rows, and the dz / tilt gradients psum back through
        shard_map's replicated-input transpose — all must equal the
        replicated path's."""
        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_sharded_loss,
            plan_canvas_sharding,
            shard_canvas_params,
            unshard_canvas,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng)
        n = init["measurements"].shape[0]
        init["obj_tilts"] = (0.5 * rng.standard_normal((n, 2))).astype(np.float32)
        mp = {"fwd_fused": False,
              "update_params": {"obj_tilts": {"lr": 1e-3, "start_iter": 1},
                                "slice_thickness": {"lr": 1e-3, "start_iter": 1}}}
        params, buffers, geom = make_model(init, mp)
        assert geom.tilt_obj and geom.change_thickness and not geom.global_tilt
        noy = geom.obj_shape[2]
        loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}

        def ref_loss(p):
            dp, (oa, op_) = fwd_fn(p, buffers, geom, jnp.arange(geom.n_scans))
            total, _ = combined_loss(
                dp, buffers.measurements, oa, op_, buffers.omode_occu,
                loss_params, None)
            return total

        ref_val, ref_grad = jax.jit(jax.value_and_grad(ref_loss))(params)
        assert float(jnp.abs(ref_grad.slice_thickness)) > 0

        mesh = make_mesh(8)
        plan = plan_canvas_sharding(
            np.asarray(buffers.crop_pos), noy, geom.probe_shape[0], 8)
        loss_fn, (pos_l, meas_l) = build_canvas_sharded_loss(
            buffers, geom, mesh, plan, loss_params)
        params_sh = shard_canvas_params(params, plan, mesh)
        val, grad = jax.jit(jax.value_and_grad(loss_fn))(params_sh, pos_l, meas_l)

        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        for name in ("objp", "obja"):
            a = np.asarray(getattr(ref_grad, name))
            b = unshard_canvas(getattr(grad, name), noy)
            np.testing.assert_allclose(
                b, a, atol=1e-5 * max(float(np.abs(a).max()), 1e-3), err_msg=name)
        a = np.asarray(ref_grad.obj_tilts)
        np.testing.assert_allclose(
            np.asarray(grad.obj_tilts), a,
            atol=1e-5 * max(float(np.abs(a).max()), 1e-3))
        # dz gradient: an O(100)-field contraction to one scalar is
        # cancellation-dominated, so reduction-order noise is %-level
        np.testing.assert_allclose(
            float(grad.slice_thickness), float(ref_grad.slice_thickness),
            rtol=1e-2)

    def test_canvas_global_tilt_gradients_match(self, rng):
        """Global (1, 2) nonzero tilt: the shard builds ONE ramp
        (tilts_l[:1]) instead of b_local identical ones; loss and the
        obj_tilts gradient must still match the replicated path (all local
        positions accumulate on the single ramp, and the callers'
        broadcast_to transpose sums over slots)."""
        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_sharded_loss,
            plan_canvas_sharding,
            shard_canvas_params,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng)
        init["obj_tilts"] = np.array([[0.8, -0.5]], np.float32)
        mp = {"fwd_fused": False,
              "update_params": {"obj_tilts": {"lr": 1e-3, "start_iter": 1}}}
        params, buffers, geom = make_model(init, mp)
        assert geom.tilt_obj and geom.global_tilt
        noy = geom.obj_shape[2]
        loss_params = {"loss_single": {"state": True, "weight": 1.0,
                                       "dp_pow": 0.5}}

        def ref_loss(p):
            dp, (oa, op_) = fwd_fn(p, buffers, geom, jnp.arange(geom.n_scans))
            total, _ = combined_loss(
                dp, buffers.measurements, oa, op_, buffers.omode_occu,
                loss_params, None)
            return total

        ref_val, ref_grad = jax.jit(jax.value_and_grad(ref_loss))(params)
        assert float(jnp.abs(ref_grad.obj_tilts).max()) > 0

        mesh = make_mesh(8)
        plan = plan_canvas_sharding(
            np.asarray(buffers.crop_pos), noy, geom.probe_shape[0], 8)
        loss_fn, (pos_l, meas_l) = build_canvas_sharded_loss(
            buffers, geom, mesh, plan, loss_params)
        params_sh = shard_canvas_params(params, plan, mesh)
        val, grad = jax.jit(jax.value_and_grad(loss_fn))(params_sh, pos_l, meas_l)

        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        a = np.asarray(ref_grad.obj_tilts)
        np.testing.assert_allclose(
            np.asarray(grad.obj_tilts), a,
            atol=1e-5 * max(float(np.abs(a).max()), 1e-3))

    def test_plan_mask_pads_unbalanced_and_rejects_oversized(self, rng):
        from ptyrad_tpu.parallel.canvas import plan_canvas_sharding

        pos = np.array([[0, 0], [1, 0], [2, 0], [300, 0]], np.int32)
        # 3 positions in slab 0, 1 in slab 3, none in slabs 1/2 -> b_local 3,
        # padding slots masked out and pointing at position 0
        plan = plan_canvas_sharding(pos, 320, 32, 4)
        assert plan.b_local == 3
        assert plan.mask.sum() == 4
        m = plan.mask.reshape(4, 3)
        np.testing.assert_array_equal(m[0], [1, 1, 1])
        np.testing.assert_array_equal(m[1], [0, 0, 0])
        np.testing.assert_array_equal(m[3], [1, 0, 0])
        assert plan.pos_index.reshape(4, 3)[3, 0] == 3
        with pytest.raises(ValueError, match="probe height"):
            plan_canvas_sharding(pos, 320, 200, 4)

    def test_unbalanced_slabs_and_probe_shifts_match_replicated(self, rng):
        """The two lifted restrictions together: an UNBALANCED position
        distribution (mask-padded slabs) with per-position sub-pixel probe
        shifts optimizable — loss and gradients (canvas, probe, AND the
        probe_pos_shifts rows, which ride the slab gather's transpose) must
        equal the replicated path's."""
        from ptyrad_tpu.losses import combined_loss
        from ptyrad_tpu.models.forward import forward as fwd_fn
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_sharded_loss,
            plan_canvas_sharding,
            shard_canvas_params,
            unshard_canvas,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)  # 36 positions over 8 slabs: ragged
        init["probe_pos_shifts"] = (0.3 * rng.standard_normal(
            init["probe_pos_shifts"].shape)).astype(np.float32)
        mp = {"fwd_fused": False,
              "update_params": {"probe_pos_shifts": {"lr": 1e-3, "start_iter": 1}}}
        params, buffers, geom = make_model(init, mp)
        assert geom.shift_probes
        noy = geom.obj_shape[2]
        loss_params = {"loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5}}

        def ref_loss(p):
            dp, (oa, op_) = fwd_fn(p, buffers, geom, jnp.arange(geom.n_scans))
            total, _ = combined_loss(
                dp, buffers.measurements, oa, op_, buffers.omode_occu,
                loss_params, None)
            return total

        ref_val, ref_grad = jax.jit(jax.value_and_grad(ref_loss))(params)

        mesh = make_mesh(8)
        plan = plan_canvas_sharding(
            np.asarray(buffers.crop_pos), noy, geom.probe_shape[0], 8)
        counts = plan.mask.reshape(8, -1).sum(1)
        assert counts.min() != counts.max()  # genuinely unbalanced
        loss_fn, (pos_l, meas_l) = build_canvas_sharded_loss(
            buffers, geom, mesh, plan, loss_params)
        params_sh = shard_canvas_params(params, plan, mesh)
        val, grad = jax.jit(jax.value_and_grad(loss_fn))(params_sh, pos_l, meas_l)

        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        for name in ("obja", "objp"):
            a = np.asarray(getattr(ref_grad, name))
            b = unshard_canvas(getattr(grad, name), noy)
            tol = 1e-5 * max(float(np.abs(a).max()), 1e-3)
            np.testing.assert_allclose(b, a, atol=tol, err_msg=name)
        a = np.asarray(ref_grad.probe_pos_shifts)
        b = np.asarray(grad.probe_pos_shifts)
        np.testing.assert_allclose(
            b, a, atol=1e-5 * max(float(np.abs(a).max()), 1e-3))

    @pytest.mark.slow
    def test_canvas_loop_callback_contract(self, rng):
        """_canvas_loop honors the every-iteration callback contract for
        plain callbacks (same as recon_loop/_lbfgs_loop), handing them WHOLE
        canvases; a schedule-aware callback (run_reconstruction's) declares
        its save iterations via the `canvas_save_iters` attribute and is
        invoked ONLY then — skipping the full-canvas all-gather on every
        other iteration (None = never invoked)."""
        import copy

        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        n = init["measurements"].shape[0]
        cfg = {
            "model_params": {
                "fwd_fused": False,
                "optimizer_params": {"name": "Adam"},
                "update_params": {"objp": {"lr": 5e-3, "start_iter": 1}},
            },
            "loss_params": {"loss_single": {"state": True, "weight": 1.0,
                                            "dp_pow": 0.5}},
            "recon_params": {"NITER": 3, "BATCH_SIZE": {"size": n},
                             "GROUP_MODE": "random", "shard_canvas": True},
        }
        whole_shape = np.asarray(init["obj"]).shape  # (omode, Nz, Y, X)

        calls_plain = []
        def cb_plain(niter, params, history):
            calls_plain.append((niter, tuple(params.objp.shape)))
        PtyRADSolver(cfg, init_variables=copy.deepcopy(init),
                     mesh=make_mesh(8), verbose=False).run(callback=cb_plain)
        assert [it for it, _ in calls_plain] == [1, 2, 3]
        # every invocation saw the WHOLE (unpadded) canvas, not a shard
        assert all(shp == whole_shape for _, shp in calls_plain)

        calls_gated = []
        def cb_gated(niter, params, history):
            calls_gated.append(niter)
        cb_gated.canvas_save_iters = 2
        PtyRADSolver(cfg, init_variables=copy.deepcopy(init),
                     mesh=make_mesh(8), verbose=False).run(callback=cb_gated)
        assert calls_gated == [2]

        calls_never = []
        def cb_never(niter, params, history):
            calls_never.append(niter)
        cb_never.canvas_save_iters = None
        PtyRADSolver(cfg, init_variables=copy.deepcopy(init),
                     mesh=make_mesh(8), verbose=False).run(callback=cb_never)
        assert calls_never == []

    @pytest.mark.slow
    def test_mosaic_fallback_routes_to_canvas_loop(self, rng, monkeypatch):
        """A Mosaic VMEM compile failure under shard_canvas must retry on
        the kernels-off CANVAS path, not fall through to recon_loop whose
        train_step is None in canvas mode (review r5: the fallback that
        exists to rescue these runs crashed instead)."""
        import copy

        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        n = init["measurements"].shape[0]
        cfg = {
            "model_params": {
                "fwd_fused": False,
                "optimizer_params": {"name": "Adam"},
                "update_params": {"objp": {"lr": 5e-3, "start_iter": 1}},
            },
            "loss_params": {"loss_single": {"state": True, "weight": 1.0,
                                            "dp_pow": 0.5}},
            "recon_params": {"NITER": 2, "BATCH_SIZE": {"size": n},
                             "GROUP_MODE": "random", "shard_canvas": True},
        }
        orig = PtyRADSolver._canvas_loop
        state = {"n": 0}

        def flaky(self_s, n_iter, callback=None):
            state["n"] += 1
            if state["n"] == 1:
                raise RuntimeError(
                    "Mosaic failed: ran out of scoped vector memory (vmem)")
            return orig(self_s, n_iter, callback)

        monkeypatch.setattr(PtyRADSolver, "_canvas_loop", flaky)
        from ptyrad_tpu.ops.patches import set_force_xla
        try:
            solver = PtyRADSolver(cfg, init_variables=copy.deepcopy(init),
                                  mesh=make_mesh(8), verbose=False)
            p, hist = solver.run()
        finally:
            set_force_xla(False)  # the fallback sets it globally
        assert state["n"] == 2, "retry did not route back to _canvas_loop"
        assert len(hist.loss_iters) == 2
        assert np.isfinite(hist.loss_iters[-1][1])
        # the rebuilt run still hands back whole canvases
        assert p.objp.shape == np.asarray(init["obj"]).shape

    def test_canvas_store_device_resident_no_host_roundtrip(self, rng):
        """build_canvas_store with a DEVICE-resident measurement store must
        produce the same slab-major store as the host path via a jitted
        on-device gather (np.asarray would fetch the whole dataset to host —
        minutes per GB on tunneled backends; review r5)."""
        import dataclasses as _dc

        import jax

        from ptyrad_tpu.parallel.canvas import (
            build_canvas_store,
            plan_canvas_sharding,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, grid=6)
        params, buffers, geom = make_model(init, {"fwd_fused": False})
        mesh = make_mesh(8)
        plan = plan_canvas_sharding(
            np.asarray(buffers.crop_pos), geom.obj_shape[2],
            geom.probe_shape[0], 8)

        host_store = build_canvas_store(buffers, geom, mesh, plan)
        dev_meas = jnp.asarray(buffers.measurements)
        assert isinstance(dev_meas, jax.Array)
        dev_store = build_canvas_store(
            _dc.replace(buffers, measurements=dev_meas), geom, mesh, plan)
        np.testing.assert_array_equal(
            np.asarray(dev_store.meas_store), np.asarray(host_store.meas_store))
        assert dev_store.meas_store.sharding.spec == host_store.meas_store.sharding.spec

    def test_shard_model_pads_device_resident_store(self, rng):
        """shard_model's N % n_dev zero-pad must work on a device-resident
        measurement array without a host round-trip (review r5)."""
        import jax

        from ptyrad_tpu.parallel.mesh import make_mesh, shard_model

        init = self._setup(rng, grid=6)  # 36 positions: 36 % 8 != 0
        params, buffers, geom = make_model(init, {"fwd_fused": False})
        assert buffers.measurements.shape[0] % 8 != 0
        mesh = make_mesh(8)

        import dataclasses as _dc

        dev_buffers = _dc.replace(
            buffers, measurements=jnp.asarray(buffers.measurements))
        _, b_dev = shard_model(params, dev_buffers, mesh)
        _, b_host = shard_model(params, buffers, mesh)
        assert b_dev.measurements.shape[0] % 8 == 0
        np.testing.assert_array_equal(
            np.asarray(b_dev.measurements), np.asarray(b_host.measurements))

    @pytest.mark.slow
    def test_canvas_fused_kernel_matches_xla(self, rng, monkeypatch):
        """The canvas-sharded loss dispatches the fused Pallas multislice
        kernel per-shard when in regime (review r5: shard_canvas used to
        forfeit the kernel speedup by always calling the XLA multislice_dp).
        Interpret mode on the 8-device mesh: loss and ALL gradients must
        equal the XLA canvas path, with probe-shift optimization on (the
        kernel takes the shifted SPECTRUM like forward())."""
        from ptyrad_tpu.ops import pallas_multislice as pms
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_sharded_loss,
            plan_canvas_sharding,
            shard_canvas_params,
            unshard_canvas,
        )
        from ptyrad_tpu.parallel.mesh import make_mesh

        init = self._setup(rng, npix=16)
        upd = {"probe_pos_shifts": {"lr": 1e-3, "start_iter": 1}}
        params, buffers, geom_x = make_model(
            init, {"fwd_fused": False, "update_params": upd})
        _, _, geom_f = make_model(
            init, {"fwd_fused": True, "update_params": upd})
        assert geom_f.shift_probes
        noy = geom_x.obj_shape[2]
        loss_params = {"loss_single": {"state": True, "weight": 1.0,
                                       "dp_pow": 0.5}}
        mesh = make_mesh(8)
        plan = plan_canvas_sharding(
            np.asarray(buffers.crop_pos), noy, geom_x.probe_shape[0], 8)
        loss_x, (pos_l, meas_l) = build_canvas_sharded_loss(
            buffers, geom_x, mesh, plan, loss_params)
        loss_f, _ = build_canvas_sharded_loss(
            buffers, geom_f, mesh, plan, loss_params)
        params_sh = shard_canvas_params(params, plan, mesh)

        vx, gx = jax.jit(jax.value_and_grad(loss_x))(params_sh, pos_l, meas_l)

        calls = []
        orig = pms.multislice_dp_fused

        def counting(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(pms, "multislice_dp_fused", counting)
        pms.set_interpret(True)
        try:
            vf, gf = jax.jit(jax.value_and_grad(loss_f))(params_sh, pos_l, meas_l)
            vf, gf = jax.device_get(vf), jax.device_get(gf)
        finally:
            pms.set_interpret(False)
        assert calls, "canvas loss did not dispatch the fused kernel"

        np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5)

        def close(b_arr, a, name):
            # noise-data gradients here are tiny (max ~1e-4); the two paths
            # differ only in f32 accumulation order (Karatsuba GEMM passes +
            # k-space vs real-space probe shift), so tolerate absolute noise
            # at ~1e-3 of the gradient's own max
            tol = max(1e-3 * float(np.abs(a).max()), 1e-9)
            np.testing.assert_allclose(b_arr, a, atol=tol, err_msg=name)

        for name in ("obja", "objp"):
            close(unshard_canvas(np.asarray(getattr(gf, name)), noy),
                  unshard_canvas(np.asarray(getattr(gx, name)), noy), name)
        close(np.asarray(gf.probe_pos_shifts), np.asarray(gx.probe_pos_shifts),
              "probe_pos_shifts")
        for comp in ("re", "im"):
            close(np.asarray(getattr(gf.probe, comp)),
                  np.asarray(getattr(gx.probe, comp)), f"probe.{comp}")
