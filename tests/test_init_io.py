"""Initializer, I/O, params-schema, and end-to-end CLI workflow tests."""

import os

import numpy as np
import pytest

from ptyrad_tpu.initialization import Initializer
from ptyrad_tpu.load import (
    load_array_from_file,
    load_hdf5,
    load_params,
    load_ptyrad,
    load_raw,
    load_tif,
)
from ptyrad_tpu.params import PtyRADParams
from ptyrad_tpu.save import save_array, save_dict_to_hdf5
from ptyrad_tpu.utils.nested import get_nested, handle_hdf5_types


def synth_meas(rng, n_scans=16, npix=32):
    # bright central disk + weak background, like a CBED stack
    y, x = np.mgrid[:npix, :npix] - npix // 2
    disk = (np.hypot(y, x) < npix // 5).astype(np.float32)
    meas = disk[None] * (1 + 0.05 * rng.standard_normal((n_scans, npix, npix)).astype(np.float32))
    return np.clip(meas, 0, None) + 1e-4


def base_init_params(rng, tmp_path=None, n_scans=16, npix=32, **over):
    meas = synth_meas(rng, n_scans, npix)
    side = int(np.sqrt(n_scans))
    p = {
        "probe_illum_type": "electron",
        "probe_kv": 80.0,
        "probe_conv_angle": 24.9,
        "meas_Npix": npix,
        "pos_N_scans": n_scans,
        "pos_N_scan_slow": side,
        "pos_N_scan_fast": side,
        "pos_scan_step_size": 0.43,
        "meas_calibration": {"mode": "dx", "value": 0.15},
        "probe_pmode_max": 2,
        "probe_pmode_init_pows": [0.05],
        "obj_omode_max": 1,
        "obj_omode_init_occu": {"occu_type": "uniform"},
        "obj_Nlayer": 2,
        "obj_slice_thickness": 2.0,
        "meas_source": "custom",
        "meas_params": meas,
        "probe_source": "simu",
        "probe_params": None,
        "pos_source": "simu",
        "pos_params": None,
        "obj_source": "simu",
        "obj_params": None,
        "tilt_source": "simu",
        "tilt_params": {"tilt_type": "all", "init_tilts": [[0, 0]]},
        "pos_scan_rand_std": None,
    }
    p.update(over)
    return p


class TestInitializer:
    def test_init_all_consistent(self, rng):
        init = Initializer(base_init_params(rng), verbose=False).init_all()
        v = init.init_variables
        assert v["measurements"].shape == (16, 32, 32)
        assert v["probe"].shape == (2, 32, 32)
        assert v["crop_pos"].shape == (16, 2)
        assert v["obj"].shape[0] == 1 and v["obj"].shape[1] == 2
        assert v["obj_tilts"].shape == (1, 2)
        # probe intensity normalized to meas_avg_sum
        np.testing.assert_allclose(
            np.sum(np.abs(v["probe"]) ** 2), v["meas_avg_sum"], rtol=1e-4
        )
        # positions fit inside object canvas
        assert (v["crop_pos"].min(0) >= 0).all()
        assert (v["crop_pos"].max(0) + 32 <= np.array(v["obj"].shape[-2:])).all()

    def test_calibration_modes(self, rng):
        lam_dx = {}
        for mode, value in [("dx", 0.15), ("dk", 1 / (32 * 0.15)), ("kMax", 1 / (2 * 0.15))]:
            p = base_init_params(rng, meas_calibration={"mode": mode, "value": value})
            init = Initializer(p, verbose=False)
            init.init_measurements()
            init.init_calibration()
            lam_dx[mode] = init.init_params["probe_dx"]
        assert lam_dx["dx"] == pytest.approx(0.15)
        assert lam_dx["dk"] == pytest.approx(0.15, rel=1e-6)
        assert lam_dx["kMax"] == pytest.approx(0.15, rel=1e-6)

    def test_fitRBF_calibration(self, rng):
        p = base_init_params(rng, meas_calibration={"mode": "fitRBF"})
        init = Initializer(p, verbose=False)
        init.init_measurements()
        init.init_calibration()
        # disk radius ~ npix//5 = 6.4 px; dx = RBF*lambda/(conv*1e-3*Npix)
        assert init.init_variables["fitRBF"] == pytest.approx(6.4, rel=0.1)
        assert init.init_params["probe_dx"] > 0

    def test_meas_crop_updates_geometry(self, rng):
        p = base_init_params(
            rng, meas_crop=[[0, 2], [0, 2], [8, 24], [8, 24]],
            meas_calibration={"mode": "dx", "value": 0.15},
        )
        init = Initializer(p, verbose=False)
        init.init_measurements()
        assert init.init_variables["measurements"].shape == (4, 16, 16)
        assert init.init_params["meas_Npix"] == 16
        assert init.init_params["pos_N_scans"] == 4
        init.init_calibration()
        # k-crop by 2x doubles dx
        assert init.init_params["probe_dx"] == pytest.approx(0.30, rel=1e-6)

    def test_meas_pad_on_the_fly(self, rng):
        p = base_init_params(
            rng,
            meas_pad={"mode": "on_the_fly", "padding_type": "power", "target_Npix": 48, "threshold": 70},
        )
        init = Initializer(p, verbose=False)
        init.init_measurements()
        assert init.init_params["meas_Npix"] == 48
        padded = init.init_variables["on_the_fly_meas_padded"]
        assert padded.shape == (48, 48)
        h1, h2, w1, w2 = init.init_variables["on_the_fly_meas_padded_idx"]
        assert (h2 - h1, w2 - w1) == (32, 32)
        assert np.all(padded[h1:h2, w1:w2] == 0)  # center zeroed, data goes there

    def test_meas_pad_precompute(self, rng):
        p = base_init_params(
            rng, meas_pad={"mode": "precompute", "padding_type": "edge", "target_Npix": 40},
        )
        init = Initializer(p, verbose=False)
        init.init_measurements()
        assert init.init_variables["measurements"].shape == (16, 40, 40)

    def test_meas_resample_precompute(self, rng):
        p = base_init_params(
            rng, meas_resample={"mode": "precompute", "scale_factors": [0.5, 0.5]},
        )
        init = Initializer(p, verbose=False)
        init.init_measurements()
        assert init.init_variables["measurements"].shape == (16, 16, 16)
        assert init.init_params["meas_Npix"] == 16

    def test_meas_poisson_noise(self, rng):
        p = base_init_params(
            rng, meas_add_poisson_noise={"unit": "total_e_per_pattern", "value": 1e4},
        )
        init_noisy = Initializer(p, verbose=False)
        init_noisy.init_measurements()
        clean = Initializer(base_init_params(rng), verbose=False)
        clean.init_measurements()
        m_noisy = init_noisy.init_variables["measurements"]
        m_clean = clean.init_variables["measurements"]
        assert not np.allclose(m_noisy, m_clean)
        # noise preserves mean intensity scale
        assert m_noisy.mean() == pytest.approx(m_clean.mean(), rel=0.05)

    def test_meas_flipT_and_normalization(self, rng):
        meas = synth_meas(rng)
        meas[:, :5, :] *= 2  # break symmetry
        p = base_init_params(rng, meas_params=meas, meas_flipT=[1, 0, 0],
                             meas_normalization={"mode": "mean_at_one"})
        init = Initializer(p, verbose=False)
        init.init_measurements()
        out = init.init_variables["measurements"]
        assert out.mean(0).mean() == pytest.approx(1.0, rel=1e-4)
        # flipud applied on ky
        assert out[:, -5:, :].mean() > out[:, :5, :].mean()

    def test_simulated_positions_raster(self, rng):
        init = Initializer(base_init_params(rng), verbose=False).init_all()
        pos = init.init_variables["crop_pos"] + init.init_variables["probe_pos_shifts"]
        pos = pos.reshape(4, 4, 2)
        # raster spacing = step/dx px
        step_px = 0.43 / 0.15
        np.testing.assert_allclose(np.diff(pos[:, 0, 0]), step_px, atol=0.01)
        np.testing.assert_allclose(np.diff(pos[0, :, 1]), step_px, atol=0.01)

    def test_scan_affine_scales_extent(self, rng):
        p0 = Initializer(base_init_params(rng), verbose=False).init_all()
        p2 = Initializer(
            base_init_params(rng, pos_scan_affine=[2.0, 0.0, 0.0, 0.0]), verbose=False
        ).init_all()
        ext0 = p0.init_variables["crop_pos"].max(0) - p0.init_variables["crop_pos"].min(0)
        ext2 = p2.init_variables["crop_pos"].max(0) - p2.init_variables["crop_pos"].min(0)
        np.testing.assert_allclose(ext2, 2 * ext0, atol=2)

    def test_tilt_each(self, rng):
        p = base_init_params(rng, tilt_params={"tilt_type": "each", "init_tilts": [[1.0, -0.5]]})
        init = Initializer(p, verbose=False).init_all()
        tilts = init.init_variables["obj_tilts"]
        assert tilts.shape == (16, 2)
        np.testing.assert_allclose(tilts, [[1.0, -0.5]] * 16)

    def test_init_check_catches_bad_nlayer(self, rng):
        p = base_init_params(rng, obj_source="custom",
                             obj_params=np.ones((1, 5, 100, 100), np.complex64))
        init = Initializer(p, verbose=False)
        with pytest.raises(ValueError, match="Nlayer"):
            init.init_all()


class TestRoundtripIO:
    def test_raw_roundtrip(self, rng, tmp_path):
        data = rng.standard_normal((4, 8, 8)).astype(np.float32)
        path = str(tmp_path / "test.raw")
        gap = 16
        with open(path, "wb") as f:
            for frame in data:
                f.write(frame.tobytes())
                f.write(b"\x00" * gap)
        loaded = load_raw(path, (4, 8, 8), gap=gap)
        np.testing.assert_array_equal(loaded, data)

    def test_raw_loads_writable(self, rng, tmp_path):
        """Both raw paths (C fastraw and the NumPy fallback) must return a
        WRITABLE array — callers clip measurements in place (review r4; the
        C path used to wrap immutable bytes)."""
        data = rng.standard_normal((4, 8, 8)).astype(np.float32)
        path = str(tmp_path / "w.raw")
        with open(path, "wb") as f:
            f.write(data.tobytes())
        loaded = load_raw(path, (4, 8, 8), gap=0)
        assert loaded.flags.writeable
        loaded[loaded < 0] = 0  # must not raise

    def test_raw_meas_reruns_after_crop(self, rng, tmp_path):
        """Staged re-init: meas_crop overwrites the working pos_N_scans /
        meas_Npix; a second init_measurements must still derive the default
        .raw shape from the ON-DISK geometry (review r4)."""
        data = (rng.random((16, 8, 8)) + 0.1).astype(np.float32)
        path = str(tmp_path / "m.raw")
        with open(path, "wb") as f:
            f.write(data.tobytes())
        p = base_init_params(
            rng, meas_source="raw", meas_params={"path": path, "gap": 0},
        )
        p["pos_N_scan_slow"] = p["pos_N_scan_fast"] = 4
        p["pos_N_scans"] = 16
        p["meas_Npix"] = 8
        p["meas_crop"] = [[0, 2], [0, 2], None, None]
        init = Initializer(p, verbose=False)
        init.init_measurements()
        first = init.init_variables["measurements"].copy()
        init.init_measurements()  # re-run must reload at on-disk shape
        np.testing.assert_array_equal(init.init_variables["measurements"], first)

    def test_raw_size_mismatch(self, rng, tmp_path):
        path = str(tmp_path / "bad.raw")
        with open(path, "wb") as f:
            f.write(b"\x00" * 100)
        with pytest.raises(ValueError, match="size mismatch|File size"):
            load_raw(path, (4, 8, 8), gap=16)

    def test_tif_roundtrip(self, rng, tmp_path):
        data = rng.standard_normal((3, 8, 8)).astype(np.float32)
        path = save_array(data, str(tmp_path), "stack", "tif", append_shape=False)
        np.testing.assert_allclose(load_tif(path), data)

    def test_hdf5_roundtrip_with_sentinels(self, tmp_path, rng):
        d = {
            "a": 1, "b": 2.5, "c": "text", "d": None,
            "arr": rng.standard_normal((3, 3)).astype(np.float32),
            "nested": {"x": [1, 2, 3], "y": None},
            "cplx": (rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))).astype(np.complex64),
        }
        path = str(tmp_path / "dict.hdf5")
        save_dict_to_hdf5(d, path)
        loaded = load_hdf5(path)
        assert loaded["a"] == 1 and loaded["b"] == 2.5 and loaded["c"] == "text"
        assert loaded["d"] is None and loaded["nested"]["y"] is None
        np.testing.assert_allclose(loaded["arr"], d["arr"])
        np.testing.assert_allclose(loaded["cplx"], d["cplx"], atol=1e-6)

    def test_load_array_dispatch(self, rng, tmp_path):
        data = rng.standard_normal((4, 4)).astype(np.float32)
        npy = str(tmp_path / "a.npy")
        np.save(npy, data)
        np.testing.assert_array_equal(load_array_from_file(npy), data)
        with pytest.raises(ValueError, match="Unsupported file type"):
            load_array_from_file(__file__)

    def test_mat_roundtrip(self, rng, tmp_path):
        import scipy.io as sio

        from ptyrad_tpu.load import load_mat

        path = str(tmp_path / "t.mat")
        sio.savemat(path, {"probe": rng.standard_normal((4, 4)), "nested": {"x": 3.0}})
        probe = load_mat(path, key="probe")
        assert probe.shape == (4, 4)
        assert load_mat(path, key="nested.x") == 3.0

    def test_nested_utils(self):
        d = {"a": {"b": {"c": 7}}}
        assert get_nested(d, "a.b.c") == 7
        assert get_nested(d, "a.b.missing", safe=True, default=-1) == -1
        with pytest.raises(KeyError):
            get_nested(d, "a.z")
        assert handle_hdf5_types(b"hello") == "hello"
        assert handle_hdf5_types("__NONE__") is None


class TestParamsSchema:
    def minimal(self, **over):
        d = {
            "init_params": {
                "probe_kv": 80.0, "probe_conv_angle": 24.9, "meas_Npix": 64,
                "pos_N_scan_slow": 8, "pos_N_scan_fast": 8, "pos_scan_step_size": 0.43,
                "probe_pmode_max": 4, "obj_Nlayer": 3, "obj_slice_thickness": 2.0,
                "meas_params": {"path": "data.h5", "key": "dp"},
            }
        }
        d.update(over)
        return d

    def test_defaults_filled(self):
        p = PtyRADParams(**self.minimal()).model_dump()
        assert p["init_params"]["pos_N_scans"] == 64
        assert p["model_params"]["optimizer_params"]["name"] == "Adam"
        assert p["recon_params"]["NITER"] == 200
        assert p["loss_params"]["loss_single"]["state"] is True
        assert p["constraint_params"]["ortho_pmode"]["freq"] == 1

    def test_shipped_demo_params_validate(self):
        """Every YAML in demo/params/ must pass the schema — they are the
        documented entry points (quickstart, shard_canvas launch guide)."""
        import glob

        import yaml

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ymls = sorted(glob.glob(os.path.join(repo, "demo", "params", "*.yml")))
        assert len(ymls) >= 3  # tBL_WSe2, PSO, largeFOV_shard_canvas
        for path in ymls:
            with open(path) as f:
                PtyRADParams(**yaml.safe_load(f))

    def test_extra_forbidden(self):
        bad = self.minimal()
        bad["init_params"]["bogus_field"] = 1
        with pytest.raises(Exception):
            PtyRADParams(**bad)

    def test_bad_optimizer_rejected(self):
        bad = self.minimal(model_params={"optimizer_params": {"name": "NotAnOpt"}})
        with pytest.raises(Exception):
            PtyRADParams(**bad)

    def test_source_params_pair_validated(self):
        bad = self.minimal()
        bad["init_params"]["probe_source"] = "PtyRAD"
        bad["init_params"]["probe_params"] = {"not": "a path"}
        with pytest.raises(Exception):
            PtyRADParams(**bad)

    def test_all_data_terms_off_rejected(self):
        bad = self.minimal(loss_params={
            "loss_single": {"state": False}, "loss_poissn": {"state": False},
            "loss_pacbed": {"state": False},
        })
        with pytest.raises(Exception):
            PtyRADParams(**bad)

    def test_electron_missing_kv_rejected(self):
        bad = self.minimal()
        del bad["init_params"]["probe_kv"]
        with pytest.raises(Exception):
            PtyRADParams(**bad)


class TestEndToEndWorkflow:
    def test_cli_run_from_yaml(self, rng, tmp_path):
        """The reference golden path: params YAML + data file -> CLI run ->
        output folder with checkpoint + images."""
        import yaml

        from ptyrad_tpu.cli import main

        meas = synth_meas(rng, n_scans=16, npix=32)
        meas_path = str(tmp_path / "meas.npy")
        np.save(meas_path, meas)

        params = {
            "init_params": {
                "probe_kv": 80.0, "probe_conv_angle": 24.9, "meas_Npix": 32,
                "pos_N_scan_slow": 4, "pos_N_scan_fast": 4, "pos_scan_step_size": 0.43,
                "meas_calibration": {"mode": "dx", "value": 0.15},
                "probe_pmode_max": 2, "obj_Nlayer": 1, "obj_slice_thickness": 2.0,
                "meas_source": "file", "meas_params": {"path": meas_path},
                "pos_scan_rand_std": 0.0,
            },
            "model_params": {
                "update_params": {
                    "obja": {"start_iter": 1, "lr": 1e-3},
                    "objp": {"start_iter": 1, "lr": 1e-3},
                    "probe": {"start_iter": 1, "lr": 1e-4},
                },
            },
            "recon_params": {
                "NITER": 3, "SAVE_ITERS": 2, "BATCH_SIZE": {"size": 8},
                "output_dir": str(tmp_path / "output"),
                "save_result": ["model", "objp", "obja", "probe"],
                "result_modes": {"obj_dim": [2], "FOV": ["full"], "bit": ["raw"]},
                "selected_figs": [],
                "prefix_time": False,
            },
        }
        params_path = str(tmp_path / "recon.yml")
        with open(params_path, "w") as f:
            yaml.safe_dump(params, f)

        assert main(["validate-params", "--params_path", params_path]) == 0
        assert main(["run", "--params_path", params_path]) == 0

        out_dirs = os.listdir(tmp_path / "output")
        assert len(out_dirs) == 1
        out = tmp_path / "output" / out_dirs[0]
        files = os.listdir(out)
        assert any(f.startswith("model") and f.endswith(".hdf5") for f in files)
        assert any(f.startswith("objp") for f in files)
        assert any(f.startswith("probe_amp") for f in files)
        assert "recon.yml" in files  # provenance copy

        # checkpoint resumes: load it and check tensor shapes
        ckpt_file = sorted(f for f in files if f.startswith("model"))[-1]
        ckpt = load_ptyrad(str(out / ckpt_file))
        assert ckpt["optimizable_tensors"]["probe"].shape == (2, 32, 32)
        assert ckpt["optimizable_tensors"]["obja"].ndim == 4
        assert ckpt["model_attributes"]["dx"] == pytest.approx(0.15)

    def test_cli_run_shard_canvas(self, rng, tmp_path):
        """The golden path on a mesh with recon_params.shard_canvas: params
        YAML -> CLI run --n_devices 2 -> canvas-sharded solver -> output
        folder with checkpoint + images. The saved canvases must come back
        WHOLE (padding rows dropped) — same shapes as a replicated run of
        the identical params."""
        import yaml

        from ptyrad_tpu.cli import main

        meas = synth_meas(rng, n_scans=36, npix=32)
        meas_path = str(tmp_path / "meas.npy")
        np.save(meas_path, meas)

        def params_for(outdir, shard, load_state=None):
            model_params = {
                "update_params": {
                    "obja": {"start_iter": 1, "lr": 1e-3},
                    "objp": {"start_iter": 1, "lr": 1e-3},
                },
            }
            if load_state:
                model_params["optimizer_params"] = {
                    "name": "Adam", "load_state": load_state}
            return {
                "init_params": {
                    "probe_kv": 80.0, "probe_conv_angle": 24.9, "meas_Npix": 32,
                    "pos_N_scan_slow": 6, "pos_N_scan_fast": 6,
                    "pos_scan_step_size": 1.0,
                    "meas_calibration": {"mode": "dx", "value": 0.15},
                    "probe_pmode_max": 1, "obj_Nlayer": 1,
                    "obj_slice_thickness": 2.0,
                    "meas_source": "file", "meas_params": {"path": meas_path},
                    "pos_scan_rand_std": 0.0,
                },
                "model_params": model_params,
                "recon_params": {
                    "NITER": 2, "SAVE_ITERS": 2, "BATCH_SIZE": {"size": 18},
                    "shard_canvas": shard,
                    "output_dir": str(tmp_path / outdir),
                    "save_result": ["model", "objp", "optim_state"],
                    "result_modes": {"obj_dim": [2], "FOV": ["full"], "bit": ["raw"]},
                    "selected_figs": [],
                    "prefix_time": False,
                },
            }

        def run_and_load(outdir, shard, extra_args, load_state=None):
            params_path = str(tmp_path / f"recon_{outdir}.yml")
            with open(params_path, "w") as f:
                yaml.safe_dump(params_for(outdir, shard, load_state), f)
            assert main(["run", "--params_path", params_path, *extra_args]) == 0
            out_dirs = os.listdir(tmp_path / outdir)
            assert len(out_dirs) == 1
            out = tmp_path / outdir / out_dirs[0]
            files = os.listdir(out)
            assert any(f.startswith("objp") for f in files)
            ckpt_file = sorted(f for f in files if f.startswith("model"))[-1]
            return load_ptyrad(str(out / ckpt_file)), str(out / ckpt_file)

        ckpt_rep, _ = run_and_load("out_rep", False, [])
        ckpt_sh, sh_ckpt = run_and_load("out_sh", True, ["--n_devices", "2"])
        a_rep = ckpt_rep["optimizable_tensors"]["obja"]
        a_sh = ckpt_sh["optimizable_tensors"]["obja"]
        assert a_sh.shape == a_rep.shape  # whole canvas, padding dropped
        assert np.all(np.isfinite(a_sh))

        # the sharded run's optim-state checkpoint carries the SAME keys and
        # (unpadded) shapes a replicated run writes — one canonical format
        od_rep, od_sh = ckpt_rep["optim_state_dict"], ckpt_sh["optim_state_dict"]
        assert set(od_sh) == set(od_rep)
        for k in od_rep:
            assert np.asarray(od_sh[k]).shape == np.asarray(od_rep[k]).shape, k

        # resume a fresh sharded run from the sharded run's hdf5 via the CLI:
        # the restored Adam step counter keeps counting (fresh state would
        # reset it), proving the moments were actually loaded
        def max_count(od):
            return max(int(np.asarray(v)) for k, v in od.items()
                       if k.endswith(".count"))

        ckpt_res, _ = run_and_load(
            "out_res", True, ["--n_devices", "2"], load_state=sh_ckpt)
        assert max_count(ckpt_res["optim_state_dict"]) == \
            2 * max_count(ckpt_sh["optim_state_dict"])

    def test_resume_from_checkpoint(self, rng, tmp_path):
        """Reconstruct, save, then re-initialize obj/probe/pos from the
        checkpoint (reference resume path, SURVEY §5)."""
        # build and run a tiny reconstruction directly
        from ptyrad_tpu.engine.solver import PtyRADSolver
        from ptyrad_tpu.save import save_results

        p = base_init_params(rng)
        init = Initializer(p, verbose=False).init_all()
        cfg = {
            "model_params": {"update_params": {"objp": {"lr": 1e-3, "start_iter": 1}}},
            "recon_params": {"NITER": 2, "BATCH_SIZE": {"size": 8}},
        }
        solver = PtyRADSolver(cfg, init_variables=init.init_variables, verbose=False)
        solver.run()
        out = str(tmp_path / "ckpt")
        save_results(
            out, solver.params, solver.buffers, solver.geom,
            {"recon_params": {"save_result": ["model"]}},
            solver.opt_state, solver.history, 2, solver.indices,
        )
        ckpt_path = os.path.join(out, "model_iter0002.hdf5")
        assert os.path.exists(ckpt_path)

        # resume: sources = PtyRAD for obj/probe/pos
        p2 = base_init_params(
            rng,
            obj_source="PtyRAD", obj_params=ckpt_path,
            probe_source="PtyRAD", probe_params=ckpt_path,
            pos_source="PtyRAD", pos_params=ckpt_path,
        )
        init2 = Initializer(p2, verbose=False).init_all()
        np.testing.assert_allclose(
            np.angle(init2.init_variables["obj"]),
            np.asarray(solver.params.objp), atol=1e-5,
        )
        np.testing.assert_array_equal(
            init2.init_variables["crop_pos"], np.asarray(solver.buffers.crop_pos)
        )


class TestFastRaw:
    def test_native_reader_matches_numpy_path(self, rng, tmp_path):
        from ptyrad_tpu.native import load_fastraw

        fastraw = load_fastraw()
        if fastraw is None:
            pytest.skip("no C compiler available")
        for offset, gap in [(0, 1024), (128, 0), (7, 33)]:
            data = rng.standard_normal((5, 16, 16)).astype(np.float32)
            path = str(tmp_path / f"t_{offset}_{gap}.raw")
            with open(path, "wb") as f:
                f.write(b"\xAB" * offset)
                for frame in data:
                    f.write(frame.tobytes())
                    f.write(b"\x00" * gap)
            loaded = load_raw(path, (5, 16, 16), offset=offset, gap=gap)
            np.testing.assert_array_equal(loaded, data)

    def test_truncated_file_raises_not_segfaults(self, rng, tmp_path):
        from ptyrad_tpu.native import load_fastraw

        fastraw = load_fastraw()
        if fastraw is None:
            pytest.skip("no C compiler available")
        data = rng.standard_normal((4, 8, 8)).astype(np.float32)
        path = str(tmp_path / "trunc.raw")
        with open(path, "wb") as f:
            for frame in data:
                f.write(frame.tobytes())
        # claim 8 frames in a 4-frame file, bypassing load_raw's size check —
        # the C extension must bounds-check against st_size itself
        with pytest.raises(ValueError, match="too small"):
            fastraw.read_frames(path, 8, 8, 8, 4, 0, 0, 2)
        # a file whose last frame has no trailing gap is still legal
        path2 = str(tmp_path / "nogap.raw")
        with open(path2, "wb") as f:
            for i, frame in enumerate(data):
                f.write(frame.tobytes())
                if i < len(data) - 1:
                    f.write(b"\x00" * 16)
        out = fastraw.read_frames(path2, 4, 8, 8, 4, 0, 16, 2)
        np.testing.assert_array_equal(
            np.frombuffer(out, np.float32).reshape(4, 8, 8), data
        )

    def test_fallback_when_native_unavailable(self, rng, tmp_path, monkeypatch):
        import ptyrad_tpu.load as load_mod

        monkeypatch.setattr("ptyrad_tpu.native.load_fastraw", lambda: None)
        data = rng.standard_normal((3, 8, 8)).astype(np.float32)
        path = str(tmp_path / "fb.raw")
        with open(path, "wb") as f:
            for frame in data:
                f.write(frame.tobytes())
                f.write(b"\x00" * 64)
        loaded = load_mod.load_raw(path, (3, 8, 8), gap=64)
        np.testing.assert_array_equal(loaded, data)


class TestReviewFixesR3:
    def test_callback_receives_live_opt_state(self, rng):
        """Mid-run callbacks must receive the LOOP's opt_state (the jitted
        steps donate their inputs; solver.opt_state is stale/deleted during
        the run — review r3)."""
        from ptyrad_tpu.engine.solver import PtyRADSolver

        p = base_init_params(rng)
        init = Initializer(p, verbose=False).init_all()
        cfg = {
            "model_params": {"update_params": {"objp": {"lr": 1e-3, "start_iter": 1}}},
            "recon_params": {"NITER": 2, "BATCH_SIZE": {"size": 8}},
        }
        solver = PtyRADSolver(cfg, init_variables=init.init_variables, verbose=False)
        seen = []

        def cb(niter, cur_params, history, opt_state=None):
            import jax

            # the live state must have a nonzero Adam step count by iter 1
            counts = [x for x in jax.tree_util.tree_leaves(opt_state)
                      if hasattr(x, "shape") and x.ndim == 0]
            seen.append(max(int(c) for c in counts) if counts else None)

        solver.run(callback=cb)
        assert seen and all(s and s > 0 for s in seen)

    def test_start_iter_affix_skips_defaults(self):
        """Folder start_iter tags appear only for delayed (>1) starts with
        the reference's per-tensor naming (reference save.py:347-360) — no
        'siNone' artifacts from schema defaults."""
        from ptyrad_tpu.save import make_output_folder

        params_dict = {
            "model_params": {
                "update_params": {
                    "objp": {"lr": 1e-3, "start_iter": 1},
                    "probe_pos_shifts": {"lr": 1e-4, "start_iter": 10},
                    "obj_tilts": {"lr": 0.0, "start_iter": None},
                },
            },
            "recon_params": {},
        }
        name = make_output_folder(
            "/tmp/ptyrad_tpu_affix_test", np.arange(4), params_dict, None,
            None, recon_dir_affixes=["start_iter"], make_dir=False,
        )
        assert "ss10" in name
        assert "None" not in name and "si1" not in name

    def test_lr_affix_per_tensor_tags(self):
        """Folder lr tags carry the reference's per-tensor names in its
        fixed order (reference save.py:362-377), not anonymous values."""
        from ptyrad_tpu.save import make_output_folder

        params_dict = {
            "model_params": {
                "update_params": {
                    "objp": {"lr": 5e-4, "start_iter": 1},
                    "probe": {"lr": 1e-4, "start_iter": 1},
                },
            },
            "recon_params": {},
        }
        name = make_output_folder(
            "/tmp/ptyrad_tpu_affix_test", np.arange(4), params_dict, None,
            None, recon_dir_affixes=["lr"], make_dir=False,
        )
        assert "plr1e-4" in name and "oplr5e-4" in name
        assert name.index("plr1e-4") < name.index("oplr5e-4")  # reference order

    def test_prefix_time_named_presets(self):
        """'date'/'time'/'datetime' map to real formats (reference
        get_time, utils/common.py:511) instead of literal strftime text."""
        from ptyrad_tpu.save import make_output_folder

        for preset, digits in (("date", 8), ("time", 6), ("datetime", 15)):
            name = make_output_folder(
                "/tmp/ptyrad_tpu_affix_test", np.arange(4),
                {"recon_params": {"prefix_time": preset}}, None, None,
                recon_dir_affixes=["indices"], make_dir=False,
            )
            stamp = os.path.basename(name).split("_")[0] if preset != "datetime" else \
                "_".join(os.path.basename(name).split("_")[:2])
            assert "datetime" not in name and "time" not in os.path.basename(name)
            assert len(stamp) == digits, (preset, name)

    def test_save_array_mat_and_meas_key(self, tmp_path):
        """file_format 'mat' writes HDF5 (py4DGUI compat) and all HDF5-family
        exports use dataset name 'meas' with the extension following the
        format (reference save.py:32-38, 67-79)."""
        import h5py

        data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        for fmt in ("mat", "h5", "hdf5"):
            path = save_array(data, str(tmp_path), f"exp_{fmt}", fmt, append_shape=False)
            assert path.endswith("." + fmt)
            with h5py.File(path, "r") as hf:
                np.testing.assert_array_equal(hf["meas"][()], data)

    def test_load_hdf5_delimiter_and_literal_keys(self, tmp_path):
        """The delimiter maps nested paths; a dataset literally named with a
        dot resolves verbatim (review r3: delimiter was accepted but unused)."""
        import h5py

        from ptyrad_tpu.load import load_hdf5

        path = str(tmp_path / "t.h5")
        with h5py.File(path, "w") as hf:
            hf.create_group("outputs")
            hf["outputs"].create_dataset("probe", data=np.arange(3.0))
            hf.create_dataset("literal.name", data=np.arange(5.0))
        assert load_hdf5(path, key="outputs.probe").shape == (3,)
        assert load_hdf5(path, key="outputs/probe").shape == (3,)
        assert load_hdf5(path, key="literal.name").shape == (5,)
        out = load_hdf5(path, key=["outputs.probe", "literal.name"])
        assert out["outputs.probe"].shape == (3,)
        assert out["literal.name"].shape == (5,)

    def test_probe_prop_output_gated_and_written(self, rng, tmp_path):
        """propagated_probe is computed (jitted) ONLY when 'probe_prop' is
        requested — an unconditional eager computation cost minutes of remote
        compiles per checkpoint on tunneled backends (review r3)."""
        import os

        from ptyrad_tpu.engine.solver import PtyRADSolver
        from ptyrad_tpu.save import save_results

        p = base_init_params(rng)
        init = Initializer(p, verbose=False).init_all()
        cfg = {
            "model_params": {"update_params": {"objp": {"lr": 1e-3, "start_iter": 1}}},
            "recon_params": {"NITER": 1, "BATCH_SIZE": {"size": 8}},
        }
        solver = PtyRADSolver(cfg, init_variables=init.init_variables, verbose=False)
        solver.run()
        out1 = str(tmp_path / "noprop")
        save_results(out1, solver.params, solver.buffers, solver.geom,
                     {"recon_params": {"save_result": ["probe"]}},
                     solver.opt_state, solver.history, 1, solver.indices)
        assert not any("probe_prop" in f for f in os.listdir(out1))
        out2 = str(tmp_path / "prop")
        save_results(out2, solver.params, solver.buffers, solver.geom,
                     {"recon_params": {"save_result": ["probe_prop"]}},
                     solver.opt_state, solver.history, 1, solver.indices)
        assert any(f.startswith("probe_prop_amp") for f in os.listdir(out2))

    def test_init_measurements_rerunnable_with_crop(self, rng):
        """Staged hypertune re-init re-runs init_measurements; with meas_crop
        set, the second run must not reshape the raw data with the already-
        cropped scan counts (review r3)."""
        p = base_init_params(
            rng, meas_crop=[[0, 2], [0, 2], [8, 24], [8, 24]],
        )
        init = Initializer(p, verbose=False)
        init.init_measurements()
        assert init.init_variables["measurements"].shape == (4, 16, 16)
        init.init_measurements()  # re-run: must be idempotent
        assert init.init_variables["measurements"].shape == (4, 16, 16)

    def test_init_measurements_rerunnable_with_otf_resample(self, rng):
        """With meas_resample on_the_fly, re-running init_measurements must
        NOT double-apply the scale: the base Npix comes from the data, not
        the working-copy meas_Npix a previous run already scaled (review r4)."""
        p = base_init_params(
            rng, meas_resample={"mode": "on_the_fly", "scale_factors": [0.5, 0.5]},
        )
        init = Initializer(p, verbose=False)
        init.init_measurements()
        npix1 = init.init_params["meas_Npix"]
        scale1 = list(init.init_variables["on_the_fly_meas_scale_factors"])
        init.init_measurements()  # re-run: must be idempotent
        assert init.init_params["meas_Npix"] == npix1
        assert list(init.init_variables["on_the_fly_meas_scale_factors"]) == scale1

    def test_custom_ndarray_source_not_deepcopied(self, rng):
        """In-memory 'custom' measurement arrays must be SHARED into the
        Initializer's config copies, not duplicated (a 20 GB array would
        otherwise become 60 GB resident — review r3)."""
        meas = synth_meas(rng)
        p = base_init_params(rng, meas_params=meas)
        init = Initializer(p, verbose=False)
        assert init.init_params["meas_params"] is meas
        assert init.init_params_original["meas_params"] is meas
        # scalar mutation still isolated between the copies
        init.init_params["meas_Npix"] = 999
        assert init.init_params_original["meas_Npix"] != 999


class TestWorkflowSaveSemantics:
    def _cfg(self, rng, tmp_path, niter, save_iters, selected_figs):
        return {
            "init_params": base_init_params(rng),
            "model_params": {
                "update_params": {
                    "objp": {"start_iter": 1, "lr": 1e-3},
                },
            },
            "recon_params": {
                "NITER": niter, "SAVE_ITERS": save_iters,
                "BATCH_SIZE": {"size": 8},
                "output_dir": str(tmp_path / "output"),
                "save_result": ["model", "objp"],
                "result_modes": {"obj_dim": [2], "FOV": ["full"], "bit": ["raw"]},
                "selected_figs": selected_figs,
                "prefix_time": False,
            },
        }

    def test_final_save_skipped_when_aligned(self, rng, tmp_path, monkeypatch):
        """When the last iteration lands on a SAVE_ITERS boundary the
        callback already wrote that exact checkpoint — the unconditional
        final save_results would rewrite a multi-GB HDF5 for nothing
        (review r5). Misaligned runs still get the final save."""
        import ptyrad_tpu.engine.workflow as wf

        calls = []
        orig = wf.save_results

        def counting(*a, **k):
            calls.append(a[7])  # niter positional arg
            return orig(*a, **k)

        monkeypatch.setattr(wf, "save_results", counting)

        # aligned: NITER=4, SAVE_ITERS=2 -> callback saves at 2 and 4;
        # NO duplicate final save at 4
        wf.run_reconstruction(self._cfg(rng, tmp_path / "a", 4, 2, []))
        assert calls == [2, 4]

        # misaligned: NITER=3, SAVE_ITERS=2 -> callback at 2, final at 3
        calls.clear()
        wf.run_reconstruction(self._cfg(rng, tmp_path / "b", 3, 2, []))
        assert calls == [2, 3]

        # SAVE_ITERS=None -> only the final save
        calls.clear()
        wf.run_reconstruction(self._cfg(rng, tmp_path / "c", 2, None, []))
        assert calls == [2]

    def test_selected_figs_all_includes_grouping(self, rng, tmp_path):
        """selected_figs=['all'] enables every figure (the plot_summary
        contract) — including the position-grouping diagnostic drawn at
        prepare time, which used to be gated on the literal 'group' only
        (review r5)."""
        import glob as _glob

        import ptyrad_tpu.engine.workflow as wf

        wf.run_reconstruction(self._cfg(rng, tmp_path, 1, None, ["all"]))
        hits = _glob.glob(str(tmp_path / "output" / "*" / "summary_grouping.png"))
        assert hits, "['all'] did not produce the grouping figure"


class TestLoaderReviewFixesR5:
    def test_py_params_file_with_imports_loads(self, tmp_path):
        """A params.py may carry imports and helper functions — module and
        callable attributes must not leak into the params dict, where the
        strict schema (extra='forbid') would reject them (review r5)."""
        from ptyrad_tpu.load import load_params

        py = tmp_path / "params.py"
        py.write_text(
            "import os\n"
            "import numpy as np\n"
            "def _helper():\n"
            "    return 2\n"
            "init_params = {\n"
            "    'probe_kv': 80.0, 'probe_conv_angle': 24.9, 'meas_Npix': 32,\n"
            "    'pos_N_scan_slow': 4, 'pos_N_scan_fast': 4,\n"
            "    'pos_scan_step_size': 0.43,\n"
            "    'meas_calibration': {'mode': 'dx', 'value': 0.15},\n"
            "    'probe_pmode_max': _helper(), 'obj_Nlayer': 1,\n"
            "    'obj_slice_thickness': 2.0,\n"
            "    'meas_source': 'file', 'meas_params': {'path': 'x.npy'},\n"
            "}\n"
        )
        params = load_params(str(py))  # validate=True default
        assert params["init_params"]["probe_pmode_max"] == 2
        assert "np" not in params and "os" not in params and "_helper" not in params

    def test_empty_params_file_raises_pointed_error(self, tmp_path):
        """An empty/comment-only YAML parses to None; the loader must name
        the real problem instead of dying in dict-unpacking (review r5)."""
        from ptyrad_tpu.load import load_params

        empty = tmp_path / "empty.yml"
        empty.write_text("# nothing here\n")
        with pytest.raises(ValueError, match="empty or does not define a mapping"):
            load_params(str(empty))
        with pytest.raises(ValueError, match="empty or does not define a mapping"):
            load_params(str(empty), validate=False)

    def test_save_paths_survive_overlong_names(self, rng, tmp_path):
        """Result writes sanitize basenames through safe_filename (the
        reference guards every write): a hypertune collate string stacked on
        an 'all'-affix folder must truncate, not ENAMETOOLONG (review r5)."""
        from ptyrad_tpu.save import save_array, save_dict_to_hdf5

        long_name = "meas_" + "x" * 300
        out = save_array(np.zeros((4, 8, 8), np.float32), str(tmp_path),
                         file_name=long_name, file_format="npy")
        hits = os.listdir(tmp_path)
        assert hits and all(len(n) <= 255 for n in hits)

        save_dict_to_hdf5({"a": 1}, str(tmp_path / ("model_" + "y" * 300 + ".hdf5")))
        hits = [n for n in os.listdir(tmp_path) if n.startswith("model_")]
        assert hits and all(len(n) <= 255 for n in hits)

    def test_save_default_result_modes_match_schema(self):
        """save_results' fallback for unvalidated dicts must be the SCHEMA's
        ResultModes defaults — one source of default truth (review r5)."""
        from ptyrad_tpu.params.schema import ResultModes
        from ptyrad_tpu.save import _default_result_modes

        assert _default_result_modes() == ResultModes().model_dump()


class TestCLIExitCodes:
    def test_validate_params_invalid_file_exits_nonzero(self, tmp_path):
        """Scripted use (`validate-params … && deploy`) must see a failure
        exit code, not a printed message with status 0 (review r5)."""
        import yaml

        from ptyrad_tpu.cli import main

        bad = str(tmp_path / "bad.yml")
        with open(bad, "w") as f:
            yaml.safe_dump({"init_params": {"bogus_field": 1}}, f)
        assert main(["validate-params", "--params_path", bad]) != 0

    def test_run_multihost_flags_require_multihost(self, tmp_path, capsys):
        """--coordinator_address without --multihost must fail fast: silently
        dropping the flags (and skipping the backend hang guard with them)
        would leave a misconfigured launch running single-process (review r5)."""
        import pytest

        from ptyrad_tpu.cli import main

        with pytest.raises(SystemExit, match="--multihost"):
            main(["run", "--params_path", str(tmp_path / "p.yml"),
                  "--coordinator_address", "localhost:1234"])
