"""Tests for dev tools, optimizer-state resume, 3D interp, tilt estimation."""

import numpy as np
import pytest

from ptyrad_tpu.physics.constants import complex_object_interp3d
from ptyrad_tpu.utils.common import get_time, safe_filename, trees_to_ndarrays
from ptyrad_tpu.utils.image_proc import detect_blobs, get_local_obj_tilts


class TestInterp3D:
    def test_identity(self, rng):
        obj = (rng.standard_normal((4, 8, 8)) + 1j * rng.standard_normal((4, 8, 8))).astype(np.complex64)
        assert complex_object_interp3d(obj, (1, 1, 1)) is obj

    def test_z_conservation(self, rng):
        """Doubling z-slices must preserve the z-sum of phase and the z-product
        of amplitude (multislice physics invariants)."""
        amp = 1.0 + 0.05 * rng.random((4, 16, 16))
        phase = 0.2 * rng.random((4, 16, 16))
        obj = (amp * np.exp(1j * phase)).astype(np.complex64)
        out = complex_object_interp3d(obj, (2, 1, 1), z_axis=0)
        assert out.shape == (8, 16, 16)
        # spline interpolation overshoots pointwise; conservation is a mean /
        # coarse-pointwise property (same behavior as the reference impl)
        assert np.angle(out).sum(0).mean() == pytest.approx(phase.sum(0).mean(), rel=0.01)
        assert np.abs(out).prod(0).mean() == pytest.approx(amp.prod(0).mean(), rel=0.01)
        np.testing.assert_allclose(np.angle(out).sum(0), phase.sum(0), atol=0.1)


class TestLocalTilts:
    def test_recovers_known_shift(self, rng):
        img = np.zeros((64, 64))
        yy, xx = np.mgrid[:64, :64]
        for cy, cx in [(16, 16), (16, 48), (48, 16), (48, 48), (32, 32)]:
            img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 4)
        objp = np.stack([img, np.roll(img, (1, 2), (0, 1))])
        coords, tilts, maps = get_local_obj_tilts(
            objp, dx=0.15, slice_thickness=10.0, slice_indices=(0, 1),
            blob_params={"threshold": 0.05},
        )
        expected = np.arctan(np.array([1, 2]) * 0.15 / 10.0) * 1e3
        np.testing.assert_allclose(tilts.mean(0), expected, rtol=0.1)
        assert maps.shape == (2, 64, 64)

    def test_blob_detection_count(self):
        img = np.zeros((64, 64))
        yy, xx = np.mgrid[:64, :64]
        for cy, cx in [(20, 20), (44, 44)]:
            img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 6)
        blobs = detect_blobs(img, threshold=0.05)
        assert len(blobs) == 2


class TestOptStateResume:
    def test_roundtrip(self, rng, tmp_path):
        import jax.numpy as jnp

        from ptyrad_tpu.models import make_model
        from ptyrad_tpu.optim import create_optimizer, load_opt_state, save_opt_state
        from test_engine import make_synthetic

        init, _ = make_synthetic(rng)
        params, buffers, geom = make_model(init)
        upd = {"objp": {"lr": 1e-3, "start_iter": 1}}
        tx, st, _, _ = create_optimizer({"name": "Adam"}, upd, params)
        # advance the state so moments are nonzero
        grads = __import__("jax").tree_util.tree_map(jnp.ones_like, params)
        _, st = tx.update(grads, st, params)

        path = str(tmp_path / "opt_ckpt")
        save_opt_state(st, path)
        tx2, st_fresh, _, _ = create_optimizer({"name": "Adam"}, upd, params)
        restored = load_opt_state(st_fresh, path)

        import jax

        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(st)[0],
            jax.tree_util.tree_flatten_with_path(restored)[0],
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


class TestDevTools:
    def test_nan_checker(self, rng):
        from ptyrad_tpu.utils.dev_tools import check_nan_inf

        clean = {"a": np.ones(3), "b": {"c": np.zeros(2)}}
        assert check_nan_inf(clean)
        dirty = {"a": np.array([1.0, np.nan])}
        assert not check_nan_inf(dirty)
        with pytest.raises(FloatingPointError):
            check_nan_inf(dirty, raise_on_bad=True)

    def test_modes_ortho_checker(self, rng):
        from ptyrad_tpu.ops import cplx
        from ptyrad_tpu.utils.dev_tools import check_modes_ortho

        q, _ = np.linalg.qr(rng.standard_normal((64, 3)) + 1j * rng.standard_normal((64, 3)))
        ortho = q.T.reshape(3, 8, 8).astype(np.complex64)
        assert check_modes_ortho(ortho)
        assert check_modes_ortho(cplx.from_numpy(ortho))
        not_ortho = rng.standard_normal((3, 8, 8)) + 1j * rng.standard_normal((3, 8, 8))
        assert not check_modes_ortho(not_ortho.astype(np.complex64))

    def test_loss_and_constraint_smoke(self, rng):
        import jax.numpy as jnp

        from ptyrad_tpu.models import make_model
        from ptyrad_tpu.utils.dev_tools import test_constraint_fn, test_loss_fn
        from test_engine import make_synthetic

        init, _ = make_synthetic(rng)
        params, buffers, geom = make_model(init)
        total, terms = test_loss_fn(params, buffers, geom, np.arange(4))
        assert np.isfinite(total) and "loss_single" in terms
        out = test_constraint_fn(params, buffers, geom, {"objp_postiv": {"freq": 1, "relax": 0.0}})
        assert float(jnp.min(out.objp)) >= 0.0

    def test_yaml_to_json(self, tmp_path):
        import json

        import yaml

        from ptyrad_tpu.utils.dev_tools import yaml_to_json

        ypath = str(tmp_path / "x.yml")
        yaml.safe_dump({"a": 1, "b": [1, 2]}, open(ypath, "w"))
        jpath = yaml_to_json(ypath)
        assert json.load(open(jpath)) == {"a": 1, "b": [1, 2]}


class TestCommonUtils:
    def test_get_time_formats(self):
        assert len(get_time("date")) == 8
        assert len(get_time("datetime")) == 15

    def test_safe_filename_truncates(self):
        long = "x" * 400 + ".tif"
        out = safe_filename(long)
        assert len(os.path.basename(out)) <= 255
        assert out.endswith(".tif")

    def test_trees_to_ndarrays(self, rng):
        import jax.numpy as jnp

        from ptyrad_tpu.ops import cplx

        tree = {"a": jnp.ones(3), "c": cplx.from_numpy(np.ones(2, np.complex64)), "s": "str"}
        out = trees_to_ndarrays(tree)
        assert isinstance(out["a"], np.ndarray)
        assert out["c"].dtype == np.complex64
        assert out["s"] == "str"

    def test_trees_to_ndarrays_namedtuple(self):
        """NamedTuple containers (the codebase's core pytrees) must convert
        field-wise, not be fed one generator as the first field."""
        import typing

        import jax.numpy as jnp

        class Pair(typing.NamedTuple):
            a: object
            b: object

        out = trees_to_ndarrays(Pair(a=jnp.ones(3), b=[jnp.zeros(2)]))
        assert isinstance(out, Pair)
        assert isinstance(out.a, np.ndarray)
        assert isinstance(out.b[0], np.ndarray)


import os  # noqa: E402


class TestReviewFixesR4:
    def test_get_time_disabled_inputs(self):
        from ptyrad_tpu.utils.common import get_time

        assert get_time(False) == ""
        assert get_time(None) == ""
        assert get_time("") == ""
        assert len(get_time("date")) == 8
        assert len(get_time("datetime")) == 15

    def test_handle_hdf5_types_parses_stringified_literals(self):
        """Stringified tuples/lists written by the savers' str() fallback
        parse back to Python objects (reference common.py:733-741); plain
        strings and version-like strings stay strings."""
        from ptyrad_tpu.utils.nested import handle_hdf5_types

        assert handle_hdf5_types("(128, 128)") == (128, 128)
        assert handle_hdf5_types("[None, 1]") == [None, 1]
        assert handle_hdf5_types("random") == "random"
        assert handle_hdf5_types("0.1.0b9") == "0.1.0b9"
        assert handle_hdf5_types(b"__NONE__") is None

    def test_constraint_fn_niter_covers_all_freqs(self, rng):
        """The diagnostic applies constraints at the LCM of the active
        frequencies so a freq-2 constraint fires alongside a freq-3 one
        (niter=max would skip it and misreport delta=0)."""
        import dataclasses

        import jax.numpy as jnp

        from ptyrad_tpu.models import make_model
        from ptyrad_tpu.utils.dev_tools import test_constraint_fn as check_fn

        from test_forward import make_toy_init

        init = make_toy_init(rng)
        params, buffers, geom = make_model(init)
        params = dataclasses.replace(params, objp=params.objp - 1.0)  # negative phase
        out = check_fn(params, buffers, geom, {
            "objp_postiv": {"freq": 2, "relax": 0.0, "mode": "clip_neg"},
            "obja_thresh": {"freq": 3, "relax": 0.0, "thresh": (0.99, 1.01)},
        })
        # the freq-2 positivity constraint must actually have fired
        assert float(jnp.min(out.objp)) >= 0.0
