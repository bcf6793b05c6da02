"""Loss-term unit tests against closed-form expectations."""

import jax.numpy as jnp
import numpy as np
import pytest

from ptyrad_tpu.losses import (
    combined_loss,
    loss_pacbed,
    loss_poissn,
    loss_single,
    loss_sparse,
)


@pytest.fixture()
def dps(rng):
    model = jnp.asarray(np.abs(rng.standard_normal((4, 8, 8))).astype(np.float32) + 0.1)
    meas = jnp.asarray(np.abs(rng.standard_normal((4, 8, 8))).astype(np.float32) + 0.1)
    return model, meas


class TestDataTerms:
    def test_single_zero_at_match(self, dps):
        model, _ = dps
        val = loss_single(model, model, {"weight": 1.0, "dp_pow": 0.5})
        assert float(val) == pytest.approx(0.0, abs=1e-6)

    def test_single_closed_form(self, dps):
        model, meas = dps
        val = float(loss_single(model, meas, {"weight": 2.0, "dp_pow": 0.5}))
        m, d = np.asarray(model) ** 0.5, np.asarray(meas) ** 0.5
        want = 2.0 * np.sqrt(np.mean((m - d) ** 2)) / d.mean()
        assert val == pytest.approx(want, rel=1e-5)

    def test_poissn_minimized_at_truth(self, dps):
        # Poisson NLL(m | f) over f is minimized at f = m
        _, meas = dps
        at_truth = float(loss_poissn(meas, meas, {"weight": 1.0, "dp_pow": 1.0, "eps": 0.0}))
        perturbed = float(
            loss_poissn(meas * 1.3, meas, {"weight": 1.0, "dp_pow": 1.0, "eps": 0.0})
        )
        assert at_truth < perturbed

    def test_pacbed_ignores_per_position_noise(self, rng):
        # Patterns whose batch-average matches give zero pacbed loss
        base = np.abs(rng.standard_normal((8, 8))).astype(np.float32) + 0.5
        noise = rng.standard_normal((4, 8, 8)).astype(np.float32) * 0.1
        noise -= noise.mean(axis=0, keepdims=True)
        model = jnp.asarray(base[None] + noise)
        meas = jnp.asarray(np.broadcast_to(base, (4, 8, 8)).copy())
        val = float(loss_pacbed(model, meas, {"weight": 1.0, "dp_pow": 1.0}))
        assert val == pytest.approx(0.0, abs=1e-5)


class TestRegularizers:
    def test_sparse_l1_closed_form(self, rng):
        objp = rng.standard_normal((3, 2, 2, 4, 4)).astype(np.float32)
        occu = np.array([0.7, 0.3], np.float32)
        val = float(loss_sparse(jnp.asarray(objp), jnp.asarray(occu), {"weight": 1.0, "ln_order": 1}))
        per_mode = np.mean(np.abs(objp), axis=(0, 2, 3, 4))
        assert val == pytest.approx(float((per_mode * occu).sum()), rel=1e-5)

    def test_simlar_zero_for_identical_modes(self, rng):
        patch = rng.standard_normal((3, 1, 2, 8, 8)).astype(np.float32)
        patches = jnp.asarray(np.repeat(patch, 2, axis=1))
        occu = jnp.asarray([0.5, 0.5], jnp.float32)
        total, terms = combined_loss(
            jnp.ones((3, 8, 8)), jnp.ones((3, 8, 8)), patches, patches, occu,
            {
                "loss_single": {"state": False},
                "loss_simlar": {"state": True, "weight": 1.0, "obj_type": "both",
                                "blur_std": None, "scale_factor": None},
            },
        )
        assert float(terms["loss_simlar"]) == pytest.approx(0.0, abs=1e-6)

    def test_simlar_single_omode_is_zero_not_nan(self, rng):
        """omode == 1: the unbiased std over a size-1 mode axis is 0/0; the
        term must come back 0, not NaN poisoning the total loss and all
        gradients (review r4 — the reference shares this latent NaN)."""
        patches = jnp.asarray(rng.standard_normal((3, 1, 2, 8, 8)).astype(np.float32))
        occu = jnp.asarray([1.0], jnp.float32)
        total, terms = combined_loss(
            jnp.ones((3, 8, 8)), jnp.ones((3, 8, 8)), patches, patches, occu,
            {
                "loss_single": {"state": True, "weight": 1.0, "dp_pow": 0.5},
                "loss_simlar": {"state": True, "weight": 1.0, "obj_type": "both",
                                "blur_std": None, "scale_factor": None},
            },
        )
        assert float(terms["loss_simlar"]) == 0.0
        assert np.isfinite(float(total))


class TestCombined:
    def test_disabled_terms_are_zero(self, dps, rng):
        model, meas = dps
        patches = jnp.asarray(rng.standard_normal((4, 1, 1, 8, 8)).astype(np.float32))
        occu = jnp.asarray([1.0], jnp.float32)
        total, terms = combined_loss(model, meas, patches, patches, occu, None)
        assert float(terms["loss_poissn"]) == 0.0
        assert float(terms["loss_pacbed"]) == 0.0
        assert float(terms["loss_sparse"]) == 0.0
        assert float(terms["loss_simlar"]) == 0.0
        assert float(total) == pytest.approx(float(terms["loss_single"]), rel=1e-6)


class TestLossParamsMerge:
    def test_partial_term_dict_inherits_defaults(self, rng):
        """A partial per-term dict must deep-merge over the term's defaults
        instead of replacing the whole dict and KeyError-ing (review r3)."""
        dp = jnp.asarray(np.abs(rng.standard_normal((2, 8, 8))).astype(np.float32))
        meas = jnp.asarray(np.abs(rng.standard_normal((2, 8, 8))).astype(np.float32))
        oa = jnp.ones((2, 1, 1, 8, 8), jnp.float32)
        op = jnp.zeros((2, 1, 1, 8, 8), jnp.float32)
        occu = jnp.ones(1, jnp.float32)
        total, terms = combined_loss(
            dp, meas, oa, op, occu, {"loss_single": {"state": True}}, None
        )
        assert np.isfinite(float(total))
        total2, terms2 = combined_loss(
            dp, meas, oa, op, occu, {"loss_sparse": {"weight": 0.5}}, None
        )
        assert np.isfinite(float(total2))
        # weight given but state inherited (False): sparse contributes zero
        assert float(terms2["loss_sparse"]) == 0.0

    def test_unknown_term_rejected(self):
        """A misspelled loss-term key must raise, not be silently dropped
        (the run would otherwise proceed without the intended term)."""
        from ptyrad_tpu.losses import merge_loss_params

        with pytest.raises(ValueError, match="loss_sparce"):
            merge_loss_params({"loss_sparce": {"state": True, "weight": 0.5}})
