"""Constraint projection tests: algebraic properties and scheduler gating."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ptyrad_tpu import constraints as C
from ptyrad_tpu.models.state import Buffers, Geometry, PtychoParams
from ptyrad_tpu.ops import cplx
from ptyrad_tpu.physics.propagator import near_field_evolution


def make_state(rng, n_scans=6, npix=8, pmode=3, omode=1, nz=2, canvas=16, tilt_each=False):
    probe = (rng.standard_normal((pmode, npix, npix)) + 1j * rng.standard_normal((pmode, npix, npix))).astype(np.complex64)
    params = PtychoParams(
        obja=jnp.asarray(1 + 0.1 * rng.standard_normal((omode, nz, canvas, canvas)).astype(np.float32) ** 2),
        objp=jnp.asarray(0.2 * rng.standard_normal((omode, nz, canvas, canvas)).astype(np.float32)),
        probe=cplx.from_numpy(probe),
        probe_pos_shifts=jnp.zeros((n_scans, 2), jnp.float32),
        obj_tilts=jnp.asarray(rng.standard_normal((n_scans if tilt_each else 1, 2)).astype(np.float32)),
        slice_thickness=jnp.asarray(2.0, jnp.float32),
    )
    H = near_field_evolution((npix, npix), 0.2, 2.0, 0.0417)
    buffers = Buffers(
        H=cplx.from_numpy(H),
        measurements=jnp.ones((n_scans, npix, npix), jnp.float32),
        crop_pos=jnp.zeros((n_scans, 2), jnp.int32),
        omode_occu=jnp.ones((omode,), jnp.float32) / omode,
        Ky=jnp.zeros((npix, npix), jnp.float32),
        Kx=jnp.zeros((npix, npix), jnp.float32),
        Kz=jnp.zeros((npix, npix), jnp.float32),
        probe_int_sum=jnp.asarray(np.sum(np.abs(probe) ** 2), jnp.float32),
    )
    geom = Geometry(
        probe_shape=(npix, npix), obj_shape=(omode, nz, canvas, canvas),
        n_scans=n_scans, n_scan_slow=3, n_scan_fast=2,
        dx=0.2, dk=1 / (0.2 * npix), lambd=0.0417,
    )
    return params, buffers, geom


class TestProbeConstraints:
    def test_ortho_produces_orthogonal_modes(self, rng):
        params, buffers, geom = make_state(rng)
        out = C.ortho_pmode(params, buffers, {})
        flat = cplx.to_numpy(out.probe).reshape(3, -1)
        gram = flat @ flat.conj().T
        off = gram - np.diag(np.diag(gram))
        assert np.abs(off).max() < 1e-4 * np.abs(np.diag(gram)).max()

    def test_ortho_preserves_total_intensity(self, rng):
        params, buffers, geom = make_state(rng)
        out = C.ortho_pmode(params, buffers, {})
        assert float(jnp.sum(out.probe.abs2())) == pytest.approx(
            float(jnp.sum(params.probe.abs2())), rel=1e-4
        )

    def test_ortho_sorted_descending(self, rng):
        params, buffers, geom = make_state(rng)
        out = C.ortho_pmode(params, buffers, {})
        pows = np.sum(np.abs(cplx.to_numpy(out.probe)) ** 2, axis=(1, 2))
        assert np.all(np.diff(pows) <= 1e-6)

    def test_fix_probe_int(self, rng):
        params, buffers, geom = make_state(rng)
        scaled = dataclasses.replace(params, probe=params.probe * 3.0)
        out = C.fix_probe_int(scaled, buffers, {})
        assert float(jnp.sum(out.probe.abs2())) == pytest.approx(
            float(buffers.probe_int_sum), rel=1e-5
        )

    def test_probe_mask_k_suppresses_high_k(self, rng):
        params, buffers, geom = make_state(rng)
        cfg = {"radius": 0.3, "width": 0.02, "power_thresh": 1.0}  # mask all modes
        out = C.probe_mask_k(params, buffers, cfg)
        # corners of centered k-space should be strongly suppressed
        from ptyrad_tpu.ops.fourier import fft2, fftshift2, ifftshift2
        pk_before = np.abs(cplx.to_numpy(fftshift2(fft2(ifftshift2(params.probe)))))
        pk_after = np.abs(cplx.to_numpy(fftshift2(fft2(ifftshift2(out.probe)))))
        assert pk_after[:, 0, 0].max() < 0.05 * pk_before[:, 0, 0].max()


class TestObjectConstraints:
    def test_obja_thresh_hard(self, rng):
        params, buffers, geom = make_state(rng)
        out = C.obja_thresh(params, buffers, {"relax": 0.0, "thresh": (0.95, 1.05)})
        a = np.asarray(out.obja)
        assert a.min() >= 0.95 - 1e-6 and a.max() <= 1.05 + 1e-6

    def test_obja_thresh_relaxed(self, rng):
        params, buffers, geom = make_state(rng)
        out = C.obja_thresh(params, buffers, {"relax": 0.5, "thresh": (1.0, 1.0)})
        want = 0.5 * np.asarray(params.obja) + 0.5
        np.testing.assert_allclose(np.asarray(out.obja), want, atol=1e-6)

    def test_objp_postiv_clip(self, rng):
        params, buffers, geom = make_state(rng)
        out = C.objp_postiv(params, buffers, {"relax": 0.0, "mode": "clip_neg"})
        assert float(jnp.min(out.objp)) >= 0.0

    def test_objp_postiv_subtract_min(self, rng):
        params, buffers, geom = make_state(rng)
        out = C.objp_postiv(params, buffers, {"relax": 0.0, "mode": "subtract_min"})
        p0, p1 = np.asarray(params.objp), np.asarray(out.objp)
        assert p1.min() == pytest.approx(0.0, abs=1e-6)
        np.testing.assert_allclose(p1, p0 - p0.min(), atol=1e-6)

    def test_mirrored_amp_formula(self, rng):
        params, buffers, geom = make_state(rng)
        cfg = {"relax": 0.25, "scale": 0.03, "power": 2.0}
        out = C.mirrored_amp(params, buffers, cfg)
        p = np.asarray(params.objp)
        want = 0.25 * np.asarray(params.obja) + 0.75 * (1 - 0.03 * np.clip(p, 0, None) ** 2)
        np.testing.assert_allclose(np.asarray(out.obja), want, atol=1e-6)

    def test_kz_filter_identity_when_flat(self, rng):
        params, buffers, geom = make_state(rng)
        # beta=0 and alpha=0 -> W == 1 everywhere -> identity for phase
        out = C.kz_filter(params, buffers, {"obj_type": "phase", "beta": 0.0, "alpha": 0.0})
        np.testing.assert_allclose(np.asarray(out.objp), np.asarray(params.objp), atol=1e-5)

    def test_kz_filter_removes_z_oscillation(self, rng):
        params, buffers, geom = make_state(rng, nz=8)
        # alternating-sign z pattern = pure high-kz signal; filter should damp it
        osc = np.ones((1, 8, 16, 16), np.float32) * (-1.0) ** np.arange(8)[None, :, None, None]
        p = dataclasses.replace(params, objp=jnp.asarray(osc))
        out = C.kz_filter(p, buffers, {"obj_type": "phase", "beta": 10.0, "alpha": 0.0})
        assert np.abs(np.asarray(out.objp)).max() < 0.7

    def test_kr_filter_lowpass(self, rng):
        params, buffers, geom = make_state(rng)
        out = C.kr_filter(params, buffers, {"obj_type": "phase", "radius": 0.2, "width": 0.05})
        # variance should drop (high-frequency content removed)
        assert float(jnp.var(out.objp)) < float(jnp.var(params.objp))

    def test_complex_ratio_identity_at_zero_alphas(self, rng):
        params, buffers, geom = make_state(rng)
        out = C.complex_ratio(params, buffers, {"obj_type": "both", "alpha1": 0.0, "alpha2": 0.0})
        np.testing.assert_allclose(np.asarray(out.obja), np.asarray(params.obja), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out.objp), np.asarray(params.objp), atol=1e-6)

    def test_complex_ratio_phase_object(self, rng):
        # alpha1=1, alpha2=0: amplitude slaved to phase, a' = exp(-Cbar*phi)
        params, buffers, geom = make_state(rng)
        out = C.complex_ratio(params, buffers, {"obj_type": "both", "alpha1": 1.0, "alpha2": 0.0})
        log_a = np.log(np.asarray(params.obja))
        cbar = np.abs(log_a).sum() / (np.abs(np.asarray(params.objp)).sum() + 1e-8)
        want = np.exp(-cbar * np.asarray(params.objp))
        np.testing.assert_allclose(np.asarray(out.obja), want, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.objp), np.asarray(params.objp), atol=1e-6)

    def test_blurs_reduce_variance(self, rng):
        params, buffers, geom = make_state(rng, nz=6)
        out_r = C.obj_rblur(params, buffers, {"obj_type": "both", "kernel_size": 5, "std": 1.0})
        assert float(jnp.var(out_r.objp)) < float(jnp.var(params.objp))
        out_z = C.obj_zblur(params, buffers, {"obj_type": "both", "kernel_size": 5, "std": 1.0})
        assert float(jnp.var(out_z.objp)) < float(jnp.var(params.objp))


class TestTiltSmooth:
    def test_noop_for_global_tilt(self, rng):
        params, buffers, geom = make_state(rng, tilt_each=False)
        out = C.tilt_smooth(params, buffers, {"std": 2.0}, 3, 2)
        np.testing.assert_array_equal(np.asarray(out.obj_tilts), np.asarray(params.obj_tilts))

    def test_smooths_per_position_tilts(self, rng):
        params, buffers, geom = make_state(rng, tilt_each=True)
        out = C.tilt_smooth(params, buffers, {"std": 1.0}, 3, 2)
        assert out.obj_tilts.shape == params.obj_tilts.shape
        assert float(jnp.var(out.obj_tilts)) < float(jnp.var(params.obj_tilts))


class TestScheduler:
    def test_freq_gating(self, rng):
        params, buffers, geom = make_state(rng)
        sched = C.ConstraintScheduler(
            {"objp_postiv": {"freq": 2, "relax": 0.0}}, geom
        )
        assert sched.active_names == ["objp_postiv"]
        p1 = sched(params, buffers, niter=1)  # not due
        assert float(jnp.min(p1.objp)) < 0
        p2 = sched(params, buffers, niter=2)  # due
        assert float(jnp.min(p2.objp)) >= 0.0

    def test_due_set_fused_into_one_program(self, rng):
        """ONE jitted program serves every iteration (freq>1 constraints are
        lax.cond-gated on the traced niter): each distinct compiled program
        is a multi-second remote compile on the TPU backend, so a per-due-set
        cache would pay that lottery up to 2^k times."""
        params, buffers, geom = make_state(rng)
        sched = C.ConstraintScheduler(
            {
                "fix_probe_int": {"freq": 1},
                "obja_thresh": {"freq": 1, "relax": 0.0, "thresh": (0.9, 1.1)},
                "objp_postiv": {"freq": 1, "relax": 0.0},
                "obj_rblur": {"freq": 2, "obj_type": "both", "kernel_size": 5, "std": 0.5},
            },
            geom,
        )
        out1 = sched(params, buffers, niter=1)   # 3 due
        out2 = sched(params, buffers, niter=2)   # 4 due
        sched(params, buffers, niter=3)          # same set as niter=1
        # exactly one compiled program exists regardless of due-set mix
        assert sched._jitted is not None
        assert sched._composite() is sched._jitted
        # composition still applies every due constraint
        assert float(jnp.min(out1.objp)) >= 0.0
        assert float(jnp.max(out2.obja)) <= 1.1 + 1e-6
        # and matches applying them one at a time in reference order
        seq = C.fix_probe_int(params, buffers, {})
        seq = C.obja_thresh(seq, buffers, {"relax": 0.0, "thresh": (0.9, 1.1)})
        seq = C.objp_postiv(seq, buffers, {"relax": 0.0, "mode": "clip_neg"})
        np.testing.assert_allclose(np.asarray(out1.objp), np.asarray(seq.objp), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out1.probe.re), np.asarray(seq.probe.re), rtol=1e-6)

    def test_unknown_constraint_rejected(self, rng):
        params, buffers, geom = make_state(rng)
        with pytest.raises(ValueError):
            C.ConstraintScheduler({"bogus": {"freq": 1}}, geom)

    def test_unknown_option_rejected(self, rng):
        """A misspelled per-term option ('raduis') must raise, not merge in
        and silently leave the real option at its default — the pydantic
        schema only guards the params-file path."""
        _, _, geom = make_state(rng)
        with pytest.raises(ValueError, match="raduis"):
            C.ConstraintScheduler({"probe_mask_k": {"freq": 5, "raduis": 0.35}}, geom)

    def test_freq_zero_rejected(self, rng):
        """freq=0 must be rejected at construction (niter % 0 would raise an
        opaque ZeroDivisionError at the first iteration); None disables."""
        _, _, geom = make_state(rng)
        with pytest.raises(ValueError, match="freq"):
            C.ConstraintScheduler({"ortho_pmode": {"freq": 0}}, geom)

    def test_defaults_all_disabled(self, rng):
        params, buffers, geom = make_state(rng)
        sched = C.ConstraintScheduler(None, geom)
        assert sched.active_names == []
