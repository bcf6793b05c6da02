"""Unit tests for host-side physics: constants, probes, propagators."""

import numpy as np
import pytest

from ptyrad_tpu.physics import (
    get_em_constants,
    hermite_like_basis,
    infer_dx,
    make_mixed_probe,
    make_stem_probe,
    near_field_evolution,
)
from ptyrad_tpu.physics.constants import electron_wavelength
from ptyrad_tpu.physics.propagator import propagator_kgrid


class TestConstants:
    def test_wavelength_golden(self):
        # Standard relativistic electron wavelengths (Kirkland tables)
        assert electron_wavelength(80.0) == pytest.approx(0.041757, abs=2e-5)
        assert electron_wavelength(200.0) == pytest.approx(0.025079, abs=2e-5)
        assert electron_wavelength(300.0) == pytest.approx(0.019687, abs=2e-5)

    def test_gamma(self):
        assert get_em_constants(0.0001, "gamma") == pytest.approx(1.0, abs=1e-5)
        assert get_em_constants(511.0, "gamma") == pytest.approx(2.0, abs=1e-3)

    def test_sigma_positive_decreasing(self):
        # Interaction parameter decreases with voltage
        s80 = get_em_constants(80.0, "sigma")
        s300 = get_em_constants(300.0, "sigma")
        assert s80 > s300 > 0

    def test_infer_dx_modes(self):
        lam = electron_wavelength(80.0)
        npix = 128
        dx = 0.125
        dk = 1.0 / (npix * dx)
        assert infer_dx(dx=dx) == pytest.approx(dx)
        assert infer_dx(dk=dk, Npix=npix) == pytest.approx(dx)
        assert infer_dx(kMax=npix * dk / 2) == pytest.approx(dx)
        da_mrad = dk * lam * 1e3
        assert infer_dx(da=da_mrad, wavelength=lam, Npix=npix) == pytest.approx(dx)
        assert infer_dx(angleMax=npix * da_mrad / 2, wavelength=lam) == pytest.approx(dx)
        # RBF mode: conv_angle/RBF gives da
        conv = 24.9
        rbf = conv / da_mrad
        assert infer_dx(RBF=rbf, conv_angle=conv, wavelength=lam, Npix=npix) == pytest.approx(dx)

    def test_infer_dx_insufficient(self):
        with pytest.raises(ValueError):
            infer_dx(da=1.0)


class TestStemProbe:
    params = {"kv": 80.0, "conv_angle": 24.9, "Npix": 128, "dx": 0.1494}

    def test_normalized(self):
        probe = make_stem_probe(self.params)
        assert probe.shape == (128, 128)
        assert np.sum(np.abs(probe) ** 2) == pytest.approx(1.0, rel=1e-5)

    def test_focused_probe_centered(self):
        # Zero aberrations -> Airy-like spot centered at Npix//2
        probe = make_stem_probe(self.params)
        peak = np.unravel_index(np.argmax(np.abs(probe)), probe.shape)
        assert peak == (64, 64)

    def test_aperture_support(self):
        # The probe's spectrum must vanish outside the convergence angle
        probe = make_stem_probe(self.params)
        spec = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(probe)))
        lam = electron_wavelength(80.0)
        k_cut = 24.9 / 1e3 / lam
        dk = 1.0 / (0.1494 * 128)
        kline = np.fft.fftshift(np.fft.fftfreq(128, 1.0 / 128)) * dk
        kX, kY = np.meshgrid(kline, kline)
        outside = np.hypot(kX, kY) > k_cut * 1.05
        assert np.abs(spec[outside]).max() < 1e-6 * np.abs(spec).max()

    def test_defocus_spreads_probe(self):
        focused = make_stem_probe(self.params)
        defocused = make_stem_probe({**self.params, "df": 200.0})

        def rms_radius(p):
            inten = np.abs(p) ** 2
            y, x = np.indices(p.shape)
            cy = (y * inten).sum() / inten.sum()
            cx = (x * inten).sum() / inten.sum()
            return np.sqrt((((y - cy) ** 2 + (x - cx) ** 2) * inten).sum() / inten.sum())

        assert rms_radius(defocused) > rms_radius(focused)

    def test_defocus_symmetry(self):
        # Pure defocus of opposite signs gives mirrored (conjugate) probes:
        # equal intensity profiles
        over = make_stem_probe({**self.params, "df": 100.0})
        under = make_stem_probe({**self.params, "df": -100.0})
        np.testing.assert_allclose(np.abs(over), np.abs(under), atol=1e-6)


class TestMixedProbe:
    def test_hermite_orthonormal(self):
        probe = make_stem_probe({"kv": 80.0, "conv_angle": 24.9, "Npix": 64, "dx": 0.3})
        basis = hermite_like_basis(probe.astype(np.complex128), 1, 1)
        assert basis.shape == (4, 64, 64)
        gram = basis.reshape(4, -1) @ basis.reshape(4, -1).conj().T
        np.testing.assert_allclose(gram, np.eye(4), atol=1e-6)

    def test_mixed_probe_powers(self):
        probe = make_stem_probe({"kv": 80.0, "conv_angle": 24.9, "Npix": 64, "dx": 0.3})
        mixed = make_mixed_probe(probe, 4, [0.05])
        assert mixed.shape == (4, 64, 64)
        pows = np.sum(np.abs(mixed) ** 2, axis=(1, 2))
        np.testing.assert_allclose(pows, [0.85, 0.05, 0.05, 0.05], atol=1e-5)
        assert np.sum(pows) == pytest.approx(1.0, rel=1e-5)


class TestPropagator:
    def test_unitary(self):
        # ASM propagator is unit-modulus (pure phase) for propagating waves
        H = near_field_evolution((64, 64), dx=0.2, dz=10.0, lambd=0.0417)
        np.testing.assert_allclose(np.abs(H), 1.0, atol=1e-5)

    def test_zero_distance_identity(self):
        H = near_field_evolution((64, 64), dx=0.2, dz=0.0, lambd=0.0417)
        np.testing.assert_allclose(H, np.ones_like(H), atol=1e-6)

    def test_composition(self):
        h1 = near_field_evolution((32, 32), 0.2, 5.0, 0.0417).astype(np.complex128)
        h2 = near_field_evolution((32, 32), 0.2, 7.0, 0.0417).astype(np.complex128)
        h12 = near_field_evolution((32, 32), 0.2, 12.0, 0.0417).astype(np.complex128)
        np.testing.assert_allclose(h1 * h2, h12, atol=1e-5)

    def test_half_bin_shift_no_nan(self):
        # Even at marginal sampling the half-bin offset keeps sqrt real/finite
        H = near_field_evolution((64, 64), dx=0.5, dz=20.0, lambd=0.0417)
        assert np.all(np.isfinite(H))

    def test_kgrid_odd_n_matches_reference_bounds(self):
        # reference models.py:166-167 uses arange(-N//2, N//2), i.e. a
        # floor(-N/2) lower bound; for odd N this differs by one bin from
        # the naive -(N//2) (regression: ADVICE r1)
        for n in (5, 7, 64, 65):
            Ky, _ = propagator_kgrid((n, n), 0.3)
            oracle = np.fft.ifftshift(
                2 * np.pi * ((np.arange((-n) // 2, n // 2) + 0.5) / n) / 0.3
            )
            np.testing.assert_allclose(Ky[:, 0], oracle, rtol=1e-6)

    def test_kgrid_corner_centered(self):
        Ky, Kx = propagator_kgrid((64, 64), 0.2)
        # After ifftshift the smallest |k| (half-bin) sits at the corner
        assert np.abs(Ky[0, 0]) == pytest.approx(2 * np.pi * 0.5 / 64 / 0.2, rel=1e-6)
        assert np.abs(Ky).max() == Ky.max() or np.abs(Ky).max() == -Ky.min()

    def test_free_space_spreading(self):
        # Propagating a focused probe broadens it
        probe = make_stem_probe({"kv": 80.0, "conv_angle": 24.9, "Npix": 128, "dx": 0.1494})
        H = near_field_evolution((128, 128), 0.1494, 100.0, electron_wavelength(80.0))
        prop = np.fft.ifft2(H * np.fft.fft2(probe))
        assert np.sum(np.abs(prop) ** 2) == pytest.approx(1.0, rel=1e-4)  # energy conserved
        inten0 = np.abs(probe) ** 2
        inten1 = np.abs(prop) ** 2
        assert inten1.max() < inten0.max()  # peak drops as probe spreads
