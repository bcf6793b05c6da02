"""Tests for the (re, im) complex-pair arithmetic layer against NumPy complex."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptyrad_tpu.ops import cplx
from ptyrad_tpu.ops.cplx import Cplx


def rand_c(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


class TestArithmetic:
    def test_roundtrip(self, rng):
        a = rand_c(rng, (3, 4))
        np.testing.assert_allclose(cplx.to_numpy(cplx.from_numpy(a)), a)

    @pytest.mark.parametrize("op", ["add", "sub", "mul", "div"])
    def test_binary_ops(self, rng, op):
        a, b = rand_c(rng, (4, 4)), rand_c(rng, (4, 4))
        za, zb = cplx.from_numpy(a), cplx.from_numpy(b)
        got = {
            "add": lambda: za + zb, "sub": lambda: za - zb,
            "mul": lambda: za * zb, "div": lambda: za / zb,
        }[op]()
        want = {"add": a + b, "sub": a - b, "mul": a * b, "div": a / b}[op]
        np.testing.assert_allclose(cplx.to_numpy(got), want, atol=1e-4)

    def test_scalar_and_real_array_mul(self, rng):
        a = rand_c(rng, (4, 4))
        za = cplx.from_numpy(a)
        np.testing.assert_allclose(cplx.to_numpy(za * 2.5), a * 2.5, atol=1e-5)
        r = rng.standard_normal((4, 4)).astype(np.float32)
        np.testing.assert_allclose(cplx.to_numpy(za * jnp.asarray(r)), a * r, atol=1e-5)

    def test_reflected_scalar_ops(self, rng):
        """Scalar-on-the-left add/sub/div must work like scalar multiply
        (Cplx defines the full reflected-operator set)."""
        a = rand_c(rng, (4, 4))
        za = cplx.from_numpy(a)
        np.testing.assert_allclose(cplx.to_numpy(1.5 + za), 1.5 + a, atol=1e-5)
        np.testing.assert_allclose(cplx.to_numpy(1.5 - za), 1.5 - a, atol=1e-5)
        np.testing.assert_allclose(cplx.to_numpy(1.5 / za), 1.5 / a, atol=1e-4)
        np.testing.assert_allclose(cplx.to_numpy(1.5 * za), 1.5 * a, atol=1e-5)

    def test_real_broadcast_keeps_pair_invariant(self, rng):
        """Adding a broadcasting REAL array must broadcast both components —
        re and im of a Cplx always have identical shapes."""
        a = rand_c(rng, (4, 4))
        za = cplx.from_numpy(a)
        r = rng.standard_normal((3, 1, 1)).astype(np.float32)
        for out, want in [(za + jnp.asarray(r), a + r), (za - jnp.asarray(r), a - r)]:
            assert out.re.shape == out.im.shape == (3, 4, 4)
            np.testing.assert_allclose(cplx.to_numpy(out), want, atol=1e-5)

    def test_conj_abs_angle(self, rng):
        a = rand_c(rng, (5,))
        za = cplx.from_numpy(a)
        np.testing.assert_allclose(cplx.to_numpy(za.conj()), np.conj(a), atol=1e-6)
        np.testing.assert_allclose(np.asarray(za.abs2()), np.abs(a) ** 2, atol=1e-5)
        np.testing.assert_allclose(np.asarray(za.abs()), np.abs(a), atol=1e-5)
        np.testing.assert_allclose(np.asarray(za.angle()), np.angle(a), atol=1e-5)

    def test_polar_expi(self, rng):
        amp = np.abs(rng.standard_normal(8)).astype(np.float32)
        ph = rng.standard_normal(8).astype(np.float32)
        np.testing.assert_allclose(
            cplx.to_numpy(cplx.polar(jnp.asarray(amp), jnp.asarray(ph))),
            amp * np.exp(1j * ph), atol=1e-5,
        )
        np.testing.assert_allclose(
            cplx.to_numpy(cplx.expi(jnp.asarray(ph))), np.exp(1j * ph), atol=1e-6
        )

    def test_is_pytree(self, rng):
        z = cplx.from_numpy(rand_c(rng, (2, 2)))
        leaves = jax.tree_util.tree_leaves(z)
        assert len(leaves) == 2
        doubled = jax.tree_util.tree_map(lambda x: x * 2, z)
        assert isinstance(doubled, Cplx)


class TestLinalg:
    def test_matmul(self, rng):
        a, b = rand_c(rng, (3, 5)), rand_c(rng, (5, 4))
        got = cplx.matmul(cplx.from_numpy(a), cplx.from_numpy(b))
        np.testing.assert_allclose(cplx.to_numpy(got), a @ b, atol=1e-4)

    def test_matmul_const_karatsuba(self, rng):
        f = rand_c(rng, (6, 6))
        x = rand_c(rng, (2, 6, 8))
        fr, fi = jnp.asarray(f.real), jnp.asarray(f.imag)
        got_l = cplx.matmul_const(fr, fi, fr + fi, cplx.from_numpy(x), side="left")
        np.testing.assert_allclose(cplx.to_numpy(got_l), np.einsum("jk,bkx->bjx", f, x), atol=1e-4)
        x2 = rand_c(rng, (2, 5, 6))
        got_r = cplx.matmul_const(fr, fi, fr + fi, cplx.from_numpy(x2), side="right")
        np.testing.assert_allclose(cplx.to_numpy(got_r), np.einsum("byk,jk->byj", x2, f), atol=1e-4)

    def test_eigh_hermitian(self, rng):
        m = rand_c(rng, (6, 20)).astype(np.complex128)
        a = (m @ m.conj().T).astype(np.complex64)  # Hermitian PSD
        w, v = cplx.eigh(cplx.from_numpy(a))
        w_np = np.linalg.eigvalsh(a)
        np.testing.assert_allclose(np.sort(np.asarray(w)), np.sort(w_np), rtol=1e-3, atol=1e-3)
        # eigenvector property: A v = w v
        vc = cplx.to_numpy(v)
        for i in range(6):
            np.testing.assert_allclose(a @ vc[:, i], np.asarray(w)[i] * vc[:, i], atol=2e-2)
        # columns are orthonormal
        gram = vc.conj().T @ vc
        np.testing.assert_allclose(gram, np.eye(6), atol=1e-3)


class TestEighDegenerate:
    def test_unitary_for_degenerate_spectra(self):
        """Repeated eigenvalues (equal-power probe modes give exactly this
        Gram structure) must still yield a UNITARY eigenbasis: the naive
        every-other-column selection from the real embedding returns
        complex-dependent vectors inside degenerate subspaces (review r3,
        confirmed: V^H V had 0.66i off-diagonals)."""
        import numpy as np

        from ptyrad_tpu.ops import cplx

        rng = np.random.default_rng(0)
        cases = []
        Q, _ = np.linalg.qr(rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3)))
        cases.append(Q @ np.diag([1.0, 1.0, 2.0]) @ Q.conj().T)   # 2-fold
        cases.append(np.eye(4, dtype=np.complex128) * 0.7)         # fully degenerate
        B = rng.standard_normal((5, 5)) + 1j * rng.standard_normal((5, 5))
        cases.append(B @ B.conj().T)                               # generic PSD
        for A in cases:
            z = cplx.Cplx(jnp.asarray(A.real, jnp.float32), jnp.asarray(A.imag, jnp.float32))
            w, V = cplx.eigh(z)
            Vc = np.asarray(V.re) + 1j * np.asarray(V.im)
            np.testing.assert_allclose(
                Vc.conj().T @ Vc, np.eye(A.shape[0]), atol=2e-5,
                err_msg="eigenbasis not unitary",
            )
            np.testing.assert_allclose(
                Vc @ np.diag(np.asarray(w)) @ Vc.conj().T, A, atol=2e-5,
                err_msg="eigendecomposition does not reconstruct A",
            )

    def test_ortho_pmode_preserves_intensity_for_equal_power_modes(self):
        """The downstream symptom: orthogonalizing EQUAL-power orthogonal
        modes (common mixed-state init) must keep them orthogonal and
        conserve total intensity."""
        import numpy as np

        from ptyrad_tpu.constraints import orthogonalize_modes
        from ptyrad_tpu.ops import cplx

        rng = np.random.default_rng(1)
        base = rng.standard_normal((3, 8, 8)) + 1j * rng.standard_normal((3, 8, 8))
        q, _ = np.linalg.qr(base.reshape(3, -1).T)
        modes = (q.T * 0.5).reshape(3, 8, 8)  # orthogonal, EQUAL power
        z = cplx.Cplx(jnp.asarray(modes.real, jnp.float32), jnp.asarray(modes.imag, jnp.float32))
        out = orthogonalize_modes(z, sort=False)
        oc = np.asarray(out.re) + 1j * np.asarray(out.im)
        flat = oc.reshape(3, -1)
        gram = flat @ flat.conj().T
        np.testing.assert_allclose(np.abs(gram - np.diag(np.diag(gram))).max(), 0, atol=1e-5)
        np.testing.assert_allclose(
            (np.abs(oc) ** 2).sum(), (np.abs(modes) ** 2).sum(), rtol=1e-5,
        )
