"""Operator-layer tests: FFT conventions, adjointness, prox correctness.

The reference ships no tests; the properties checked here are the ones its
code relies on implicitly (see SURVEY.md section 4): centered-ortho FFT,
opnorm(CSMRI normal op) ~= 1 (transforms.py:533-534 comment), operator
adjointness <Ax, y> == <x, A^T y>, and the SPI bisection prox solving its
stationarity condition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpnp_tpu import ops


KEY = jax.random.PRNGKey(0)


class TestFFT:
    def test_fft2c_matches_numpy_centered(self):
        x = jax.random.normal(KEY, (2, 16, 16)) + 1j * jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16))
        got = ops.fft2c(x)
        want = np.fft.fftshift(
            np.fft.fft2(np.fft.ifftshift(np.asarray(x), axes=(-2, -1)), norm="ortho"),
            axes=(-2, -1),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_roundtrip(self):
        x = jax.random.normal(KEY, (3, 32, 32)).astype(jnp.complex64)
        np.testing.assert_allclose(np.asarray(ops.ifft2c(ops.fft2c(x))), np.asarray(x), atol=1e-5)

    def test_unitary(self):
        x = jax.random.normal(KEY, (1, 64, 64)).astype(jnp.complex64)
        np.testing.assert_allclose(
            float(jnp.linalg.norm(ops.fft2c(x))), float(jnp.linalg.norm(x)), rtol=1e-5
        )

    def test_complex2channel_order(self):
        x = (jnp.arange(2 * 2 * 4 * 4).reshape(2, 2, 4, 4)
             + 1j * (100 + jnp.arange(2 * 2 * 4 * 4).reshape(2, 2, 4, 4))).astype(jnp.complex64)
        out = ops.complex2channel(x)  # [B, H, W, 4]: (re0, im0, re1, im1)
        assert out.shape == (2, 4, 4, 4)
        np.testing.assert_allclose(out[..., 0], jnp.real(x[:, 0]))
        np.testing.assert_allclose(out[..., 1], jnp.imag(x[:, 0]))
        np.testing.assert_allclose(out[..., 2], jnp.real(x[:, 1]))
        np.testing.assert_allclose(out[..., 3], jnp.imag(x[:, 1]))

    def test_matmul_dft_matches_fft(self):
        # the MXU path: DFT as two complex matmuls must equal the FFT path
        from tfpnp_tpu.ops.fft import _dft2_matmul
        x = (jax.random.normal(KEY, (2, 32, 32))
             + 1j * jax.random.normal(jax.random.PRNGKey(9), (2, 32, 32))).astype(jnp.complex64)
        for centered in (True, False):
            for inverse in (True, False):
                got = _dft2_matmul(x, centered=centered, inverse=inverse)
                fn = jnp.fft.ifft2 if inverse else jnp.fft.fft2
                if centered:
                    want = jnp.fft.fftshift(fn(jnp.fft.ifftshift(x, axes=(-2, -1)),
                                               norm="ortho"), axes=(-2, -1))
                else:
                    want = fn(x, norm="ortho")
                np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_csmri_normal_op_opnorm_is_one(self):
        # The masked-Fourier normal operator has opnorm 1 (projection);
        # reference asserts this informally at transforms.py:533-534.
        mask = jax.random.bernoulli(KEY, 0.3, (32, 32))

        def normal_op(x):
            y = ops.fft2c(x.astype(jnp.complex64)) * mask
            return jnp.real(ops.ifft2c(y))

        x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32))
        v = ops.power_method_opnorm(normal_op, x, n_iter=20)
        assert abs(v - 1.0) < 1e-3


class TestCDP:
    def test_adjointness(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        mask = jnp.exp(1j * jax.random.uniform(k1, (2, 4, 16, 16)) * 2 * np.pi).astype(jnp.complex64)
        x = (jax.random.normal(k2, (2, 16, 16)) + 1j * jax.random.normal(k3, (2, 16, 16))).astype(jnp.complex64)
        y = (jax.random.normal(k3, (2, 4, 16, 16)) + 1j * jax.random.normal(k2, (2, 4, 16, 16))).astype(jnp.complex64)

        ax = ops.cdp_forward(x, mask)
        aty = ops.cdp_backward(y, mask)
        # cdp_backward averages over S, so A^T = S * backward; check scaled adjointness
        lhs = jnp.sum(ax * jnp.conj(y))
        rhs = jnp.sum(x * jnp.conj(aty)) * mask.shape[1]
        np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-4)

    def test_backward_inverts_forward_unit_mask(self):
        mask = jnp.ones((1, 3, 8, 8), jnp.complex64)
        x = jax.random.normal(KEY, (1, 8, 8)).astype(jnp.complex64)
        np.testing.assert_allclose(
            np.asarray(ops.cdp_backward(ops.cdp_forward(x, mask), mask)),
            np.asarray(x), atol=1e-5,
        )

    def test_cpr_shapes_and_adjointness(self):
        h = w = 8
        m = 24
        k1, k2 = jax.random.split(KEY)
        mask = jnp.exp(1j * jax.random.uniform(k1, (1, h, w)) * 2 * np.pi).astype(jnp.complex64)
        smat = jnp.asarray(np.random.RandomState(0).randn(m, h * w), jnp.float32)
        x = jax.random.normal(k2, (1, h, w)).astype(jnp.complex64)
        y = ops.cpr_forward(x, mask, smat)
        assert y.shape == (1, m)
        yy = (jax.random.normal(k1, (1, m)) + 0j).astype(jnp.complex64)
        lhs = jnp.sum(ops.cpr_forward(x, mask, smat) * jnp.conj(yy))
        rhs = jnp.sum(x * jnp.conj(ops.cpr_backward(yy, mask, smat)))
        np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-3)


class TestSPI:
    def test_forward_shape_and_binary(self):
        x = jax.random.uniform(KEY, (2, 16, 16))
        ob = ops.spi_forward(x, K=4, alpha=16.0, q=1.0, key=jax.random.PRNGKey(5))
        assert ob.shape == (2, 64, 64)
        assert set(np.unique(np.asarray(ob))) <= {0.0, 1.0}

    def test_inverse_solves_stationarity(self):
        # where K1 > 0, the bisection root y* satisfies
        # K1/(exp(y)-1) - mu*y - K0 + mu*ztilde == 0 up to bisection tol
        rng = np.random.RandomState(0)
        ztilde = jnp.asarray(rng.uniform(0.2, 0.9, (32,)), jnp.float32)
        K = jnp.full((32,), 8.0)
        K1 = jnp.asarray(rng.randint(1, 60, (32,)), jnp.float32)
        mu = jnp.full((32,), 60.0)
        z = ops.spi_inverse(ztilde, K1, K, mu)
        K0 = K ** 2 - K1
        f = K1 / (jnp.exp(z) - 1) - mu * z - K0 + mu * ztilde
        interior = (z > 1e-4) & (z < 1.0)  # ignore clipped elements
        assert np.all(np.abs(np.asarray(f)[np.asarray(interior)]) < np.asarray(
            K1 / (jnp.exp(jnp.float32(1e-5)) - 1))[np.asarray(interior)] * 2e-3 + 1.0)

    def test_inverse_zero_counts_closed_form(self):
        ztilde = jnp.asarray([0.5, 0.9], jnp.float32)
        K = jnp.asarray([4.0, 4.0])
        K1 = jnp.zeros(2)
        mu = jnp.asarray([100.0, 100.0])
        z = ops.spi_inverse(ztilde, K1, K, mu)
        want = np.clip(np.asarray(ztilde) - 16.0 / 100.0, 0, 1)
        np.testing.assert_allclose(np.asarray(z), want, atol=1e-6)

    def test_inverse_differentiable(self):
        g = jax.grad(lambda zt: jnp.sum(ops.spi_inverse(zt, jnp.full_like(zt, 10.0),
                                                        jnp.full_like(zt, 8.0),
                                                        jnp.full_like(zt, 60.0))))(
            jnp.asarray([0.4, 0.6], jnp.float32))
        assert np.all(np.isfinite(np.asarray(g)))


class TestRadon:
    @pytest.fixture(scope="class")
    def radon(self):
        return ops.RadonGenerator()(64, 15)

    def test_forward_shape(self, radon):
        x = jax.random.uniform(KEY, (2, 64, 64))
        y = radon.forward(x)
        assert y.shape == (2, 15, radon.det_count)

    def test_adjointness_exact(self, radon):
        k1, k2 = jax.random.split(KEY)
        x = jax.random.normal(k1, (1, 64, 64))
        y = jax.random.normal(k2, (1, 15, radon.det_count))
        lhs = float(jnp.sum(radon.forward(x) * y))
        rhs = float(jnp.sum(x * radon.backprojection(y)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_mass_conservation(self, radon):
        # every projection of a fully-interior blob integrates to its mass
        yy, xx = np.mgrid[:64, :64]
        blob = np.exp(-(((yy - 32) ** 2 + (xx - 32) ** 2) / 50.0)).astype(np.float32)
        sino = np.asarray(radon.forward(jnp.asarray(blob)[None]))[0]
        mass = blob.sum()
        np.testing.assert_allclose(sino.sum(axis=-1), mass, rtol=2e-2)

    def test_fbp_recovers_phantom(self, radon):
        yy, xx = np.mgrid[:64, :64]
        phantom = (((yy - 32) ** 2 + (xx - 32) ** 2) < 15 ** 2).astype(np.float32)
        sino = radon.forward(jnp.asarray(phantom)[None])
        rec = np.asarray(radon.filter_backprojection(sino))[0]
        inner = phantom > 0.5
        # FBP with 15 views is streaky, but the disk must clearly stand out
        assert rec[inner].mean() > 3.0 * abs(rec[~inner].mean())

    def test_opnorm_positive_and_cached(self):
        gen = ops.RadonGenerator()
        r1 = gen(32, 8)
        r2 = gen(32, 8)
        assert r1 is r2
        assert r1.opnorm > 0

    def test_normal_op_normalised(self, radon):
        x = jax.random.normal(KEY, (1, 64, 64))
        v = ops.power_method_opnorm(
            lambda z: radon.backprojection_norm(radon.forward(z)), x, n_iter=10)
        assert abs(v - 1.0) < 0.05


class TestMetrics:
    def test_psnr_matches_numpy(self):
        x = jax.random.uniform(KEY, (2, 1, 8, 8))
        y = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 8, 8))
        got = np.asarray(ops.psnr(x, y))
        xn, yn = np.asarray(x), np.asarray(y)
        for b in range(2):
            mse = np.mean((np.clip(xn[b], 0, 1) - yn[b]) ** 2)
            np.testing.assert_allclose(got[b], 10 * np.log10(1.0 / mse), rtol=1e-4)

    def test_psnr_255(self):
        x = np.full((1, 8, 8), 100.0)
        y = np.full((1, 8, 8), 110.0)
        np.testing.assert_allclose(ops.psnr_255(x, y), 10 * np.log10(255 ** 2 / 100.0), rtol=1e-6)


class TestSchedules:
    def test_ladder_shapes_and_range(self):
        rhos, sigmas = ops.get_rho_sigma(sigma=15 / 255, iter_num=30)
        assert rhos.shape == (30,) and sigmas.shape == (30,)
        assert sigmas[0] > sigmas[-1] > 0
        assert np.all(rhos > 0) and rhos[0] < rhos[-1]


class TestNoise:
    def test_gaussian_d(self):
        y, s = ops.noise.gaussian_d(KEY, jnp.zeros((4, 8, 8)), [5, 10, 15])
        assert min(abs(float(s) - v / 255) for v in (5, 10, 15)) < 1e-6
        assert abs(float(jnp.std(y)) - float(s)) < 0.05

    def test_poisson_pr(self):
        z = jnp.abs(jax.random.normal(KEY, (1, 16, 16))) + 1.0
        y, s = ops.noise.poisson_pr(jax.random.PRNGKey(3), z, alpha=27.0)
        assert y.shape == z.shape and float(s) > 0


class TestRadonBackendEquivalence:
    def test_matmul_matches_gather(self):
        """The MXU matmul backend materializes exactly the gather path's
        bilinear taps: forward and adjoint must agree to float tolerance,
        and both must stay exactly adjoint."""
        from tfpnp_tpu.ops.radon import Radon, _make_angles

        angles = _make_angles(9)
        rm = Radon(32, angles, backend="matmul")
        rg = Radon(32, angles, backend="gather")
        assert rm.backend == "matmul" and rg.backend == "gather"
        k1, k2 = jax.random.split(KEY)
        x = jax.random.normal(k1, (2, 32, 32))
        np.testing.assert_allclose(np.asarray(rm.forward(x)),
                                   np.asarray(rg.forward(x)),
                                   rtol=1e-4, atol=1e-4)
        y = jax.random.normal(k2, (2, 9, rm.det_count))
        np.testing.assert_allclose(np.asarray(rm.backprojection(y)),
                                   np.asarray(rg.backprojection(y)),
                                   rtol=1e-4, atol=1e-4)
        # exact adjointness of the matmul pair
        lhs = float(jnp.sum(rm.forward(x) * y))
        rhs = float(jnp.sum(x * rm.backprojection(y)))
        assert abs(lhs - rhs) < 1e-2 * max(abs(lhs), 1.0)
        # same operator norm (same linear map)
        assert abs(rm.opnorm - rg.opnorm) < 1e-2 * rg.opnorm

    def test_auto_backend_cap(self):
        from tfpnp_tpu.ops.radon import Radon, _make_angles
        r = Radon(32, _make_angles(6))
        assert r.backend == "matmul"  # tiny geometry under the cap
