"""Pallas kernel tests (interpret mode on CPU) + implicit-VJP correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from tfpnp_tpu.ops.pallas_kernels import (_spi_root_pallas, spi_inverse_fused)
from tfpnp_tpu.ops.spi import spi_inverse

KEY = jax.random.PRNGKey(0)


def _inputs(b=2, n=128):
    rng = np.random.RandomState(0)
    zt = jnp.asarray(rng.uniform(0.05, 0.95, (b, n, n)), jnp.float32)
    K = jnp.full((b, 1, 1), 8.0)
    K1 = jnp.asarray(rng.randint(0, 64, (b, n, n)), jnp.float32)
    mu = jnp.full((b, 1, 1), 70.0)
    return zt, K1, K, mu


class TestForward:
    def test_fused_matches_xla_reference(self):
        zt, K1, K, mu = _inputs()
        got = spi_inverse_fused(zt, K1, K, mu)  # XLA path on CPU
        want = spi_inverse(zt, jnp.broadcast_to(K1, zt.shape), K, mu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_pallas_kernel_interpret_matches(self):
        zt, K1, K, mu = _inputs(b=1, n=128)
        k1b = jnp.broadcast_to(K1, zt.shape)
        k0b = jnp.broadcast_to(K ** 2 - K1, zt.shape)
        mub = jnp.broadcast_to(mu, zt.shape)
        got = _spi_root_pallas(zt.reshape(-1, 128), k1b.reshape(-1, 128),
                               k0b.reshape(-1, 128), mub.reshape(-1, 128),
                               interpret=True).reshape(zt.shape)
        want = spi_inverse(zt, k1b, K, mu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


class TestImplicitVJP:
    def test_grad_matches_finite_difference_of_converged_root(self):
        # the 10-step bisection output is a staircase in its inputs, so FD
        # on it is meaningless; the implicit gradient is the derivative of
        # the *exact* root — compare against FD of a brentq-converged root
        from scipy.optimize import brentq

        zts = [0.4, 0.6, 0.5, 0.7]
        k1s = [10.0, 20.0, 5.0, 40.0]
        K, mu = 8.0, 70.0
        K0 = lambda k1: K ** 2 - k1

        def root(zt, k1, mu):
            f = lambda y: k1 / (np.exp(y) - 1) - mu * y - K0(k1) + mu * zt
            return brentq(f, 1e-6, 2.0, xtol=1e-12)

        zt_j = jnp.asarray([zts], jnp.float32)
        K1_j = jnp.asarray([k1s], jnp.float32)
        mu_j = jnp.full((1, 4), mu, jnp.float32)
        f_sum = lambda z, m: jnp.sum(spi_inverse_fused(z, K1_j, jnp.asarray(K), m))
        g_zt = np.asarray(jax.grad(f_sum, argnums=0)(zt_j, mu_j))[0]
        g_mu = np.asarray(jax.grad(f_sum, argnums=1)(zt_j, mu_j))[0]

        eps = 1e-5
        for j in range(4):
            fd_zt = (root(zts[j] + eps, k1s[j], mu) - root(zts[j] - eps, k1s[j], mu)) / (2 * eps)
            np.testing.assert_allclose(g_zt[j], fd_zt, rtol=1e-2)
            fd_mu = (root(zts[j], k1s[j], mu + 1e-3) - root(zts[j], k1s[j], mu - 1e-3)) / 2e-3
            np.testing.assert_allclose(g_mu[j], fd_mu, rtol=1e-2, atol=1e-8)

    def test_grad_zero_outside_clip(self):
        # K1=0, mu tiny -> z = zt - K0/mu clipped to 0
        zt = jnp.asarray([[0.2]], jnp.float32)
        K1 = jnp.zeros((1, 1))
        K = jnp.asarray(8.0)
        mu = jnp.asarray([[10.0]], jnp.float32)
        g = jax.grad(lambda z: jnp.sum(spi_inverse_fused(z, K1, K, mu)))(zt)
        assert float(g[0, 0]) == 0.0

    def test_grad_finite_everywhere(self):
        zt, K1, K, mu = _inputs(b=1, n=32)
        g = jax.grad(lambda z, m: jnp.sum(spi_inverse_fused(z, K1, K, m) ** 2),
                     argnums=(0, 1))(zt, mu)
        for arr in g:
            assert np.all(np.isfinite(np.asarray(arr)))

    def test_spi_solver_still_differentiable(self):
        from tfpnp_tpu.pnp import get_solver, run_bundle
        from tfpnp_tpu.pnp.tv import TVDenoiser
        from tfpnp_tpu.ops import psnr, spi_forward
        from tfpnp_tpu.data.synthetic import random_images

        gt = random_images(KEY, 2, 32)
        ob = spi_forward(gt, K=4, alpha=16.0, q=1.0, key=KEY)
        x0 = ob.reshape(2, 32, 4, 32, 4).mean(axis=(2, 4))
        data = {"gt": gt, "x0": x0, "K": jnp.full((2,), 4.0)}
        solver = get_solver("spi_admm", TVDenoiser(n_iter=5))

        def loss(mu):
            h = {"sigma_d": jnp.full((2, 3), 0.05), "mu": mu}
            s = run_bundle(solver, solver.init(data), solver.filter_aux(data), h)
            return -jnp.mean(psnr(solver.get_output(s), gt))

        g = jax.grad(loss)(jnp.full((2, 3), 60.0))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0
