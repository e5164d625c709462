"""Golden end-metric regressions (the reference's docs/results.md role).

The reference validates by PSNR tables from released checkpoints; its
data and weights are external, so these goldens freeze OUR deterministic
classic-schedule restorations (seeded synthetic data, TV prior) — any
solver/operator/schedule regression moves them by far more than the
tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfpnp_tpu.ops as ops
from tfpnp_tpu.data.synthetic import random_images
from tfpnp_tpu.pnp import get_solver, run_bundle
from tfpnp_tpu.pnp.tv import TVDenoiser

N, B, IT = 64, 3, 20
TOL = 0.35  # dB


def _gains(solver, data, hyper):
    st = solver.init(data)
    p0 = ops.psnr(solver.get_output(st), data["gt"])
    st = run_bundle(solver, st, solver.filter_aux(data), hyper)
    p1 = ops.psnr(solver.get_output(st), data["gt"])
    return float(np.mean(np.asarray(p0))), float(np.mean(np.asarray(p1)))


def _bc(a):
    return jnp.broadcast_to(jnp.asarray(a, jnp.float32), (B, IT))


class TestGoldenClassic:
    def test_csmri_admm(self):
        from tfpnp_tpu.tasks import csmri
        rhos, sigmas = ops.get_rho_sigma(sigma=15 / 255, iter_num=IT,
                                         model_sigma1=35.0, model_sigma2=5.0)
        masks = jnp.asarray(np.stack([csmri.radial_mask(N, 4)]))
        data = jax.jit(lambda k1, k2: csmri.make_data(
            k2, random_images(k1, B, N), masks, sigma_list=(15.0,)))(
                jax.random.PRNGKey(10), jax.random.PRNGKey(11))
        p0, p1 = _gains(get_solver("csmri_admm", TVDenoiser()), data,
                        {"sigma_d": _bc(sigmas), "mu": _bc(rhos)})
        assert p0 == pytest.approx(25.66, abs=TOL)
        assert p1 == pytest.approx(33.60, abs=TOL)

    def test_pr_iadmm(self):
        from tfpnp_tpu.tasks import pr
        rhos, sigmas = ops.get_rho_sigma(sigma=5 / 255, iter_num=IT,
                                         model_sigma1=50.0, model_sigma2=8.0)
        mask = jnp.asarray(pr.cdp_mask(N))
        data = jax.jit(lambda k1, k2: pr.make_data(
            k2, random_images(k1, B, N), mask, alphas=(27.0,)))(
                jax.random.PRNGKey(12), jax.random.PRNGKey(13))
        p0, p1 = _gains(get_solver("pr_iadmm", TVDenoiser()), data,
                        {"sigma_d": _bc(sigmas), "mu": _bc(rhos),
                         "tau": _bc(jnp.full(IT, 1.2))})
        assert p0 == pytest.approx(4.80, abs=TOL)
        assert p1 == pytest.approx(27.42, abs=0.6)  # amplitude loss is less stable

    def test_ct_iadmm(self):
        from tfpnp_tpu.ops.radon import RadonGenerator
        from tfpnp_tpu.tasks import ct
        rhos, sigmas = ops.get_rho_sigma(sigma=7.5 / 255, iter_num=IT,
                                         model_sigma1=40.0, model_sigma2=5.0)
        radon = RadonGenerator()(N, ct.DEFAULT_VIEW)
        data = jax.jit(lambda k1, k2: ct.make_data(
            k2, random_images(k1, B, N), radon, sigma_ns=(0.075,)))(
                jax.random.PRNGKey(14), jax.random.PRNGKey(15))
        p0, p1 = _gains(get_solver("ct_iadmm", TVDenoiser(), radon=radon), data,
                        {"sigma_d": _bc(sigmas), "mu": _bc(rhos),
                         "tau": _bc(jnp.full(IT, 1.0))})
        assert p0 == pytest.approx(14.32, abs=TOL)
        assert p1 == pytest.approx(19.47, abs=TOL)

    def test_spi_admm(self):
        from tfpnp_tpu.tasks import spi
        rhos, sigmas = ops.get_rho_sigma(sigma=2 / 255, iter_num=IT,
                                         model_sigma1=50.0, model_sigma2=10.0)
        data = jax.jit(lambda k1, k2: spi.make_data(
            k2, random_images(k1, B, N), K=8))(
                jax.random.PRNGKey(16), jax.random.PRNGKey(17))
        p0, p1 = _gains(get_solver("spi_admm", TVDenoiser()), data,
                        {"sigma_d": _bc(sigmas),
                         "mu": _bc(jnp.clip(rhos, 60 / 255, None))})
        assert p0 == pytest.approx(16.52, abs=TOL)
        assert p1 == pytest.approx(20.14, abs=TOL)

    def test_sr_admm(self):
        from tfpnp_tpu.tasks import sr
        from tfpnp_tpu.tasks.deblur import kernel_bank
        rhos, sigmas = ops.get_rho_sigma(sigma=2.55 / 255, iter_num=IT,
                                         model_sigma1=35.0, model_sigma2=5.0)
        kernels = jnp.asarray(kernel_bank())
        data = jax.jit(lambda k1, k2: sr.make_data(
            k2, random_images(k1, B, N), kernels, scale=2,
            sigma_list=(2.55,)))(
                jax.random.PRNGKey(20), jax.random.PRNGKey(21))
        p0, p1 = _gains(get_solver("sr_admm", TVDenoiser()), data,
                        {"sigma_d": _bc(sigmas), "mu": _bc(rhos)})
        assert p0 == pytest.approx(20.93, abs=TOL)
        assert p1 == pytest.approx(24.28, abs=TOL)

    def test_deblur_admm(self):
        from tfpnp_tpu.tasks import deblur
        rhos, sigmas = ops.get_rho_sigma(sigma=7.65 / 255, iter_num=IT,
                                         model_sigma1=35.0, model_sigma2=5.0)
        kernels = jnp.asarray(deblur.kernel_bank())
        data = jax.jit(lambda k1, k2: deblur.make_data(
            k2, random_images(k1, B, N), kernels, sigma_list=(7.65,)))(
                jax.random.PRNGKey(18), jax.random.PRNGKey(19))
        p0, p1 = _gains(get_solver("deblur_admm", TVDenoiser()), data,
                        {"sigma_d": _bc(sigmas), "mu": _bc(rhos)})
        assert p0 == pytest.approx(21.54, abs=TOL)
        assert p1 == pytest.approx(23.55, abs=TOL)

    def test_inpaint_admm(self):
        from tfpnp_tpu.tasks import inpaint
        rhos, sigmas = ops.get_rho_sigma(sigma=2.55 / 255, iter_num=IT,
                                         model_sigma1=35.0, model_sigma2=5.0)
        data = jax.jit(lambda k1, k2: inpaint.make_data(
            k2, random_images(k1, B, N), rates=(0.3,), sigma_list=(2.55,)))(
                jax.random.PRNGKey(22), jax.random.PRNGKey(23))
        p0, p1 = _gains(get_solver("inpaint_admm", TVDenoiser()), data,
                        {"sigma_d": _bc(sigmas), "mu": _bc(rhos)})
        assert p0 == pytest.approx(16.62, abs=TOL)
        assert p1 == pytest.approx(34.37, abs=TOL)
