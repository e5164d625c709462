"""Solver-layer tests: registry, bundle scan, convergence, differentiability.

Uses a cheap stand-in denoiser (box blur) so no trained weights are needed;
convergence checks use noiseless / fully-sampled settings where the solver
fixed point is analytic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpnp_tpu import ops
from tfpnp_tpu.pnp import get_solver, run_bundle, SOLVER_REGISTRY

KEY = jax.random.PRNGKey(0)


def blur_denoiser(x, sigma):
    """3x3 box blur scaled toward identity by sigma — a crude but smooth
    'denoiser' adequate for mechanics tests. x: [B, H, W], sigma: [B]."""
    k = jnp.ones((3, 3)) / 9.0
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
    blurred = jax.lax.conv_general_dilated(
        pad[:, None], k[None, None], (1, 1), "VALID")[:, 0]
    w = jnp.clip(sigma.reshape(-1, 1, 1) * 4.0, 0.0, 1.0)
    return (1 - w) * x + w * blurred


def identity_denoiser(x, sigma):
    return x


def make_phantom(b=2, n=32):
    yy, xx = np.mgrid[:n, :n]
    img = np.zeros((b, n, n), np.float32)
    for i in range(b):
        img[i] = 0.3 + 0.5 * (((yy - 12 - i) ** 2 + (xx - 16) ** 2) < 80)
    return jnp.asarray(img)


def make_csmri_data(b=2, n=32, accel=0.4, sigma_n=0.0, key=KEY):
    gt = make_phantom(b, n)
    mask = jax.random.bernoulli(key, accel, (n, n))
    mask = mask.at[n // 2 - 3:n // 2 + 3, n // 2 - 3:n // 2 + 3].set(True)
    mask = jnp.broadcast_to(mask, (b, n, n))
    y0 = ops.fft2c(gt.astype(jnp.complex64))
    if sigma_n > 0:
        y0 = y0 + sigma_n * (jax.random.normal(key, y0.shape) + 1j * jax.random.normal(key, y0.shape))
    y0 = jnp.where(mask, y0, 0.0)
    x0 = ops.ifft2c(y0)
    return {"gt": gt, "y0": y0, "mask": mask, "x0": x0}


def hyper_for(solver, b, pack, sigma_d=0.08, mu=0.5, tau=0.4, beta=0.1, lamda=0.5):
    vals = {"sigma_d": sigma_d, "mu": mu, "tau": tau, "beta": beta, "lamda": lamda}
    return {k: jnp.full((b, pack), vals[k], jnp.float32) for k in solver.action_keys}


class TestRegistry:
    def test_all_registered(self):
        want = {"csmri_admm", "csmri_hqs", "csmri_pg", "csmri_apg", "csmri_redadmm",
                "csmri_amp", "pr_iadmm", "pr_pg", "ct_iadmm", "ct_pg", "spi_admm"}
        assert want <= set(SOLVER_REGISTRY)

    def test_num_var_matches_reference(self):
        # reference num_var: ADMM 3, HQS 2, PG 1, APG 2, RED 3, AMP 2
        # (pnp/solver/base.py:91-232)
        d = identity_denoiser
        assert get_solver("csmri_admm", d).num_var == 3
        assert get_solver("csmri_hqs", d).num_var == 2
        assert get_solver("csmri_pg", d).num_var == 1
        assert get_solver("csmri_apg", d).num_var == 2
        assert get_solver("csmri_redadmm", d).num_var == 3
        assert get_solver("csmri_amp", d).num_var == 2


class TestCSMRISolvers:
    @pytest.mark.parametrize("name", ["csmri_admm", "csmri_hqs", "csmri_pg",
                                      "csmri_apg", "csmri_redadmm"])
    def test_improves_psnr(self, name):
        solver = get_solver(name, blur_denoiser)
        data = make_csmri_data(sigma_n=0.05)
        state = solver.init(data)
        aux = solver.filter_aux(data)
        p0 = ops.psnr(solver.get_output(state), data["gt"])
        hyper = hyper_for(solver, 2, 6, sigma_d=0.05, mu=1.0, tau=0.8, beta=0.1, lamda=0.5)
        state = run_bundle(solver, state, aux, hyper)
        p1 = ops.psnr(solver.get_output(state), data["gt"])
        assert np.all(np.asarray(p1) > np.asarray(p0) + 0.2), (np.asarray(p0), np.asarray(p1))

    def test_admm_fixed_point_full_mask(self):
        # with full sampling, no noise, and an identity denoiser, gt is a
        # fixed point of the ADMM iteration
        solver = get_solver("csmri_admm", identity_denoiser)
        data = make_csmri_data(accel=1.1, sigma_n=0.0)
        state = solver.init(data)
        hyper = hyper_for(solver, 2, 4)
        state = run_bundle(solver, state, solver.filter_aux(data), hyper)
        np.testing.assert_allclose(np.asarray(solver.get_output(state)),
                                   np.asarray(data["gt"]), atol=1e-4)

    def test_bundle_equals_loop(self):
        solver = get_solver("csmri_admm", blur_denoiser)
        data = make_csmri_data()
        aux = solver.filter_aux(data)
        hyper = hyper_for(solver, 2, 3)
        s_scan = run_bundle(solver, solver.init(data), aux, hyper)
        s_loop = solver.init(data)
        for i in range(3):
            h_i = {k: v[:, i] for k, v in hyper.items()}
            s_loop = solver.iterate(s_loop, aux, h_i)
        for k in s_scan:
            np.testing.assert_allclose(np.asarray(s_scan[k]), np.asarray(s_loop[k]), atol=1e-6)

    def test_grad_flows_through_bundle(self):
        solver = get_solver("csmri_admm", blur_denoiser)
        data = make_csmri_data()
        aux = solver.filter_aux(data)

        def loss(sigma_d):
            hyper = hyper_for(solver, 2, 2)
            hyper["sigma_d"] = sigma_d
            state = run_bundle(solver, solver.init(data), aux, hyper)
            return -jnp.mean(ops.psnr(solver.get_output(state), data["gt"]))

        g = jax.grad(loss)(jnp.full((2, 2), 0.1))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0

    def test_amp_runs(self):
        solver = get_solver("csmri_amp", blur_denoiser)
        data = make_csmri_data()
        state = solver.init(data)
        hyper = hyper_for(solver, 2, 3, sigma_d=1.0)
        state = run_bundle(solver, state, solver.filter_aux(data), hyper, key=KEY)
        out = solver.get_output(state)
        assert out.shape == (2, 32, 32)
        assert np.all(np.isfinite(np.asarray(out)))


class TestPRSolvers:
    def make_data(self, b=2, n=32, s=2):
        gt = make_phantom(b, n)
        k1, k2 = jax.random.split(KEY)
        mask = jnp.exp(1j * 2 * np.pi * jax.random.uniform(k1, (b, s, n, n))).astype(jnp.complex64)
        y0 = jnp.abs(ops.cdp_forward(gt, mask))
        x0 = jnp.ones_like(gt)
        return {"gt": gt, "y0": y0, "mask": mask, "x0": x0}

    @pytest.mark.parametrize("name", ["pr_iadmm", "pr_pg"])
    def test_improves_psnr(self, name):
        solver = get_solver(name, blur_denoiser)
        data = self.make_data()
        state = solver.init(data)
        aux = solver.filter_aux(data)
        p0 = ops.psnr(solver.get_output(state), data["gt"])
        hyper = hyper_for(solver, 2, 20, sigma_d=0.02, tau=1.2, mu=0.05)
        state = run_bundle(solver, state, aux, hyper)
        p1 = ops.psnr(solver.get_output(state), data["gt"])
        assert np.all(np.asarray(p1) > np.asarray(p0) + 1.0), (np.asarray(p0), np.asarray(p1))


class TestSPISolver:
    def test_improves_psnr(self):
        gt = make_phantom(2, 32)
        K = 8
        ob = ops.spi_forward(gt, K=K, alpha=float(K * K), q=1.0, key=KEY)
        # x0 = average pooling of the binary observation (tasks/spi/dataset.py:50)
        x0 = ob.reshape(2, 32, K, 32, K).mean(axis=(2, 4))
        data = {"gt": gt, "x0": x0, "K": jnp.full((2,), float(K))}
        solver = get_solver("spi_admm", blur_denoiser)
        state = solver.init(data)
        aux = solver.filter_aux(data)
        p0 = ops.psnr(solver.get_output(state), gt)
        hyper = hyper_for(solver, 2, 10, sigma_d=0.05, mu=80.0)
        state = run_bundle(solver, state, aux, hyper)
        p1 = ops.psnr(solver.get_output(state), gt)
        assert np.all(np.asarray(p1) > np.asarray(p0) + 0.5), (np.asarray(p0), np.asarray(p1))


class TestCTSolvers:
    @pytest.mark.parametrize("name", ["ct_iadmm", "ct_pg"])
    def test_improves_psnr(self, name):
        n, views = 32, 12
        radon = ops.RadonGenerator()(n, views)
        gt = make_phantom(2, n)
        y0 = radon.forward(gt)
        x0 = jnp.clip(radon.filter_backprojection(y0), 0.0, 1.0)
        data = {"gt": gt, "y0": y0, "x0": x0}
        solver = get_solver(name, blur_denoiser, radon=radon)
        state = solver.init(data)
        aux = solver.filter_aux(data)
        p0 = ops.psnr(solver.get_output(state), gt)
        hyper = hyper_for(solver, 2, 10, sigma_d=0.02, tau=1.2, mu=0.05)
        state = run_bundle(solver, state, aux, hyper)
        p1 = ops.psnr(solver.get_output(state), gt)
        assert np.all(np.asarray(p1) > np.asarray(p0) + 0.5), (np.asarray(p0), np.asarray(p1))


class TestDivergenceSafety:
    """A policy can sample tau*(1+mu) > 2 where unprojected iADMM diverges
    geometrically; the box projection and the observation clip must keep
    both the solver state and what the networks see bounded."""

    def test_ct_iadmm_bounded_under_divergent_hyper(self):
        import numpy as np
        from tfpnp_tpu.env.base import OBS_CLIP, PnPEnv, _var_channels
        from tfpnp_tpu.pnp import get_solver, run_bundle
        from tfpnp_tpu.pnp.tv import TVDenoiser
        from tfpnp_tpu.tasks import ct as ct_task
        from tfpnp_tpu.utils.options import Options

        opt = Options().parse(["--task", "ct", "--solver", "iadmm",
                               "--env_batch", "2", "--image_size", "32",
                               "--exp", "tmp_divchk"])
        env, sample_data, _, _, _ = ct_task.build(opt, TVDenoiser(n_iter=2))
        data = sample_data(jax.random.PRNGKey(0))
        solver = env.solver

        hyper = {"sigma_d": np.full((2, 30), 10 / 255, np.float32),
                 "mu": np.full((2, 30), 1.0, np.float32),
                 "tau": np.full((2, 30), 2.0, np.float32)}  # worst case
        state = jax.jit(lambda d: run_bundle(
            solver, solver.init(d), solver.filter_aux(d), hyper))(data)
        for k, v in state.items():
            arr = np.asarray(v)
            assert np.isfinite(arr).all(), k
            assert np.abs(arr).max() < 1e3, (k, np.abs(arr).max())
        obs = np.asarray(_var_channels(solver, state))
        assert np.abs(obs).max() <= OBS_CLIP + 1e-6

    def test_obs_clip_sanitizes_nonfinite_state(self):
        import numpy as np
        from tfpnp_tpu.env.base import OBS_CLIP, _var_channels
        from tfpnp_tpu.pnp import get_solver
        from tfpnp_tpu.pnp.tv import TVDenoiser

        solver = get_solver("csmri_admm", TVDenoiser(n_iter=1))
        bad = jnp.asarray([[[np.nan, np.inf], [-np.inf, 1e9]]])
        state = {"x": bad, "z": bad, "u": bad}
        obs = np.asarray(_var_channels(solver, state))
        assert np.isfinite(obs).all()
        assert np.abs(obs).max() <= OBS_CLIP


class TestDegenerateHyperparameters:
    def test_redadmm_mu_lam_zero_is_finite(self):
        """A saturated policy CAN emit exact mu = lamda = 0 (both ranges
        start at 0, reference network.py:227): the RED-ADMM x-update is
        then 0/0 and one NaN image poisons a whole training rollout
        (observed round 3). The degenerate corner must keep the previous
        iterate and stay finite."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from tfpnp_tpu.data.synthetic import random_images
        from tfpnp_tpu.pnp import get_solver, run_bundle
        from tfpnp_tpu.pnp.tv import TVDenoiser
        from tfpnp_tpu.tasks import csmri

        n = 32
        gt = random_images(jax.random.PRNGKey(0), 2, n)
        masks = jnp.asarray(np.stack([csmri.radial_mask(n, 4)]))
        data = csmri.make_data(jax.random.PRNGKey(1), gt, masks,
                               sigma_list=(15.0,))
        solver = get_solver("csmri_redadmm", TVDenoiser(n_iter=2))
        # bang-bang extremes incl. the 0/0 corner on every iteration
        zeros = jnp.zeros((2, 4), jnp.float32)
        hyper = {"sigma_d": zeros + 0.1, "mu": zeros, "lamda": zeros}
        out = run_bundle(solver, solver.init(data),
                         solver.filter_aux(data), hyper)
        x = np.asarray(jnp.abs(solver.get_output(out)))
        assert np.isfinite(x).all()
