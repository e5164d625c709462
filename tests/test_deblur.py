"""Deblurring task tests: OTF correctness, Wiener-step optimality,
restoration quality, env wiring, differentiability.

The deblur family is beyond-reference (SURVEY §2.2 lists four tasks);
these tests define its contract the same way the reference tasks are
locked by tests/test_solvers.py and tests/test_golden_quality.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpnp_tpu.pnp import get_solver, run_bundle, SOLVER_REGISTRY
from tfpnp_tpu.tasks.deblur import (OB_BASE_DIM, blur_apply, kernel_bank,
                                    make_data, pack_obs, psf2otf)

KEY = jax.random.PRNGKey(0)


def identity_denoiser(x, sigma):
    return x


def make_phantom(b=2, n=32):
    yy, xx = np.mgrid[:n, :n]
    img = np.zeros((b, n, n), np.float32)
    for i in range(b):
        img[i] = 0.3 + 0.5 * (((yy - 12 - i) ** 2 + (xx - 16) ** 2) < 80)
    return jnp.asarray(img)


def make_deblur_data(b=2, n=32, sigma_n=0.0, kidx=0, key=KEY):
    gt = make_phantom(b, n)

    @jax.jit
    def synth(gt):
        kf = jnp.broadcast_to(psf2otf(jnp.asarray(kernel_bank()[kidx:kidx + 1]), n),
                              (b, n, n))
        y0 = blur_apply(kf, gt)
        if sigma_n > 0:
            y0 = y0 + sigma_n * jax.random.normal(key, gt.shape)
        return {"gt": gt, "y0": y0, "kf": kf, "x0": y0,
                "sigma_n": jnp.full((b,), sigma_n, jnp.float32)}

    return synth(gt)


class TestOperator:
    def test_registry(self):
        assert {"deblur_admm", "deblur_hqs", "deblur_pg"} <= set(SOLVER_REGISTRY)
        assert get_solver("deblur_admm", identity_denoiser).num_var == 3
        assert get_solver("deblur_hqs", identity_denoiser).num_var == 2
        assert get_solver("deblur_pg", identity_denoiser).num_var == 1

    def test_otf_matches_direct_circular_convolution(self):
        n = 16
        k = kernel_bank()[1]
        x = np.asarray(make_phantom(1, n))[0]
        ks = k.shape[0]
        direct = np.zeros_like(x)
        for dy in range(ks):
            for dx in range(ks):
                direct += k[dy, dx] * np.roll(x, (dy - ks // 2, dx - ks // 2),
                                              axis=(0, 1))
        via_otf = jax.jit(lambda xx: blur_apply(
            psf2otf(jnp.asarray(k)[None], n), xx[None])[0])(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(via_otf), direct, atol=1e-5)

    def test_kernels_normalized(self):
        bank = kernel_bank()
        np.testing.assert_allclose(bank.sum(axis=(1, 2)), 1.0, atol=1e-6)
        assert bank.shape[0] == 8

    def test_wiener_step_solves_normal_equations(self):
        # z* = argmin ||Az-y||^2 + mu||z-v||^2  =>  (A^T A + mu I) z = A^T y + mu v
        from tfpnp_tpu.pnp.solvers.deblur import _aux, _wiener_step
        data = make_deblur_data(b=1, n=16)
        v = make_phantom(1, 16) * 0.7 + 0.1
        mu = jnp.asarray([0.3])

        @jax.jit
        def residual(data, v, mu):
            aux = _aux(data)
            z = _wiener_step(v, aux, mu)
            kf = data["kf"]
            AtAz = blur_apply(jnp.conj(kf), blur_apply(kf, z))
            Aty = blur_apply(jnp.conj(kf), data["y0"])
            return AtAz + mu[:, None, None] * z - (Aty + mu[:, None, None] * v)

        r = residual(data, v, mu)
        assert float(jnp.max(jnp.abs(r))) < 1e-4


class TestSolvers:
    @pytest.mark.parametrize("name", ["deblur_admm", "deblur_hqs", "deblur_pg"])
    def test_improves_psnr_from_blurry_init(self, name):
        from tfpnp_tpu.ops.metrics import psnr
        data = make_deblur_data(b=2, n=32, sigma_n=0.0)
        solver = get_solver(name, identity_denoiser)
        # gradient descent on ||Ax-y||^2 is stable for tau < 2/max|K|^2 = 2
        # but converges slowly; the proximal solvers get 20 exact steps
        iters = 60 if name == "deblur_pg" else 20
        vals = {"sigma_d": 0.05, "mu": 0.02, "tau": 1.9}
        hyper = {k: jnp.full((2, iters), vals[k], jnp.float32)
                 for k in solver.action_keys}

        @jax.jit
        def run(d):
            state = run_bundle(solver, solver.init(d), solver.filter_aux(d), hyper)
            return solver.get_output(state)

        out = run(data)
        gain = psnr(out, data["gt"]) - psnr(data["x0"], data["gt"])
        assert float(gain.min()) > 3.0, f"{name}: gain {gain}"

    def test_restore_api_with_tv(self):
        from tfpnp_tpu.api import restore
        from tfpnp_tpu.ops.metrics import psnr
        from tfpnp_tpu.pnp.tv import TVDenoiser
        data = make_deblur_data(b=1, n=32, sigma_n=0.01)
        out = restore("deblur_admm", data, denoiser=TVDenoiser(), iters=15,
                      sigma_n=0.01)
        gain = psnr(out, data["gt"]) - psnr(data["x0"], data["gt"])
        assert float(gain.min()) > 1.0

    @pytest.mark.parametrize("name", ["deblur_admm", "deblur_hqs"])
    def test_gradients_finite_at_tiny_mu(self, name):
        """MDDPG regression: mu -> 0 where the OTF is ~0 blew up the update
        (NaN at episode 23 of the first TPU training run); the projected
        z-update must keep a 30-iteration bundle's gradients finite."""
        solver = get_solver(name, identity_denoiser)
        data = make_deblur_data(b=1, n=32, sigma_n=0.01, kidx=0)  # Gaussian OTF

        @jax.jit
        @jax.grad
        def loss(mu):
            hyper = {"sigma_d": jnp.full((1, 30), 0.05),
                     "mu": jnp.broadcast_to(mu, (1, 30))}
            state = run_bundle(solver, solver.init(data),
                               solver.filter_aux(data), hyper)
            return jnp.mean((solver.get_output(state) - data["gt"]) ** 2)

        for mu in (1e-4, 5e-3, 0.3):
            g = loss(jnp.asarray(mu))
            assert np.isfinite(float(g)), f"{name} grad at mu={mu}: {g}"

    def test_differentiable_through_bundle(self):
        solver = get_solver("deblur_pg", identity_denoiser)
        data = make_deblur_data(b=1, n=16)

        @jax.jit
        @jax.grad
        def loss(tau):
            hyper = {"sigma_d": jnp.full((1, 3), 0.05),
                     "tau": jnp.broadcast_to(tau, (1, 3))}
            state = run_bundle(solver, solver.init(data),
                               solver.filter_aux(data), hyper)
            return jnp.mean((solver.get_output(state) - data["gt"]) ** 2)

        g = loss(jnp.asarray(0.8))
        assert np.isfinite(float(g)) and abs(float(g)) > 0


class TestEnvAndData:
    def test_make_data_jitted(self):
        gt = make_phantom(4, 32)
        data = jax.jit(lambda k, g: make_data(k, g, jnp.asarray(kernel_bank())))(
            KEY, gt)
        assert data["y0"].shape == (4, 32, 32)
        assert data["kf"].dtype == jnp.complex64
        assert np.isfinite(np.asarray(data["y0"])).all()

    def test_env_episode_and_obs_layout(self):
        from tfpnp_tpu.env.base import PnPEnv
        solver = get_solver("deblur_admm", identity_denoiser)
        env = PnPEnv(solver, pack_obs, max_episode_step=3)
        data = make_deblur_data(b=2, n=32, sigma_n=0.01)
        state = env.reset(data)
        ob = env.observe(state)
        assert ob.shape == (2, 32, 32, solver.num_var + OB_BASE_DIM)
        action = {"sigma_d": jnp.full((2, 2), 0.05),
                  "mu": jnp.full((2, 2), 0.1),
                  "idx_stop": jnp.zeros((2,), jnp.int32)}
        state, reward, done, all_done = jax.jit(env.step)(state, action)
        assert reward.shape == (2,) and not bool(all_done)

    def test_actor_spec_exists(self):
        from tfpnp_tpu.models.actor import actor_spec_for
        for name in ("deblur_admm", "deblur_hqs", "deblur_pg"):
            ranges, actor = actor_spec_for(name, 5)
            assert "sigma_d" in ranges

    def test_cli_train_end_to_end(self, tmp_path):
        """Tiny CLI training run: trainer + device replay (with the
        complex kf field) + checkpoint, same smoke as tests/test_cli.py."""
        from tfpnp_tpu.cli import main
        main(["--task", "deblur", "--solver", "admm", "--denoiser", "tv",
              "--exp", "t", "--log_root", str(tmp_path),
              "--env_batch", "2", "--rmsize", "4", "--warmup", "1",
              "--train_steps", "6", "--max_episode_step", "2",
              "--action_pack", "1", "--episode_train_times", "1",
              "--validate_interval", "1000000", "--save_freq", "1000000",
              "--image_size", "32", "--mesh_dp", "1"])
        assert (tmp_path / "t" / "ckpt" / "final.pkl").exists()


class TestBlindKernelEstimation:
    def test_calibrated_width_estimate_within_tolerance(self):
        """The blind spectral estimator (pnp/blind.py) must land within
        the +-20% band where the shipped policies degrade gracefully
        (RESULTS.md robustness table), across the isotropic bank."""
        import numpy as np

        from tfpnp_tpu.data.synthetic import random_images
        from tfpnp_tpu.pnp.blind import estimate_gaussian_width
        from tfpnp_tpu.tasks import deblur as db

        n = 64
        ref = np.asarray(random_images(jax.random.PRNGKey(999), 64, n))
        for true_w in (1.2, 1.8, 2.4):
            k = jnp.asarray(db.gaussian_kernel(true_w)[None])
            gt = random_images(jax.random.PRNGKey(7), 7, n)
            data = jax.jit(lambda kk, g, k=k: db.make_data(
                kk, g, k, sigma_list=(7.65,)))(jax.random.PRNGKey(1), gt)
            w_hat = estimate_gaussian_width(np.asarray(data["y0"]),
                                            7.65 / 255, ref_images=ref)
            # asymmetric band matching the shrinkage design: under-
            # estimates are cheap (-20% costs 0.38 dB), over-estimates
            # are not (+20% costs 1.33 dB)
            assert -0.35 < (w_hat / true_w - 1.0) < 0.15, (true_w, w_hat)

    def test_power_law_fallback_runs(self):
        """Without a calibration corpus the analytic power-law prior
        still returns a sane width (coarser; used off-corpus)."""
        import numpy as np

        from tfpnp_tpu.data.synthetic import random_images
        from tfpnp_tpu.pnp.blind import estimate_gaussian_width
        from tfpnp_tpu.tasks import deblur as db

        k = jnp.asarray(db.gaussian_kernel(1.8)[None])
        gt = random_images(jax.random.PRNGKey(7), 7, 64)
        data = jax.jit(lambda kk, g: db.make_data(
            kk, g, k, sigma_list=(7.65,)))(jax.random.PRNGKey(1), gt)
        w_hat = estimate_gaussian_width(np.asarray(data["y0"]), 7.65 / 255)
        assert 0.05 <= w_hat <= 4.0

    def test_family_blind_estimate_recovers_each_family(self):
        """Round-4 generalized estimator (pnp/blind.py estimate_kernel):
        in 'auto' mode — neither parameters NOR family given — it must
        return a kernel close to the truth for a member of each shipped
        family (isotropic/anisotropic Gaussian + motion line,
        tasks/deblur.py kernel_bank). Closeness is measured on the
        kernel itself (relative L2), not the family label: an
        anisotropic fit with wx ~ wy is a correct answer for an
        isotropic truth."""
        import numpy as np

        from tfpnp_tpu.data.synthetic import random_images
        from tfpnp_tpu.pnp.blind import estimate_kernel
        from tfpnp_tpu.tasks import deblur as db

        n = 64
        ref = np.asarray(random_images(jax.random.PRNGKey(999), 64, n))
        gt = random_images(jax.random.PRNGKey(77), 7, n)
        bank = db.kernel_bank()
        for fam, kt in (("gaussian", bank[1]), ("aniso", bank[4]),
                        ("motion", bank[6])):
            data = jax.jit(lambda k, g, kk: db.make_data(
                k, g, kk, sigma_list=(7.65,)))(
                jax.random.PRNGKey(1), gt, jnp.asarray(kt)[None])
            k_hat, info = estimate_kernel(
                np.asarray(data["y0"]), 7.65 / 255, family="auto",
                ref_images=ref)
            rel = float(np.sum((k_hat - np.asarray(kt)) ** 2)
                        / np.sum(np.asarray(kt) ** 2))
            # shrinkage widens the gaussian-family gap deliberately;
            # 0.35 relative energy keeps the estimate inside the
            # graceful-degradation band measured in RESULTS.md
            assert rel < 0.35, (fam, info, rel)
            # gaussian and aniso are nested families (wx == wy is
            # isotropic): either label is correct for either truth, as
            # long as the KERNEL matches (asserted above). Motion is
            # structurally distinct and must be identified exactly.
            ok = ({"gaussian", "aniso"} if fam in ("gaussian", "aniso")
                  else {"motion"})
            assert info["family"] in ok, (fam, info)

    def test_family_blind_single_family_mode(self):
        """family='motion' restricts the search; the returned params are
        (half_len, theta) near the bank's rasterized line."""
        import numpy as np

        from tfpnp_tpu.data.synthetic import random_images
        from tfpnp_tpu.pnp.blind import estimate_kernel
        from tfpnp_tpu.tasks import deblur as db

        n = 64
        kt = db.kernel_bank()[7]  # theta = 2*pi/3, half_len 6.75
        gt = random_images(jax.random.PRNGKey(8), 7, n)
        data = jax.jit(lambda k, g: db.make_data(
            k, g, jnp.asarray(kt)[None], sigma_list=(7.65,)))(
            jax.random.PRNGKey(2), gt)
        ref = np.asarray(random_images(jax.random.PRNGKey(999), 64, n))
        k_hat, info = estimate_kernel(np.asarray(data["y0"]), 7.65 / 255,
                                      family="motion", ref_images=ref)
        l_hat, th_hat = info["params"]
        assert abs(l_hat - 0.45 * 15) < 1.5, info
        # orientation mod pi
        d = abs((th_hat - 2 * np.pi / 3 + np.pi / 2) % np.pi - np.pi / 2)
        assert d < 0.15, info
