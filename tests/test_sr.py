"""Super-resolution task tests: adjoint, aliased-band prox optimality,
restoration quality, env wiring, CLI end-to-end.

Second beyond-reference family (SURVEY §2.2 lists four tasks); contract
locked the same way as tests/test_deblur.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpnp_tpu.pnp import get_solver, run_bundle, SOLVER_REGISTRY
from tfpnp_tpu.pnp.solvers.sr import block_mean, sr_prox, upsample_zero
from tfpnp_tpu.tasks.deblur import kernel_bank, psf2otf
from tfpnp_tpu.tasks.sr import OB_BASE_DIM, make_data, pack_obs, sr_apply

KEY = jax.random.PRNGKey(0)


def identity_denoiser(x, sigma):
    return x


def make_phantom(b=2, n=32):
    yy, xx = np.mgrid[:n, :n]
    img = np.zeros((b, n, n), np.float32)
    for i in range(b):
        img[i] = 0.3 + 0.5 * (((yy - 12 - i) ** 2 + (xx - 16) ** 2) < 80)
    return jnp.asarray(img)


def make_sr_data(b=2, n=32, scale=2, sigma_n=0.0, kidx=0, key=KEY):
    gt = make_phantom(b, n)

    @jax.jit
    def synth(gt):
        kf = jnp.broadcast_to(
            psf2otf(jnp.asarray(kernel_bank()[kidx:kidx + 1]), n), (b, n, n))
        y0 = sr_apply(kf, gt, scale)
        if sigma_n > 0:
            y0 = y0 + sigma_n * jax.random.normal(key, y0.shape)
        y0_up = jax.image.resize(y0, (b, n, n), method="bicubic"
                                 ).astype(jnp.float32)
        return {"gt": gt, "y0": y0, "y0_up": y0_up, "kf": kf, "x0": y0_up,
                "sigma_n": jnp.full((b,), sigma_n, jnp.float32)}

    return synth(gt)


class TestOperator:
    def test_registry(self):
        for s in ("", "3", "4"):
            assert {f"sr{s}_admm", f"sr{s}_hqs", f"sr{s}_pg"} <= set(SOLVER_REGISTRY)
        assert get_solver("sr_admm", identity_denoiser).num_var == 3
        assert get_solver("sr4_pg", identity_denoiser).num_var == 1

    def test_upsample_zero_is_decimation_adjoint(self):
        # <S x, y> == <x, S^T y>
        k1, k2 = jax.random.split(KEY)
        x = jax.random.normal(k1, (2, 16, 16))
        y = jax.random.normal(k2, (2, 8, 8))
        lhs = jnp.sum(x[:, ::2, ::2] * y)
        rhs = jnp.sum(x * upsample_zero(y, 2))
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-6)

    def test_block_mean_folds_aliases(self):
        f = jax.random.normal(KEY, (1, 8, 8))
        out = block_mean(f, 2)
        expected = (f[:, :4, :4] + f[:, 4:, :4] + f[:, :4, 4:] + f[:, 4:, 4:]) / 4
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-6)

    @pytest.mark.parametrize("scale", [1, 2, 3, 4])
    def test_sr_prox_solves_normal_equations(self, scale):
        # z* = argmin ||Az-y||² + mu||z-v||²  =>  (AᵀA + mu I) z = Aᵀy + mu v
        from tfpnp_tpu.pnp.solvers.sr import _make_aux
        n = 48 if scale == 3 else 16  # n must be divisible by the scale
        gt = make_phantom(1, n)
        v = make_phantom(1, n) * 0.7 + 0.1
        mu = jnp.asarray([0.3])

        @jax.jit
        def residual(gt, v, mu):
            kf = psf2otf(jnp.asarray(kernel_bank()[1:2]), n)
            y0 = sr_apply(kf, gt, scale)
            aux = _make_aux(scale)({"kf": kf, "y0": y0})
            z = sr_prox(v, aux, mu)
            az = sr_apply(kf, z, scale)
            ataz = jnp.real(jnp.fft.ifft2(
                jnp.conj(kf) * jnp.fft.fft2(upsample_zero(az, scale))))
            aty = jnp.real(jnp.fft.ifft2(
                jnp.conj(kf) * jnp.fft.fft2(upsample_zero(y0, scale))))
            return ataz + mu[:, None, None] * z - (aty + mu[:, None, None] * v)

        r = residual(gt, v, mu)
        assert float(jnp.max(jnp.abs(r))) < 1e-4, f"scale {scale}"

    def test_scale1_prox_equals_deblur_wiener(self):
        from tfpnp_tpu.pnp.solvers.deblur import _aux as deblur_aux
        from tfpnp_tpu.pnp.solvers.deblur import _wiener_step
        from tfpnp_tpu.pnp.solvers.sr import _make_aux
        n = 16
        gt = make_phantom(1, n)
        v = make_phantom(1, n) * 0.6 + 0.2
        mu = jnp.asarray([0.4])

        @jax.jit
        def both(gt, v, mu):
            kf = psf2otf(jnp.asarray(kernel_bank()[2:3]), n)
            y0 = sr_apply(kf, gt, 1)
            data = {"kf": kf, "y0": y0}
            return (sr_prox(v, _make_aux(1)(data), mu),
                    _wiener_step(v, deblur_aux(data), mu))

        a, b = both(gt, v, mu)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestSolvers:
    @pytest.mark.parametrize("name", ["sr_admm", "sr_hqs", "sr_pg"])
    def test_improves_psnr_from_bicubic_init(self, name):
        from tfpnp_tpu.ops.metrics import psnr
        data = make_sr_data(b=2, n=32, scale=2, sigma_n=0.0)
        solver = get_solver(name, identity_denoiser)
        iters = 120 if name == "sr_pg" else 30
        vals = {"sigma_d": 0.05, "mu": 0.01, "tau": 1.9}
        hyper = {k: jnp.full((2, iters), vals[k], jnp.float32)
                 for k in solver.action_keys}

        @jax.jit
        def run(d):
            state = run_bundle(solver, solver.init(d), solver.filter_aux(d),
                               hyper)
            return solver.get_output(state)

        out = run(data)
        gain = psnr(out, data["gt"]) - psnr(data["x0"], data["gt"])
        assert float(gain.min()) > 2.0, f"{name}: gain {gain}"

    def test_restore_api_with_tv(self):
        from tfpnp_tpu.api import restore
        from tfpnp_tpu.ops.metrics import psnr
        from tfpnp_tpu.pnp.tv import TVDenoiser
        data = make_sr_data(b=1, n=32, scale=2, sigma_n=0.01)
        out = restore("sr_admm", data, denoiser=TVDenoiser(), iters=15,
                      sigma_n=0.01)
        gain = psnr(out, data["gt"]) - psnr(data["x0"], data["gt"])
        assert float(gain.min()) > 0.5

    def test_gradients_finite_at_tiny_mu(self):
        """Same MDDPG stability contract as deblur: sr_prox has an explicit
        1/mu, so the projected z-update must bound a long bundle's grads."""
        solver = get_solver("sr_admm", identity_denoiser)
        data = make_sr_data(b=1, n=32, scale=2, sigma_n=0.01)

        @jax.jit
        @jax.grad
        def loss(mu):
            hyper = {"sigma_d": jnp.full((1, 30), 0.05),
                     "mu": jnp.broadcast_to(mu, (1, 30))}
            state = run_bundle(solver, solver.init(data),
                               solver.filter_aux(data), hyper)
            return jnp.mean((solver.get_output(state) - data["gt"]) ** 2)

        for mu in (1e-4, 1e-2, 0.3):
            g = loss(jnp.asarray(mu))
            assert np.isfinite(float(g)), f"grad at mu={mu}: {g}"

    def test_differentiable_through_bundle(self):
        solver = get_solver("sr_pg", identity_denoiser)
        data = make_sr_data(b=1, n=16, scale=2)

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
        data = jax.jit(lambda k, g: make_data(
            k, g, jnp.asarray(kernel_bank()), scale=2))(KEY, gt)
        assert data["y0"].shape == (4, 16, 16)
        assert data["x0"].shape == (4, 32, 32)
        assert data["kf"].dtype == jnp.complex64
        assert np.isfinite(np.asarray(data["y0"])).all()

    def test_make_data_rejects_indivisible_size(self):
        gt = make_phantom(1, 32)  # 32 % 3 != 0
        with pytest.raises(ValueError, match="divisible"):
            make_data(KEY, gt, jnp.asarray(kernel_bank()), scale=3)

    def test_env_episode_and_obs_layout(self):
        from tfpnp_tpu.env.base import PnPEnv
        solver = get_solver("sr_admm", identity_denoiser)
        env = PnPEnv(solver, pack_obs, max_episode_step=3)
        data = make_sr_data(b=2, n=32, scale=2, sigma_n=0.01)
        state = env.reset(data)
        ob = env.observe(state)
        assert ob.shape == (2, 32, 32, solver.num_var + OB_BASE_DIM)
        action = {"sigma_d": jnp.full((2, 2), 0.05),
                  "mu": jnp.full((2, 2), 0.1),
                  "idx_stop": jnp.zeros((2,), jnp.int32)}
        state, reward, done, all_done = jax.jit(env.step)(state, action)
        assert reward.shape == (2,) and not bool(all_done)

    def test_cli_train_end_to_end(self, tmp_path):
        from tfpnp_tpu.cli import main
        main(["--task", "sr", "--solver", "admm", "--denoiser", "tv",
              "--scale", "2", "--exp", "t", "--log_root", str(tmp_path),
              "--env_batch", "2", "--rmsize", "4", "--warmup", "1",
              "--train_steps", "6", "--max_episode_step", "2",
              "--action_pack", "1", "--episode_train_times", "1",
              "--validate_interval", "1000000", "--save_freq", "1000000",
              "--image_size", "32", "--mesh_dp", "1"])
        assert (tmp_path / "t" / "ckpt" / "final.pkl").exists()
