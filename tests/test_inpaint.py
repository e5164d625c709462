"""Inpainting task tests: diagonal-prox optimality, restoration quality,
env wiring, differentiability, CLI smoke.

Seventh task family (beyond-reference; SURVEY §2.2 lists four). Contract
locked the same way tests/test_deblur.py locks the deblur family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpnp_tpu.pnp import SOLVER_REGISTRY, get_solver, run_bundle
from tfpnp_tpu.tasks.inpaint import OB_BASE_DIM, make_data, pack_obs

KEY = jax.random.PRNGKey(0)


def identity_denoiser(x, sigma):
    return x


def make_phantom(b=2, n=32):
    yy, xx = np.mgrid[:n, :n]
    img = np.zeros((b, n, n), np.float32)
    for i in range(b):
        img[i] = 0.3 + 0.5 * (((yy - 12 - i) ** 2 + (xx - 16) ** 2) < 80)
    return jnp.asarray(img)


def make_inpaint_data(b=2, n=32, rate=0.4, sigma_n=0.0, key=KEY):
    gt = make_phantom(b, n)
    return jax.jit(lambda k, g: make_data(
        k, g, rates=(rate,), sigma_list=(sigma_n * 255.0,)))(key, gt)


class TestOperator:
    def test_registry(self):
        assert {"inpaint_admm", "inpaint_hqs", "inpaint_pg"} <= set(SOLVER_REGISTRY)
        assert get_solver("inpaint_admm", identity_denoiser).num_var == 3
        assert get_solver("inpaint_hqs", identity_denoiser).num_var == 2
        assert get_solver("inpaint_pg", identity_denoiser).num_var == 1

    def test_diag_prox_solves_normal_equations(self):
        # z* = argmin ||Mz-y||^2 + mu||z-v||^2 => (M + mu) z = M y + mu v
        from tfpnp_tpu.pnp.solvers.inpaint import _aux, _diag_prox
        data = make_inpaint_data(b=1, n=16)
        v = make_phantom(1, 16) * 0.7 + 0.1
        mu = jnp.asarray([0.3])
        z = jax.jit(lambda d, vv, m: _diag_prox(vv, _aux(d), m))(data, v, mu)
        m = data["mask"].astype(jnp.float32)
        r = (m + mu[:, None, None]) * z - (m * data["y0"] + mu[:, None, None] * v)
        assert float(jnp.max(jnp.abs(r))) < 1e-5
        # unobserved pixels pass v through exactly
        np.testing.assert_allclose(np.asarray(z)[~np.asarray(data["mask"])],
                                   np.asarray(v)[~np.asarray(data["mask"])],
                                   atol=1e-6)

    def test_mean_fill_init(self):
        data = make_inpaint_data(b=2, n=32, rate=0.3)
        x0 = np.asarray(data["x0"])
        mask = np.asarray(data["mask"])
        assert np.isfinite(x0).all()
        # dropped pixels hold the observed mean, not zero
        for i in range(2):
            assert abs(x0[i][~mask[i]].mean()
                       - np.asarray(data["y0"])[i][mask[i]].mean()) < 1e-3


class TestSolvers:
    @pytest.mark.parametrize("name",
                             ["inpaint_admm", "inpaint_hqs", "inpaint_pg"])
    def test_improves_psnr_with_tv(self, name):
        from tfpnp_tpu.ops.metrics import psnr
        from tfpnp_tpu.pnp.tv import TVDenoiser
        data = make_inpaint_data(b=2, n=32, rate=0.4, sigma_n=0.01)
        solver = get_solver(name, TVDenoiser(n_iter=10))
        iters = 30
        vals = {"sigma_d": 0.08, "mu": 0.05, "tau": 1.0}
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

    def test_differentiable_through_bundle(self):
        # identity prox makes ADMM stationary from the data-consistent
        # init (z = x0 is a fixed point for every mu), so differentiate
        # through a real prior where mu genuinely steers the iterate
        from tfpnp_tpu.pnp.tv import TVDenoiser
        solver = get_solver("inpaint_admm", TVDenoiser(n_iter=3))
        data = make_inpaint_data(b=1, n=16, sigma_n=0.02)

        @jax.jit
        @jax.grad
        def loss(mu):
            hyper = {"sigma_d": jnp.full((1, 3), 0.05),
                     "mu": jnp.broadcast_to(mu, (1, 3))}
            state = run_bundle(solver, solver.init(data),
                               solver.filter_aux(data), hyper)
            return jnp.mean((solver.get_output(state) - data["gt"]) ** 2)

        g = loss(jnp.asarray(0.1))
        assert np.isfinite(float(g)) and abs(float(g)) > 0


class TestEnvAndData:
    def test_env_episode_and_obs_layout(self):
        from tfpnp_tpu.env.base import PnPEnv
        solver = get_solver("inpaint_admm", identity_denoiser)
        env = PnPEnv(solver, pack_obs, max_episode_step=3)
        data = make_inpaint_data(b=2, n=32, sigma_n=0.01)
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
        for name in ("inpaint_admm", "inpaint_hqs", "inpaint_pg"):
            ranges, actor = actor_spec_for(name, 5)
            assert "sigma_d" in ranges

    def test_cli_train_end_to_end(self, tmp_path):
        from tfpnp_tpu.cli import main
        main(["--task", "inpaint", "--solver", "admm", "--denoiser", "tv",
              "--exp", "t", "--log_root", str(tmp_path),
              "--env_batch", "2", "--rmsize", "4", "--warmup", "1",
              "--train_steps", "6", "--max_episode_step", "2",
              "--action_pack", "1", "--episode_train_times", "1",
              "--validate_interval", "1000000", "--save_freq", "1000000",
              "--image_size", "32", "--mesh_dp", "1"])
        assert (tmp_path / "t" / "ckpt" / "final.pkl").exists()
