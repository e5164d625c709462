"""Environment + policy/critic tests: masking semantics, observation
layouts, reward accounting, policy sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpnp_tpu import ops
from tfpnp_tpu.env.base import PnPEnv
from tfpnp_tpu.models.actor import ACTION_RANGES, actor_spec_for, policy_apply
from tfpnp_tpu.models.critic import ResNetCritic
from tfpnp_tpu.pnp import get_solver
from tfpnp_tpu.pnp.tv import TVDenoiser
from tfpnp_tpu.tasks import csmri, spi
from tfpnp_tpu.data.synthetic import random_images

KEY = jax.random.PRNGKey(0)
N = 32
B = 3
PACK = 2
MAX_STEP = 3


@pytest.fixture(scope="module")
def env_and_data():
    gt = random_images(KEY, B, N)
    masks = jnp.asarray(np.stack([csmri.radial_mask(N, a) for a in (2, 4)]))
    data = csmri.make_data(jax.random.PRNGKey(1), gt, masks)
    solver = get_solver("csmri_admm", TVDenoiser())
    env = PnPEnv(solver, csmri.pack_obs, max_episode_step=MAX_STEP)
    return env, data


def full_action(b=B, stop=None):
    a = {"sigma_d": jnp.full((b, PACK), 0.06), "mu": jnp.full((b, PACK), 1.0)}
    a["idx_stop"] = jnp.zeros((b,), jnp.int32) if stop is None else jnp.asarray(stop)
    return a


class TestEnv:
    def test_reset_and_observe_shapes(self, env_and_data):
        env, data = env_and_data
        state = env.reset(data)
        obs = env.observe(state)
        # ob_base_dim 6 + num_var 3 = 9 channels (reference env.py:10 + actor in_dim)
        assert obs.shape == (B, N, N, csmri.OB_BASE_DIM + env.solver.num_var)
        assert bool(jnp.all(state["alive"]))

    def test_step_reward_is_delta_psnr(self, env_and_data):
        env, data = env_and_data
        state = env.reset(data)
        p0 = state["last_psnr"]
        state2, reward, done, all_done = env.step(state, full_action())
        p1 = ops.psnr(env.solver.get_output(state2["solver"]), data["gt"])
        np.testing.assert_allclose(np.asarray(reward), np.asarray(p1 - p0), atol=1e-5)
        assert not bool(all_done)

    def test_stopped_items_frozen_and_zero_reward(self, env_and_data):
        env, data = env_and_data
        state = env.reset(data)
        # item 0 stops at step 1 (it still executes step 1, reference
        # env/base.py:180-182 shrinks idx_left after the solver call)
        state, r1, done, _ = env.step(state, full_action(stop=[1, 0, 0]))
        assert bool(done[0]) and not bool(done[1])
        out_after_1 = np.asarray(env.solver.get_output(state["solver"]))
        state, r2, done2, _ = env.step(state, full_action())
        out_after_2 = np.asarray(env.solver.get_output(state["solver"]))
        # item 0 unchanged at step 2 => zero reward
        np.testing.assert_allclose(out_after_2[0], out_after_1[0])
        assert abs(float(r2[0])) < 1e-5
        assert abs(float(r2[1])) > 1e-5

    def test_episode_cap_terminates_all(self, env_and_data):
        env, data = env_and_data
        state = env.reset(data)
        for t in range(MAX_STEP):
            state, _, done, all_done = env.step(state, full_action())
        assert bool(all_done)
        assert np.all(np.asarray(done))  # forced done at cap (env/base.py:185-187)

    def test_T_channel_advances(self, env_and_data):
        env, data = env_and_data
        state = env.reset(data)
        obs0 = env.observe(state)
        t_ch = csmri.OB_BASE_DIM + env.solver.num_var - 2  # T is second-to-last
        assert float(obs0[..., t_ch].max()) == 0.0
        state, *_ = env.step(state, full_action())
        obs1 = env.observe(state)
        np.testing.assert_allclose(np.asarray(obs1[..., t_ch]), 1.0 / MAX_STEP, atol=1e-6)

    def test_forward_matches_step_math(self, env_and_data):
        env, data = env_and_data
        state = env.reset(data)
        action = full_action()
        new_state, reward = env.forward(data, state["solver"], action)
        stepped, reward2, *_ = env.step(state, action)
        for k in new_state:
            np.testing.assert_allclose(np.asarray(new_state[k]),
                                       np.asarray(stepped["solver"][k]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(reward), np.asarray(reward2), atol=1e-5)

    def test_forward_differentiable(self, env_and_data):
        env, data = env_and_data
        state = env.reset(data)

        def f(sig):
            a = full_action()
            a["sigma_d"] = sig
            _, reward = env.forward(data, state["solver"], a)
            return jnp.mean(reward)

        g = jax.grad(f)(jnp.full((B, PACK), 0.06))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


class TestObsLayouts:
    def test_all_tasks_base_dims(self):
        from tfpnp_tpu.tasks import pr, ct
        gt = random_images(KEY, 2, N)
        # csmri
        masks = jnp.asarray(np.stack([csmri.radial_mask(N, 4)]))
        d = csmri.make_data(KEY, gt, masks)
        vc = jnp.zeros((2, N, N, 3))
        t = jnp.zeros((2, N, N, 1))
        assert csmri.pack_obs(d, vc, t).shape[-1] == csmri.OB_BASE_DIM + 3
        # pr
        mask = jnp.asarray(pr.cdp_mask(N))
        d = pr.make_data(KEY, gt, mask)
        assert pr.pack_obs(d, vc, t).shape[-1] == pr.OB_BASE_DIM + 3
        # ct
        radon = ops.RadonGenerator()(N, 10)
        d = ct.make_data(KEY, gt, radon)
        assert ct.pack_obs(d, vc, t).shape[-1] == ct.OB_BASE_DIM + 3
        # spi
        d = spi.make_data(KEY, gt, K=4)
        assert spi.pack_obs(d, vc, t).shape[-1] == spi.OB_BASE_DIM + 3


class TestPolicy:
    def test_sample_vs_greedy(self):
        ranges, actor = actor_spec_for("csmri_admm", PACK)
        obs = jax.random.normal(KEY, (4, N, N, 9))
        vs = actor.init(jax.random.PRNGKey(1), obs)
        a_greedy, lp, ent, _ = policy_apply(actor, vs, obs, ranges,
                                            stochastic=False)
        probs, _ = actor.apply(vs, obs)
        np.testing.assert_array_equal(np.asarray(a_greedy["idx_stop"]),
                                      np.argmax(np.asarray(probs), -1))
        # stochastic needs a key and respects ranges
        a_s, lp_s, ent_s, _ = policy_apply(actor, vs, obs, ranges,
                                           jax.random.PRNGKey(2), stochastic=True)
        assert float(a_s["mu"].max()) <= 1.0 and float(a_s["mu"].min()) >= 0.0
        assert np.all(np.asarray(lp_s) <= 0)
        assert np.all(np.asarray(ent_s) >= 0)

    def test_batch_stats_mutation(self):
        ranges, actor = actor_spec_for("csmri_admm", PACK)
        obs = jax.random.normal(KEEP := KEY, (4, N, N, 9))
        vs = actor.init(jax.random.PRNGKey(1), obs, use_running_average=False)
        _, _, _, new_stats = policy_apply(actor, vs, obs, ranges,
                                          jax.random.PRNGKey(2), stochastic=True,
                                          use_running_average=False, mutable=True)
        before = jax.tree.leaves(vs["batch_stats"])
        after = jax.tree.leaves(new_stats)
        assert any(not np.allclose(b, a) for b, a in zip(before, after))

    def test_spi_deep_head_and_ranges(self):
        ranges, actor = actor_spec_for("spi_admm", 1)
        obs = jax.random.normal(KEY, (2, N, N, 6))
        vs = actor.init(jax.random.PRNGKey(1), obs)
        a, *_ = policy_apply(actor, vs, obs, ranges, stochastic=False)
        # sigma_d in [15, 70]/255, mu in [50, 120] (network.py:274-278)
        assert float(a["sigma_d"].min()) >= 15 / 255 - 1e-6
        assert float(a["sigma_d"].max()) <= 70 / 255 + 1e-6
        assert float(a["mu"].min()) >= 50 - 1e-4
        assert float(a["mu"].max()) <= 120 + 1e-4

    def test_critic_scalar(self):
        critic = ResNetCritic()
        obs = jax.random.normal(KEY, (4, N, N, 9))
        cv = critic.init(jax.random.PRNGKey(3), obs)
        v = critic.apply(cv, obs)
        assert v.shape == (4, 1)
        g = jax.grad(lambda p: jnp.mean(critic.apply({"params": p["params"]}, obs)))(cv)
        assert np.all(np.isfinite(np.asarray(jax.tree.leaves(g)[0])))
