"""Tunneled-TPU backend constraints, enforced as CPU-side trace checks.

The axon backend cannot execute *eager* complex64 ops or constant-fold a
complex64 device array into a compiled program (both need a complex d2h
read — UNIMPLEMENTED there; see CLAUDE.md). Complex values inside jitted
programs, including program inputs/outputs, are fine. These tests trace
every task's data-synthesis program on CPU and assert no complex-typed
closure constants were captured — the exact failure mode that crashed PR
training at startup (tasks/pr.py now carries float32 phases instead).
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpnp_tpu.pnp.tv import TVDenoiser
from tfpnp_tpu.utils.options import Options

TASKS = {
    "csmri": ["--solver", "admm"],
    "pr": ["--solver", "iadmm"],
    "ct": ["--solver", "iadmm"],
    "spi": ["--solver", "admm", "--max_episode_step", "4", "--action_pack", "1"],
}


def _complex_consts(closed_jaxpr):
    """All complex-dtype constants captured by a traced program."""
    return [c for c in closed_jaxpr.consts
            if hasattr(c, "dtype") and np.issubdtype(c.dtype, np.complexfloating)]


@pytest.mark.parametrize("task_name", sorted(TASKS))
def test_sample_data_has_no_complex_closure_constants(task_name, tmp_path):
    opt = Options().parse(
        ["--task", task_name, "--env_batch", "4", "--image_size", "32",
         "--exp", f"tmp_tracecheck_{task_name}", "--log_root", str(tmp_path)]
        + TASKS[task_name])
    task = importlib.import_module(f"tfpnp_tpu.tasks.{task_name}")
    env, sample_data, eval_sets, solver_name, _ = task.build(opt, TVDenoiser())

    jaxpr = jax.make_jaxpr(sample_data)(jax.random.PRNGKey(0))
    bad = _complex_consts(jaxpr)
    assert not bad, (
        f"{task_name}.sample_data captured complex closure constants "
        f"{[(c.shape, c.dtype) for c in bad]}; the tunneled TPU backend "
        "cannot constant-fold complex64 (needs a d2h read)")

    # episode rollout over this data must also be complex-constant free
    def episode(key):
        data = sample_data(key)
        state = env.reset(data)
        obs = env.observe(state)
        return obs

    jaxpr2 = jax.make_jaxpr(episode)(jax.random.PRNGKey(1))
    bad2 = _complex_consts(jaxpr2)
    assert not bad2, f"{task_name} episode captured complex constants"


@pytest.mark.parametrize("task_name", sorted(TASKS))
def test_eval_sets_are_device_values_not_eager_complex(task_name, tmp_path):
    """Eval sets may *contain* complex arrays (jit outputs are fine on the
    TPU backend) but building them must not run eager complex host math
    through jnp — spot-check they are jax Arrays produced under jit."""
    opt = Options().parse(
        ["--task", task_name, "--env_batch", "4", "--image_size", "32",
         "--exp", f"tmp_evalcheck_{task_name}", "--log_root", str(tmp_path)]
        + TASKS[task_name])
    task = importlib.import_module(f"tfpnp_tpu.tasks.{task_name}")
    _, _, eval_sets, _, _ = task.build(opt, TVDenoiser())
    assert eval_sets
    for name, data in eval_sets.items():
        for k, v in data.items():
            assert isinstance(v, jax.Array), (task_name, name, k, type(v))


def test_eval_artifacts_never_transfer_complex(monkeypatch, tmp_path):
    """Simulate the axon backend: any device->host read of a complex array
    raises. A full CS-MRI eval (complex x0/y0/solver state) must still
    produce its artifacts — regression for the init.png crash."""
    import tfpnp_tpu.eval.evaluator as ev_mod
    from tfpnp_tpu.eval.evaluator import Evaluator
    from tfpnp_tpu.models.actor import actor_spec_for

    real_get = jax.device_get

    def guarded(x):
        for leaf in jax.tree.leaves(x):
            if hasattr(leaf, "dtype") and np.issubdtype(leaf.dtype,
                                                        np.complexfloating):
                raise RuntimeError("complex d2h transfer (axon-unsupported)")
        return real_get(x)

    monkeypatch.setattr(jax, "device_get", guarded)

    opt = Options().parse(["--task", "csmri", "--solver", "admm",
                           "--env_batch", "2", "--image_size", "32",
                           "--exp", "tmp_d2h", "--log_root", str(tmp_path)])
    task = importlib.import_module("tfpnp_tpu.tasks.csmri")
    env, _, eval_sets, solver_name, _ = task.build(opt, TVDenoiser(n_iter=2))
    name = next(iter(eval_sets))
    ranges, actor = actor_spec_for(solver_name, opt.action_pack)
    data = eval_sets[name]
    obs0 = jax.jit(lambda d: env.observe(env.reset(d)))(data)
    variables = actor.init(jax.random.PRNGKey(0), obs0[:1],
                           use_running_average=False)
    evaluator = Evaluator(env, actor, ranges, {name: data},
                          save_dir=str(tmp_path / "arts"))
    evaluator.eval(variables, step=0)
    assert list((tmp_path / "arts").rglob("init.png")), "init artifacts missing"
