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
