"""One-call restoration API.

The reference has no library-level entry point — users must wire solver,
denoiser, env, and policy by hand per task (tasks/*/main.py). These two
functions cover the common cases:

  ``restore``        classic log-spaced hyperparameter schedule
                     (utils_pnp.py:21-42 in the reference), no policy.
  ``restore_policy`` per-image, per-iteration hyperparameters from a
                     trained RL actor (shipped checkpoint by default),
                     with learned early stopping.

Both run the whole restoration as one jitted program; call them inside
or outside jit. ``data`` is the task data dict (gt optional — only used
for the returned PSNR when present):

    from tfpnp_tpu.api import restore, restore_policy
    out = restore("csmri_admm", data)                       # TV/UNet prior
    out = restore_policy("csmri", "admm", data)             # RL-tuned
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.schedules import get_rho_sigma
from .pnp import get_solver, run_bundle
from .pnp.denoiser import load_denoiser

__all__ = ["restore", "restore_policy", "restore_rgb", "restore_policy_rgb"]


def _default_denoiser(denoiser):
    if denoiser is None:
        return load_denoiser()
    return denoiser


def restore(solver_name: str, data: Mapping[str, Any], *,
            denoiser=None, iters: int = 30, sigma_n: float = 10 / 255,
            model_sigma1: float = 35.0, model_sigma2: float = 5.0,
            **solver_kwargs) -> jnp.ndarray:
    """Run ``iters`` PnP iterations with the classic log-spaced schedule.

    Every continuous hyperparameter the solver consumes is filled from
    the (rho, sigma) schedule: ``sigma_d`` from the denoiser-strength
    decay, ``mu`` from rho, and any step-size-like key (tau/beta/lamda)
    held at a stable default — matching the reference's hand-tuned
    no-RL evaluation protocol.
    """
    denoiser = _default_denoiser(denoiser)
    if solver_name.startswith("ct_") and "radon" not in solver_kwargs:
        solver = _ct_solver(solver_name, denoiser, data)
    else:
        solver = get_solver(solver_name, denoiser, **solver_kwargs)
    b = data["gt"].shape[0] if "gt" in data else data["x0"].shape[0]
    rhos, sigmas = get_rho_sigma(sigma=max(sigma_n, 1e-3), iter_num=iters,
                                 model_sigma1=model_sigma1,
                                 model_sigma2=model_sigma2)
    rhos = np.broadcast_to(np.asarray(rhos, np.float32), (b, iters))
    sigmas = np.broadcast_to(np.asarray(sigmas, np.float32), (b, iters))
    defaults = {"sigma_d": sigmas, "mu": rhos,
                "tau": np.full((b, iters), 0.9, np.float32),
                "beta": np.full((b, iters), 0.1, np.float32),
                "lamda": np.full((b, iters), 0.5, np.float32)}
    hyper = {k: jnp.asarray(defaults[k]) for k in solver.action_keys}

    @jax.jit
    def run(d):
        state = run_bundle(solver, solver.init(d), solver.filter_aux(d), hyper)
        return solver.get_output(state)

    return run(dict(data))


def restore_policy(task: str, solver: str, data: Mapping[str, Any], *,
                   variables: Optional[dict] = None, denoiser=None,
                   max_episode_step: Optional[int] = None,
                   action_pack: Optional[int] = None,
                   scale: int = 2) -> jnp.ndarray:
    """Policy-driven restoration: the shipped (or given) actor chooses
    sigma_d/mu/tau per image per iteration and stops early, exactly as in
    evaluation (greedy argmax stop, Evaluator._episode_impl).
    ``scale`` selects the SR factor when ``task == 'sr'`` (policies are
    per-scale; the registry never silently substitutes another scale)."""
    import re

    from . import pretrained
    from .env.base import PnPEnv
    from .models.actor import actor_spec_for, policy_apply

    if task == "sr":
        from .tasks.sr import solver_name_for
        solver_name = solver_name_for(solver, scale)
    else:
        solver_name = f"{task}_{solver}"

    if variables is None:
        variables = jax.tree.map(jnp.asarray, pretrained.load_policy(solver_name))
        m = re.match(r".*_(\d+)x(\d+)_actor\.pkl",
                     pretrained.policy_path(solver_name).name)
        pack = action_pack or int(m.group(1))
        steps = max_episode_step or int(m.group(2))
    else:
        assert action_pack and max_episode_step, \
            "custom variables need action_pack and max_episode_step"
        pack, steps = action_pack, max_episode_step

    denoiser = _default_denoiser(denoiser)
    import importlib
    task_mod = importlib.import_module(f"tfpnp_tpu.tasks.{task}")
    if solver_name.startswith("ct_"):
        solver_obj = _ct_solver(solver_name, denoiser, data)
    else:
        solver_obj = get_solver(solver_name, denoiser)
    env = PnPEnv(solver_obj, task_mod.pack_obs, max_episode_step=steps)
    ranges, actor = actor_spec_for(solver_name, pack)

    @jax.jit
    def episode(variables, d):
        state = env.reset(d)

        def body(carry, _):
            st = carry
            obs = env.observe(st)
            action, _, _, _ = policy_apply(actor, variables, obs, ranges,
                                           stochastic=False,
                                           use_running_average=True)
            st, _, _, _ = env.step(st, action, jax.random.PRNGKey(0))
            return st, None

        state, _ = jax.lax.scan(body, state, None, length=steps)
        return env.solver.get_output(state["solver"])

    return episode(variables, dict(data))


def _fold_rgb(data: Mapping[str, Any]) -> dict:
    """Fold an RGB data dict into the grayscale batch layout.

    Leaves shaped ``[B, ..., 3]`` (gt/y0/x0 image fields) become
    ``[3B, ...]`` with channel-minor ordering (row ``b*3 + c``); shared
    measurement fields (OTFs, masks, sigma_n) are repeated per channel.
    The forward models of every task are channel-separable, so running
    the grayscale solver on the folded batch IS the RGB solve — each
    channel additionally gets its own policy hyperparameters, which a
    single-shot RGB head could not offer.
    """
    folded = {}
    for k, v in data.items():
        v = jnp.asarray(v)
        if v.ndim >= 3 and v.shape[-1] == 3:
            v = jnp.moveaxis(v, -1, 1).reshape((v.shape[0] * 3,) + v.shape[1:-1])
        elif v.ndim >= 1:
            v = jnp.repeat(v, 3, axis=0)
        folded[k] = v
    return folded


def _unfold_rgb(x: jnp.ndarray) -> jnp.ndarray:
    """[3B, H, W] -> [B, H, W, 3] (inverse of :func:`_fold_rgb`)."""
    return jnp.moveaxis(x.reshape((-1, 3) + x.shape[1:]), 1, -1)


def restore_rgb(solver_name: str, data: Mapping[str, Any],
                **kwargs) -> jnp.ndarray:
    """RGB restoration with the classic schedule (the reference's own open
    TODO, docs/todo.md:23 "RGB Deblur solver"). ``data`` carries
    ``[B, H, W, 3]`` image fields; measurement operators are shared
    across channels. Returns ``[B, H, W, 3]``."""
    return _unfold_rgb(restore(solver_name, _fold_rgb(data), **kwargs))


def restore_policy_rgb(task: str, solver: str, data: Mapping[str, Any],
                       **kwargs) -> jnp.ndarray:
    """RGB restoration driven by the shipped grayscale policy: channels
    fold into the batch, so the actor tunes each channel independently
    (and stops it independently)."""
    return _unfold_rgb(restore_policy(task, solver, _fold_rgb(data), **kwargs))


def _ct_solver(solver_name: str, denoiser, data):
    """CT solvers need the Radon operator matching the data geometry."""
    from .ops.radon import RadonGenerator
    views = int(data["y0"].shape[1])
    n = data["x0"].shape[-1]
    return get_solver(solver_name, denoiser, radon=RadonGenerator()(n, views))
