"""Evaluation: greedy policy rollouts with per-image metrics and artifacts.

Re-design of /root/reference/tfpnp/eval/evaluator.py. Differences by
design: evaluation is *batched* (the reference asserts batch_size == 1,
evaluator.py:29 — wasteful on accelerators); the whole greedy episode is
one jitted scan; metrics (psnr_init/psnr/iters/time) and artifacts
(restored PNGs, per-step action sequences + PSNR curves as JSON/plots)
match the reference's outputs (evaluator.py:41-68).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..env.base import PnPEnv
from ..models.actor import ResNetActor, policy_apply
from ..ops.metrics import psnr_255
from ..utils.log import COLOR, Logger

__all__ = ["Evaluator"]


class Evaluator:
    """Evaluate a policy over named measurement sets.

    Args:
      env:       ``PnPEnv`` (its solver defines the algorithm under test).
      actor:     actor module (same as training).
      action_ranges: per-key (scale, shift).
      eval_sets: name -> data dict (full batch; fixed across calls).
      save_dir:  artifact directory (None = metrics only).
    """

    def __init__(self, env: PnPEnv, actor: ResNetActor, action_ranges,
                 eval_sets: Dict[str, dict], save_dir: Optional[str] = None,
                 logger: Optional[Logger] = None):
        self.env = env
        self.actor = actor
        self.action_ranges = dict(action_ranges)
        self.eval_sets = eval_sets
        self.save_dir = Path(save_dir) if save_dir else None
        self.logger = logger or Logger(save_dir or "logs/eval")
        self._episode = jax.jit(self._episode_impl)

    def _episode_impl(self, actor_variables, data):
        env = self.env
        state0 = env.reset(data)
        psnr0 = state0["last_psnr"]

        def step_fn(state, _):
            obs = env.observe(state)
            action, _, _, _ = policy_apply(
                self.actor, actor_variables, obs, self.action_ranges,
                stochastic=False, use_running_average=True)
            alive_before = state["alive"]
            state, reward, done, _ = env.step(state, action, jax.random.PRNGKey(0))
            acts = {k: v for k, v in action.items() if k != "idx_stop"}
            return state, (alive_before, state["last_psnr"], acts)

        final, (alive, psnr_seq, actions) = jax.lax.scan(
            step_fn, state0, jnp.arange(env.max_episode_step))
        # everything returned to the host is float32 (see utils/codec.py)
        alive = alive.astype(jnp.float32)
        iters = jnp.sum(alive, axis=0)
        output = env.solver.get_output(final["solver"])
        return psnr0, final["last_psnr"], iters, psnr_seq, actions, output, alive

    def eval(self, actor_variables, step: int) -> float:
        total = 0.0
        for name, data in self.eval_sets.items():
            t0 = time.time()
            (psnr0, psnr_f, iters, psnr_seq, actions, output, alive) = \
                jax.device_get(self._episode(actor_variables, data))
            run_time = time.time() - t0
            b = psnr0.shape[0]
            # accumulated reward = total delta-PSNR (reference logs acc_reward)
            acc_reward = float(np.mean(psnr_f - psnr0))
            msg = (f"Step_{step:07d}: {name} | iters: {iters.mean():.2f} | "
                   f"psnr_init: {psnr0.mean():.2f} | psnr: {psnr_f.mean():.2f} | "
                   f"acc_reward: {acc_reward:.2f} | time: {run_time / b:.3f}s/img")
            self.logger.log(msg, color=COLOR.RED)
            total += float(psnr_f.mean())

            if self.save_dir is not None:
                self._save_artifacts(name, step, data, output, psnr_seq,
                                     actions, alive, psnr_f)
        return total / max(len(self.eval_sets), 1)

    def _save_artifacts(self, name, step, data, output, psnr_seq, actions,
                        alive, psnr_f):
        from ..utils.visualize import save_img, seq_plot
        base = self.save_dir / name / str(step)
        base.mkdir(parents=True, exist_ok=True)
        gt = np.asarray(jax.device_get(data["gt"]))
        b = gt.shape[0]
        for i in range(min(b, 8)):  # cap artifact count
            d = base / f"case{i}"
            d.mkdir(exist_ok=True)
            save_img(np.asarray(output[i]), d / f"output_{psnr_f[i]:.2f}.png")
            save_img(gt[i], d / "gt.png")
            params = {k: [float(x) for x in np.asarray(v)[:, i].reshape(-1)]
                      for k, v in actions.items()}
            params["psnr_seq"] = [float(x) for x in psnr_seq[:, i]]
            with open(d / "action_seqs.json", "w") as f:
                json.dump(params, f, indent=1)
            seq_plot(psnr_seq[:, i], "step", "psnr", d / "psnr.png")
