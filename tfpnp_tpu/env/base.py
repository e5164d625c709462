"""Batched PnP episode environment as pure functions over static shapes.

Re-design of /root/reference/tfpnp/env/base.py. The reference keeps a
mutable ``state`` dict and a shrinking ``idx_left`` index set, gathering the
surviving rows before each solver call and scattering results back
(env/base.py:152-191) — a dynamic-shape pattern XLA cannot compile. Here an
episode state is a fixed-shape pytree carrying a boolean ``alive`` mask:

  - ``step`` applies the solver bundle to the *whole* batch and merges the
    update with ``jnp.where(alive, new, old)`` — identical math to the
    reference's gather/scatter (dead rows are frozen, so their delta-PSNR
    reward is exactly 0), but one static XLA computation.
  - reward is delta-PSNR over the full batch (env/base.py:230-234).
  - an item that emits ``idx_stop=1`` still executes the current bundle and
    earns its reward — the reference shrinks ``idx_left`` *after* applying
    the solver (env/base.py:180-182).
  - the differentiable one-step model (``forward``, env/base.py:193-206)
    is the same ``run_bundle`` call without masking; ``jax.grad`` flows
    through the solver and the frozen denoiser for the MDDPG update.

Episode state layout (dict pytree):
  ``data``   task measurement fields (gt, y0, mask, ...), static per episode
  ``solver`` solver variable dict
  ``alive``  [B] bool
  ``T``      [B] float, current step fraction (the reference's T plane,
             env/base.py:147-149, stored as a scalar per sample and
             broadcast to a channel only at observation packing)
  ``last_psnr`` [B]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

from ..ops.fft import complex2real
from ..ops.metrics import psnr
from ..pnp.solvers.base import Solver, run_bundle

__all__ = ["PnPEnv", "EnvState"]

EnvState = Dict[str, Any]


# Observation safety band. Healthy solver variables live in roughly
# [-1.5, 1.5] (images are [0,1]; duals/overshoots small), so this clip is
# a no-op on the stable path. When a sampled hyperparameter bundle makes
# an iteration diverge (e.g. iADMM with tau*(1+mu) > 2), it bounds what
# the actor/critic ever see — one diverged rollout state in the replay
# ring must not blow up the value function. The replayed *solver state*
# stays raw, so the differentiable re-simulation is untouched.
OBS_CLIP = 5.0


def _var_channels(solver: Solver, solver_state) -> jnp.ndarray:
    """Stack the real parts of solver variables as NHWC channels, in
    ``var_names`` order (the reference's channel-concatenated state viewed
    through ``complex2real``, e.g. tasks/csmri/env.py:16), clipped to the
    observation safety band."""
    chans = [complex2real(solver_state[k]) for k in solver.var_names]
    v = jnp.stack(chans, axis=-1)
    return jnp.clip(jnp.nan_to_num(v, nan=0.0, posinf=OBS_CLIP,
                                   neginf=-OBS_CLIP), -OBS_CLIP, OBS_CLIP)


@dataclass(frozen=True)
class PnPEnv:
    """Task-agnostic episode engine.

    Args:
      solver:   a ``Solver``.
      pack_obs: task observation packer
                ``(data, var_channels [B,H,W,V], T_map [B,H,W,1]) -> [B,H,W,C]``
                (the per-task ``get_policy_ob`` layouts, tasks/*/env.py).
      max_episode_step: episode length cap (options.py:21, default 6).
      loop_penalty:     per-step reward penalty applied by the trainer
                        (options.py:31, default 0.05).
    """

    solver: Solver
    pack_obs: Callable[..., jnp.ndarray]
    max_episode_step: int

    # ---- episode API ------------------------------------------------------

    def reset(self, data: Mapping[str, jnp.ndarray]) -> EnvState:
        """Build the initial episode state from a data batch
        (reference env/base.py:121-155)."""
        solver_state = self.solver.init(data)
        b = data["gt"].shape[0]
        output = self.solver.get_output(solver_state)
        return {
            "data": dict(data),
            "solver": solver_state,
            "alive": jnp.ones((b,), bool),
            "T": jnp.zeros((b,), jnp.float32),
            "last_psnr": psnr(output, data["gt"]),
        }

    def observe(self, state: EnvState) -> jnp.ndarray:
        """Policy/critic observation [B, H, W, C] for the *current* state."""
        data = state["data"]
        b, h, w = data["gt"].shape
        t_map = jnp.broadcast_to(state["T"].reshape(b, 1, 1, 1), (b, h, w, 1))
        return self.pack_obs(data, _var_channels(self.solver, state["solver"]), t_map)

    def step(self, state: EnvState, action: Mapping[str, jnp.ndarray],
             key: jax.Array | None = None) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One environment transition (reference env/base.py:157-191).

        ``action``: continuous hyperparameters ``[B, pack]`` plus
        ``idx_stop`` ``[B]`` in {0, 1}.

        Returns ``(next_state, reward [B], done [B], all_done scalar)``.
        ``done`` marks items that terminated at this step.
        """
        aux = self.solver.filter_aux(state["data"])
        hyper = self.solver.filter_hyperparameter(action)
        new_solver = run_bundle(self.solver, state["solver"], aux, hyper, key)

        alive = state["alive"]
        mask = lambda new, old: jnp.where(
            alive.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)
        solver_state = jax.tree.map(mask, new_solver, state["solver"])

        output = self.solver.get_output(solver_state)
        cur_psnr = psnr(output, state["data"]["gt"])
        reward = cur_psnr - state["last_psnr"]

        t_next = state["T"] + 1.0 / self.max_episode_step
        at_cap = t_next >= 1.0 - 1e-6
        stop = (action["idx_stop"].astype(bool) | at_cap) & alive
        alive_next = alive & ~stop

        next_state = {
            "data": state["data"],
            "solver": solver_state,
            "alive": alive_next,
            "T": t_next,
            "last_psnr": cur_psnr,
        }
        done = stop
        all_done = ~jnp.any(alive_next)
        return next_state, reward, done, all_done

    # ---- differentiable one-step world model ------------------------------

    def forward(self, data: Mapping[str, jnp.ndarray], solver_state,
                action: Mapping[str, jnp.ndarray],
                key: jax.Array | None = None):
        """Differentiable re-simulation of one step from a replayed
        observation (reference env/base.py:193-206): returns
        ``(next_solver_state, reward [B])`` with gradients w.r.t. the
        continuous actions flowing through the solver and denoiser."""
        aux = self.solver.filter_aux(data)
        hyper = self.solver.filter_hyperparameter(action)
        out_before = self.solver.get_output(solver_state)
        new_state = run_bundle(self.solver, solver_state, aux, hyper, key)
        out_after = self.solver.get_output(new_state)
        gt = data["gt"]
        reward = psnr(out_after, gt) - psnr(out_before, gt)
        return new_state, reward

    def observe_from(self, data: Mapping[str, jnp.ndarray], solver_state,
                     T: jnp.ndarray) -> jnp.ndarray:
        """Observation for an arbitrary (data, solver_state, T) triple —
        used by the trainer on replayed samples and for the next-state
        critic input (reference ``_build_next_ob``, tasks/*/env.py)."""
        b, h, w = data["gt"].shape
        t_map = jnp.broadcast_to(T.reshape(b, 1, 1, 1), (b, h, w, 1))
        return self.pack_obs(data, _var_channels(self.solver, solver_state), t_map)
