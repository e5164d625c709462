"""Policy network: ResNet-18 encoder + stop/continuous heads.

Re-design of /root/reference/tfpnp/policy/network.py:119-279. The module is
pure: it outputs stop probabilities and the sigmoid head; sampling, log-prob
and entropy live in ``policy_apply`` so the PRNG key is explicit and the
whole policy step jits (the reference samples inside ``forward`` with
torch's global RNG, network.py:150-158).

Per-solver action ranges (scale/shift of the sigmoid outputs,
network.py:164-175 ``action_mapping`` + the 8 subclass range dicts at
network.py:182-279) are tabulated in ``ACTION_RANGES``.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNetEncoder

__all__ = ["ResNetActor", "policy_apply", "ACTION_RANGES", "actor_spec_for"]

# (scale, shift) per continuous action key, per solver family
# (reference network.py:182-279)
ACTION_RANGES: Dict[str, Dict[str, Tuple[float, float]]] = {
    "csmri_admm":    {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.0)},
    "csmri_hqs":     {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.0)},
    "csmri_pg":      {"sigma_d": (70 / 255, 0.0), "tau": (2.0, 0.0)},
    "csmri_apg":     {"sigma_d": (70 / 255, 0.0), "tau": (2.0, 0.0), "beta": (2.0, 0.0)},
    "csmri_redadmm": {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.0), "lamda": (2.0, 0.0)},
    "csmri_amp":     {"sigma_d": (2.0, 0.0)},
    "pr_iadmm":      {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.0), "tau": (2.0, 0.0)},
    "pr_pg":         {"sigma_d": (70 / 255, 0.0), "tau": (2.0, 0.0)},
    "ct_iadmm":      {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.0), "tau": (2.0, 0.0)},
    "ct_pg":         {"sigma_d": (70 / 255, 0.0), "tau": (2.0, 0.0)},
    # deblurring (beyond-reference task family, tasks/deblur.py).
    # mu gets a small positive floor: the Wiener denominator is
    # |K|^2 + mu and Gaussian OTFs reach |K| ~ 1e-8, so mu -> 0 blows up
    # the MDDPG gradient through the solver (observed NaN at episode 23).
    "deblur_admm":   {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.005)},
    "deblur_hqs":    {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.005)},
    "deblur_pg":     {"sigma_d": (70 / 255, 0.0), "tau": (2.0, 0.0)},
    # super-resolution (beyond-reference task family, tasks/sr.py);
    # x2 plain names, x3/x4 suffixed — same ranges at every scale.
    # The sr prox has an explicit 1/mu, hence the larger floor.
    **{f"sr{s}_{alg}": r for s in ("", "3", "4") for alg, r in {
        "admm": {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.01)},
        "hqs":  {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.01)},
        "pg":   {"sigma_d": (70 / 255, 0.0), "tau": (2.0, 0.0)},
    }.items()},
    # inpainting (beyond-reference, tasks/inpaint.py). The diagonal prox
    # (M y + mu v)/(M + mu) needs mu > 0 only to avoid 0/0 at observed
    # pixels when the policy saturates low — same floor as deblur.
    "inpaint_admm":  {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.005)},
    "inpaint_hqs":   {"sigma_d": (70 / 255, 0.0), "mu": (1.0, 0.005)},
    "inpaint_pg":    {"sigma_d": (70 / 255, 0.0), "tau": (2.0, 0.0)},
    # SPI uses a deeper head and shifted ranges (network.py:263-279)
    "spi_admm":      {"sigma_d": (55 / 255, 15 / 255), "mu": (70.0, 50.0)},
}

DEEP_HEAD_SOLVERS = {"spi_admm"}


def actor_spec_for(solver_name: str, action_bundle: int):
    """Action-range table and head shape for a solver, mirroring the
    per-solver actor subclasses + factory map (policy/__init__.py:4-13)."""
    ranges = ACTION_RANGES[solver_name]
    return ranges, ResNetActor(
        action_bundle=action_bundle,
        action_keys=tuple(ranges.keys()),
        deep_head=solver_name in DEEP_HEAD_SOLVERS,
    )


class ResNetActor(nn.Module):
    """Encoder -> global average pool -> softmax(2) stop head +
    sigmoid continuous head (reference network.py:119-162)."""

    action_bundle: int
    action_keys: Tuple[str, ...]
    depth: int = 18
    deep_head: bool = False

    @nn.compact
    def __call__(self, obs: jnp.ndarray, use_running_average: bool = True):
        x = ResNetEncoder(self.depth)(obs, use_running_average)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool (network.py:141)
        probs = nn.softmax(nn.Dense(2)(x), axis=-1)
        if self.deep_head:
            h = nn.relu(nn.Dense(64)(x))
            raw = nn.sigmoid(nn.Dense(self.action_bundle * len(self.action_keys))(h))
        else:
            raw = nn.sigmoid(nn.Dense(self.action_bundle * len(self.action_keys))(x))
        return probs, raw


def policy_apply(actor: ResNetActor, variables, obs: jnp.ndarray,
                 action_ranges: Mapping[str, Tuple[float, float]],
                 key: jax.Array | None = None, *, stochastic: bool,
                 use_running_average: bool = True, mutable: bool = False):
    """Run the policy and assemble the action dict.

    Mirrors ResNetActorBase.forward (network.py:138-162): Categorical sample
    of ``idx_stop`` when ``stochastic`` (training) vs argmax (eval);
    returns (action, log_prob [B], entropy [B], new_batch_stats|None).
    Continuous actions are reshaped to ``[B, bundle]`` per key and rescaled
    by (scale, shift) as in ``action_mapping`` (network.py:164-175).
    """
    if mutable:
        (probs, raw), mut = actor.apply(variables, obs,
                                        use_running_average=use_running_average,
                                        mutable=["batch_stats"])
        new_stats = mut["batch_stats"]
    else:
        probs, raw = actor.apply(variables, obs,
                                 use_running_average=use_running_average)
        new_stats = None

    b = obs.shape[0]
    logp_all = jnp.log(jnp.clip(probs, 1e-12, 1.0))
    entropy = -jnp.sum(probs * logp_all, axis=-1)
    if stochastic:
        idx_stop = jax.random.categorical(key, logp_all, axis=-1)
    else:
        idx_stop = jnp.argmax(probs, axis=-1)
    log_prob = jnp.take_along_axis(logp_all, idx_stop[:, None], axis=-1)[:, 0]

    n_keys = len(actor.action_keys)
    raw = raw.reshape(b, n_keys, actor.action_bundle)
    action = {}
    for i, k in enumerate(actor.action_keys):
        scale, shift = action_ranges[k]
        action[k] = raw[:, i] * scale + shift
    action["idx_stop"] = idx_stop
    # differentiable stop probability: the trainer's exact two-action
    # policy gradient (rl/trainer.py stop_grad_mode="exact") needs
    # d p_stop / d theta, not just the sampled index; solvers ignore it
    # (filter_hyperparameter picks registered keys only)
    action["p_stop"] = probs[:, 1]
    return action, log_prob, entropy, new_stats
