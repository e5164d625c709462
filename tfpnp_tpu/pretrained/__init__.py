"""Shipped artifacts: trained denoiser prior + per-task RL policies.

The reference distributes its checkpoints as external downloads wired to
hardcoded paths (README.md:36, tasks/*/main.py -r flags). Here they are
package data with a tiny registry, so ``--eval`` works out of the box:

    python -m tfpnp_tpu --task csmri --solver admm --eval

Actor pickles hold {"actor_params", "actor_stats", "step"} (the actor
subset of the trainer's full-state checkpoint, rl/trainer.py:save).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).resolve().parent

__all__ = ["policy_path", "load_policy", "available_policies"]


def available_policies() -> list[str]:
    return sorted(p.name for p in _DIR.glob("*_actor.pkl"))


def policy_path(task: str, solver: str) -> Optional[Path]:
    """Locate a shipped actor checkpoint for (task, solver), or None.

    Files follow ``{task}_{solver}_{pack}x{steps}_actor.pkl``.
    """
    hits = sorted(_DIR.glob(f"{task}_{solver}_*_actor.pkl"))
    return hits[0] if hits else None


def load_policy(task: str, solver: str) -> dict:
    """Load shipped actor variables {'params', 'batch_stats'} for a task."""
    path = policy_path(task, solver)
    if path is None:
        raise FileNotFoundError(
            f"no shipped policy for task={task!r} solver={solver!r}; "
            f"available: {available_policies()} — train one with "
            "python -m tfpnp_tpu or pass --resume CKPT")
    with open(path, "rb") as f:
        state = pickle.load(f)
    return {"params": state["actor_params"], "batch_stats": state["actor_stats"]}
