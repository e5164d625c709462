"""Shipped artifacts: trained denoiser prior + per-task RL policies.

The reference distributes its checkpoints as external downloads wired to
hardcoded paths (README.md:36, tasks/*/main.py -r flags). Here they are
package data with a tiny registry, so ``--eval`` works out of the box:

    python -m tfpnp_tpu --task csmri --solver admm --eval

Actor pickles hold {"actor_params", "actor_stats", "step"} (the actor
subset of the trainer's full-state checkpoint, rl/trainer.py:save).
Files are named ``{solver_name}_{pack}x{steps}_actor.pkl`` and the
registry is keyed by the full solver name (``sr4_admm`` is distinct
from ``sr_admm``); ship with scripts/ship_policy.py.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).resolve().parent

__all__ = ["policy_path", "load_policy", "available_policies"]


def available_policies() -> list[str]:
    return sorted(p.name for p in _DIR.glob("*_actor.pkl"))


def policy_path(name: str, solver: Optional[str] = None) -> Optional[Path]:
    """Locate a shipped actor checkpoint, or None.

    ``name`` is the registry solver name (``csmri_admm``, ``sr4_admm``);
    files follow ``{solver_name}_{pack}x{steps}_actor.pkl``. The registry
    is keyed by the full solver name so scale-suffixed SR families
    (``sr4_admm``) never alias the x2 policy. The legacy two-argument form
    ``policy_path(task, solver)`` still works.
    """
    if solver is not None:
        name = f"{name}_{solver}"
    hits = sorted(_DIR.glob(f"{name}_[0-9]*_actor.pkl"))
    return hits[0] if hits else None


def load_policy(name: str, solver: Optional[str] = None) -> dict:
    """Load shipped actor variables {'params', 'batch_stats'} by registry
    solver name (or the legacy ``(task, solver)`` pair)."""
    path = policy_path(name, solver)
    if path is None:
        key = name if solver is None else f"{name}_{solver}"
        raise FileNotFoundError(
            f"no shipped policy for {key!r}; "
            f"available: {available_policies()} — train one with "
            "python -m tfpnp_tpu or pass --resume CKPT")
    with open(path, "rb") as f:
        state = pickle.load(f)
    return {"params": state["actor_params"], "batch_stats": state["actor_stats"]}
