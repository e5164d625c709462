"""PnP solver contract: pure ``init`` / ``iterate`` functions + bundle scan.

Re-design of /root/reference/tfpnp/pnp/solver/base.py. The reference models
a solver as an ``nn.Module`` whose state is a channel-concatenated tensor
(x|z|u) and whose ``forward`` runs a Python loop over the action bundle.
Here a solver is a frozen dataclass of pure functions:

  - ``init(data) -> state``       state is a dict pytree of named variables
  - ``iterate(state, aux, hyper [, key]) -> state``   ONE inner iteration
  - ``get_output(state) -> [B, H, W]`` real image
  - ``filter_aux(data) -> aux``   static per-episode measurement terms
                                  (reference ``filter_aux_inputs``,
                                  solver/base.py:54-72)

``run_bundle`` scans ``iterate`` over the ``action_pack`` axis of the
hyperparameter bundle — the reference's Python loop
(e.g. tasks/csmri/solver.py:43-56) becomes a single ``lax.scan`` that XLA
compiles once regardless of bundle size. Because everything is pure,
``jax.grad`` through a bundle is exactly the reference's differentiable
``env.forward`` re-simulation (env/base.py:193-206) with no special casing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

__all__ = ["Solver", "run_bundle", "register_solver", "get_solver", "SOLVER_REGISTRY"]

State = Dict[str, jnp.ndarray]
Aux = Any
Hyper = Mapping[str, jnp.ndarray]


@dataclass(frozen=True)
class Solver:
    """A plug-and-play proximal solver for one task family.

    Attributes:
      name:        registry key, e.g. ``"csmri_admm"``.
      var_names:   ordered solver-state variables (defines ``num_var`` and
                   the observation channel order; reference
                   solver/base.py:49-52 ``num_var``).
      action_keys: continuous hyperparameters consumed per inner iteration
                   (reference ``filter_hyperparameter``,
                   solver/base.py:74-84).
      init:        data -> state.
      iterate:     (state, aux, hyper, key) -> state.
      get_output:  state -> real image [B, H, W].
      filter_aux:  data -> aux pytree.
      stochastic:  iterate consumes the PRNG key (AMP's divergence probe).
    """

    name: str
    var_names: Tuple[str, ...]
    action_keys: Tuple[str, ...]
    init: Callable[[Mapping[str, jnp.ndarray]], State]
    iterate: Callable[..., State]
    get_output: Callable[[State], jnp.ndarray]
    filter_aux: Callable[[Mapping[str, jnp.ndarray]], Aux]
    stochastic: bool = False

    @property
    def num_var(self) -> int:
        return len(self.var_names)

    def filter_hyperparameter(self, action: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Select this solver's continuous hyperparameters from an action
        dict (each entry ``[B, pack]``)."""
        return {k: action[k] for k in self.action_keys}


def run_bundle(solver: Solver, state: State, aux: Aux, hyper: Hyper,
               key: jax.Array | None = None) -> State:
    """Apply ``action_pack`` inner iterations via ``lax.scan``.

    ``hyper`` entries have shape ``[B, pack]``; the scan consumes them one
    column at a time, exactly like the reference loop over
    ``sigma_d[:, i]`` (tasks/csmri/solver.py:43-56).
    """
    pack = next(iter(hyper.values())).shape[-1]
    hyper_t = {k: jnp.moveaxis(v, -1, 0) for k, v in hyper.items()}  # [pack, B]
    if solver.stochastic:
        keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0), pack)

        def body(s, inp):
            h, k = inp
            return solver.iterate(s, aux, h, k), None

        state, _ = jax.lax.scan(body, state, (hyper_t, keys))
    else:
        def body(s, h):
            return solver.iterate(s, aux, h), None

        state, _ = jax.lax.scan(body, state, hyper_t)
    return state


# Solvers close over their denoiser (the reference passes it to the solver
# constructor, solver/base.py:5-8), so the registry stores *factories*
# ``factory(denoiser, **kwargs) -> Solver``.
SOLVER_REGISTRY: Dict[str, Callable[..., Solver]] = {}


def register_solver(name: str):
    def deco(factory: Callable[..., Solver]):
        SOLVER_REGISTRY[name] = factory
        return factory
    return deco


def get_solver(name: str, denoiser, **kwargs) -> Solver:
    """Build a solver by registry name, e.g. ``"csmri_admm"``.

    Mirrors the per-task ``create_solver_*`` factories
    (tasks/csmri/solver.py:253-270 etc.)."""
    if name not in SOLVER_REGISTRY:
        raise KeyError(f"unknown solver {name!r}; available: {sorted(SOLVER_REGISTRY)}")
    return SOLVER_REGISTRY[name](denoiser, **kwargs)
