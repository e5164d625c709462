"""Sparse-view CT PnP solvers: inexact ADMM and proximal gradient.

Re-design of /root/reference/tasks/ct/solver.py. The reference selects a
``torch_radon`` CUDA operator per batch from a ``view`` observation channel
(tasks/ct/solver.py:26); here the Radon geometry is static per solver
instance — the TPU-native operator (``tfpnp_tpu.ops.radon``) is captured in
the closure so the whole iteration jits into one XLA computation. Separate
view counts are separate (cached) compilations, which is the XLA-idiomatic
equivalent of the reference's ``RadonGenerator`` cache.

Data dict fields (built by ``tfpnp_tpu.tasks.ct``):
  ``y0``  [B, V, D] float   noisy sinogram
  ``x0``  [B, H, W] float   FBP initialization
All state variables are real ``[B, H, W]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.radon import Radon
from .base import Solver, register_solver

__all__ = []


def _make_aux(radon: Radon):
    """Aux builder: the sinogram plus, under the matmul backend, the
    in-graph operator matrix W. ``filter_aux`` runs outside the
    ``run_bundle`` iteration scan, so W is materialized once per program
    execution — never serialized into the compiled program (which the
    tunneled remote-compile path caps; see ops/radon.py ``_W``)."""

    def _aux(data):
        aux = {"y0": data["y0"]}
        if radon.backend == "matmul":
            aux["radon_w"] = radon.w_traced()
        return aux

    return _aux


def _normal_grad(radon: Radon, aux, z: jnp.ndarray) -> jnp.ndarray:
    """A^T (A z - y0) / opnorm^2, backend-dispatched through aux's W."""
    w = aux.get("radon_w")
    resid = radon.forward_op(z, w) - aux["y0"]
    return radon.adjoint_op(resid, w) / (radon.opnorm ** 2)


def _out_x(state):
    return state["x"]


@register_solver("ct_iadmm")
def make_iadmm(denoiser, radon: Radon = None) -> Solver:
    """Inexact PnP-ADMM with a normalized-backprojection gradient z-step
    (tasks/ct/solver.py:12-53)."""
    assert radon is not None, "ct solvers need a Radon operator"

    def init(data):
        x = data["x0"]
        return {"x": x, "z": x, "u": jnp.zeros_like(x)}

    def iterate(state, aux, hyper):
        x, z, u = state["x"], state["z"], state["u"]
        tau = hyper["tau"].reshape(-1, 1, 1)
        mu = hyper["mu"].reshape(-1, 1, 1)
        x = denoiser(z - u, hyper["sigma_d"])
        grad = _normal_grad(radon, aux, z)
        z = z - tau * (grad + mu * (z - (x + u)))
        # projected iADMM: the image domain is [0,1]; a box with margin
        # keeps the iteration bounded when the policy samples a divergent
        # tau*(1+mu) > 2 (the un-projected reference solver diverges there
        # — plausibly why its CT results table is blank, docs/results.md:57)
        z = jnp.clip(z, -1.0, 2.0)
        u = u + x - z
        return {"x": x, "z": z, "u": u}

    return Solver("ct_iadmm", ("x", "z", "u"), ("sigma_d", "mu", "tau"),
                  init, iterate, _out_x, _make_aux(radon))


@register_solver("ct_pg")
def make_pg(denoiser, radon: Radon = None) -> Solver:
    """PnP proximal gradient (tasks/ct/solver.py:56-87)."""
    assert radon is not None, "ct solvers need a Radon operator"

    def init(data):
        return {"x": data["x0"]}

    def iterate(state, aux, hyper):
        x = state["x"]
        tau = hyper["tau"].reshape(-1, 1, 1)
        z = x - tau * _normal_grad(radon, aux, x)
        x = denoiser(z, hyper["sigma_d"])
        return {"x": x}

    return Solver("ct_pg", ("x",), ("sigma_d", "tau"),
                  init, iterate, _out_x, _make_aux(radon))
