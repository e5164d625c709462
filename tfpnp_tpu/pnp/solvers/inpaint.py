"""Inpainting PnP solvers: ADMM, HQS, PG.

Beyond-reference task family (the reference covers CS-MRI/PR/CT/SPI,
SURVEY §2.2): recover an image from a random subset of its pixels,
``y = M ⊙ x + n`` with a binary keep-mask M. Inpainting is the textbook
PnP demonstration — the data-consistency proximal step is *diagonal*:

    argmin_z ||M z - y||^2 + mu ||z - v||^2  =  (M y + mu v) / (M + mu)

i.e. a pointwise blend (observed pixels pulled toward y, unobserved ones
passed through), so the whole iteration is one denoiser call plus a
``where`` — no FFTs at all. The entire family is VPU elementwise work
around the UNet prox, which makes it the cheapest episode in the zoo.

Data dict fields (built by ``tfpnp_tpu.tasks.inpaint``):
  ``y0``   [B, H, W] float  masked noisy measurement (zeros where dropped)
  ``mask`` [B, H, W] bool   keep-mask M
  ``x0``   [B, H, W] float  init: y0 with dropped pixels mean-filled
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Solver, register_solver

__all__ = []


def _aux(data):
    return {"mask": data["mask"].astype(jnp.float32), "y0": data["y0"]}


def _out_x(state):
    return state["x"]


def _diag_prox(v: jnp.ndarray, aux, mu: jnp.ndarray) -> jnp.ndarray:
    """Exact diagonal data prox (see module docstring). mu has a small
    positive floor in the actor range so the observed-pixel blend never
    divides 0/0; unobserved pixels reduce to z = v identically."""
    m, y0 = aux["mask"], aux["y0"]
    mu = mu.reshape(-1, 1, 1)
    return (m * y0 + mu * v) / (m + mu)


@register_solver("inpaint_admm")
def make_admm(denoiser) -> Solver:
    """PnP-ADMM (same splitting as csmri_admm, reference
    tasks/csmri/solver.py:24-57, with the k-space blend replaced by the
    pixel-domain diagonal prox)."""

    def init(data):
        x = data["x0"].astype(jnp.float32)
        return {"x": x, "z": x, "u": jnp.zeros_like(x)}

    def iterate(state, aux, hyper):
        x, z, u = state["x"], state["z"], state["u"]
        x = denoiser(z - u, hyper["sigma_d"])
        z = _diag_prox(x + u, aux, hyper["mu"])
        u = u + x - z
        return {"x": x, "z": z, "u": u}

    return Solver("inpaint_admm", ("x", "z", "u"), ("sigma_d", "mu"),
                  init, iterate, _out_x, _aux)


@register_solver("inpaint_hqs")
def make_hqs(denoiser) -> Solver:
    """PnP-HQS (half-quadratic splitting)."""

    def init(data):
        x = data["x0"].astype(jnp.float32)
        return {"x": x, "z": x}

    def iterate(state, aux, hyper):
        x = denoiser(state["z"], hyper["sigma_d"])
        z = _diag_prox(x, aux, hyper["mu"])
        return {"x": x, "z": z}

    return Solver("inpaint_hqs", ("x", "z"), ("sigma_d", "mu"),
                  init, iterate, _out_x, _aux)


@register_solver("inpaint_pg")
def make_pg(denoiser) -> Solver:
    """PnP proximal gradient: A^T(Ax - y) = M ⊙ x - y (M binary), then
    the denoiser prox (scheme of csmri_pg, tasks/csmri/solver.py:92-120)."""

    def init(data):
        return {"x": data["x0"].astype(jnp.float32)}

    def iterate(state, aux, hyper):
        x = state["x"]
        grad = aux["mask"] * x - aux["y0"]
        tau = hyper["tau"].reshape(-1, 1, 1)
        x = denoiser(x - tau * grad, hyper["sigma_d"])
        return {"x": x}

    return Solver("inpaint_pg", ("x",), ("sigma_d", "tau"),
                  init, iterate, _out_x, _aux)
