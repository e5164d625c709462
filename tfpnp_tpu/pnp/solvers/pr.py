"""Phase-retrieval PnP solvers: inexact ADMM and proximal gradient.

Re-design of /root/reference/tasks/pr/solver.py on native complex64.

Data dict fields (built by ``tfpnp_tpu.tasks.pr``):
  ``y0``   [B, S, H, W] float    noisy Fourier magnitudes |A x|
  ``mask`` [B, S, H, W] complex  coded-diffraction masks
  ``x0``   [B, H, W] float       all-ones init (tasks/pr/dataset.py:57)
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.cdp import cdp_forward, cdp_backward
from ...ops.fft import real2complex, complex2real
from .base import Solver, register_solver

__all__ = []


def _aux(data):
    return {"y0": data["y0"], "mask": data["mask"]}


def _out_x(state):
    return complex2real(state["x"])


def _amplitude_grad(z: jnp.ndarray, y0: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the amplitude loss 0.5 * || |A z| - y0 ||^2 w.r.t. z.

    Matches reference IADMMSolver_PR lines 64-68: (1 - y0/|Az|) * Az pulled
    back through the CDP adjoint.
    """
    az = cdp_forward(z, mask)
    y_hat = jnp.abs(az)
    scale = ((y_hat - y0) / jnp.maximum(y_hat, 1e-12)).astype(az.dtype)
    return cdp_backward(scale * az, mask)


@register_solver("pr_iadmm")
def make_iadmm(denoiser) -> Solver:
    """Inexact PnP-ADMM: the z-subproblem is one gradient step on the
    amplitude loss plus the quadratic coupling (tasks/pr/solver.py:24-76)."""

    def init(data):
        x = real2complex(data["x0"])
        return {"x": x, "z": x, "u": jnp.zeros_like(x)}

    def iterate(state, aux, hyper):
        x, z, u = state["x"], state["z"], state["u"]
        y0, mask = aux["y0"], aux["mask"]
        tau = hyper["tau"].reshape(-1, 1, 1).astype(z.dtype)
        mu = hyper["mu"].reshape(-1, 1, 1).astype(z.dtype)
        x = real2complex(denoiser(complex2real(z - u), hyper["sigma_d"]))
        grad = _amplitude_grad(z, y0, mask)
        z = z - tau * (grad + mu * (z - (x + u)))
        u = u + x - z
        return {"x": x, "z": z, "u": u}

    return Solver("pr_iadmm", ("x", "z", "u"), ("sigma_d", "mu", "tau"),
                  init, iterate, _out_x, _aux)


@register_solver("pr_pg")
def make_pg(denoiser) -> Solver:
    """PnP proximal gradient on the amplitude loss.

    The reference PGSolver_PR (tasks/pr/solver.py:79-112) reuses the CS-MRI
    masked-Fourier step, which is inconsistent with the PR measurement model
    (its boolean indexing of the complex CDP mask cannot run); this is the
    mathematically intended PG iteration: a gradient step on the amplitude
    loss followed by the denoiser prox.
    """

    def init(data):
        return {"x": real2complex(data["x0"])}

    def iterate(state, aux, hyper):
        x = state["x"]
        y0, mask = aux["y0"], aux["mask"]
        tau = hyper["tau"].reshape(-1, 1, 1).astype(x.dtype)
        z = x - tau * _amplitude_grad(x, y0, mask)
        x = real2complex(denoiser(complex2real(z), hyper["sigma_d"]))
        return {"x": x}

    return Solver("pr_pg", ("x",), ("sigma_d", "tau"),
                  init, iterate, _out_x, _aux)
