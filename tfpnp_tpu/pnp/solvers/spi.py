"""Single-photon-imaging PnP-ADMM solver.

Re-design of /root/reference/tasks/spi/solver.py:13-51. Note the step
order: z (likelihood prox via bisection), then u, then x (denoiser) —
the reference runs the x-step *last*.

Data dict fields (built by ``tfpnp_tpu.tasks.spi``):
  ``x0`` [B, H, W] float  average-pooled binary observation (the
                          sufficient statistic K1 / K^2)
  ``K``  [B] float        oversampling factor per sample
All state variables are real ``[B, H, W]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.pallas_kernels import spi_inverse_fused as spi_inverse
from .base import Solver, register_solver

__all__ = []


@register_solver("spi_admm")
def make_admm(denoiser) -> Solver:
    def init(data):
        x = data["x0"]
        return {"x": x, "z": x, "u": jnp.zeros_like(x)}

    def iterate(state, aux, hyper):
        x, z, u = state["x"], state["z"], state["u"]
        b = x.shape[0]
        K = aux["K"].reshape(b, 1, 1)
        # K1 = #detected photons per pixel block = x0 * K^2
        # (tasks/spi/solver.py:32-33)
        K1 = aux["x0"] * (K ** 2)
        mu = hyper["mu"].reshape(b, 1, 1)

        z = spi_inverse(x + u, K1, K, mu)
        u = u + x - z
        x = denoiser(z - u, hyper["sigma_d"])
        return {"x": x, "z": z, "u": u}

    def filter_aux(data):
        return {"x0": data["x0"], "K": data["K"]}

    return Solver("spi_admm", ("x", "z", "u"), ("sigma_d", "mu"),
                  init, iterate, lambda s: s["x"], filter_aux)
