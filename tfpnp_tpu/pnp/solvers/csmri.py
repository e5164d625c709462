"""CS-MRI PnP solvers: ADMM, HQS, PG, APG, RED-ADMM, AMP.

Re-design of /root/reference/tasks/csmri/solver.py on native complex64 with
``jnp.where`` data consistency (the reference's boolean masked-scatter
``z[mask, :] = temp[mask, :]``, tasks/csmri/solver.py:51, becomes a select —
identical math, static shapes, XLA-fusable).

Data dict fields (built by ``tfpnp_tpu.tasks.csmri``):
  ``y0``   [B, H, W] complex   masked k-space measurements
  ``mask`` [B, H, W] bool      sampling mask
  ``x0``   [B, H, W] complex   zero-filled recon A^T y0 (initialization)

All solver states are dicts of ``[B, H, W]`` complex arrays.
The AMP solver is implemented *working* — the reference's AMP calls the
nonexistent ``transforms.complex_norm`` / ``self.prox_fun``
(tasks/csmri/solver.py:230,238; a dead code path) — using an exact
jvp-based divergence instead of the intended finite-difference probe.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from ...ops.fft import fft2c, ifft2c, real2complex, complex2real
from .base import Solver, register_solver

__all__ = []


def _data_consistency(zf: jnp.ndarray, y0: jnp.ndarray, mask: jnp.ndarray,
                      mu: jnp.ndarray) -> jnp.ndarray:
    """k-space penalized consistency: on sampled lines blend with y0
    (tasks/csmri/solver.py:48-52)."""
    mu = mu.reshape(-1, 1, 1).astype(zf.dtype)
    blended = (mu * zf + y0) / (1 + mu)
    return jnp.where(mask, blended, zf)


def _aux(data):
    return {"y0": data["y0"], "mask": data["mask"]}


def _out_x(state):
    return complex2real(state["x"])


@register_solver("csmri_admm")
def make_admm(denoiser) -> Solver:
    """PnP-ADMM (tasks/csmri/solver.py:24-57)."""

    def init(data):
        x = data["x0"].astype(jnp.complex64)
        return {"x": x, "z": x, "u": jnp.zeros_like(x)}

    def iterate(state, aux, hyper):
        x, z, u = state["x"], state["z"], state["u"]
        y0, mask = aux["y0"], aux["mask"]
        x = real2complex(denoiser(complex2real(z - u), hyper["sigma_d"]))
        zf = fft2c(x + u)
        z = ifft2c(_data_consistency(zf, y0, mask, hyper["mu"]))
        u = u + x - z
        return {"x": x, "z": z, "u": u}

    return Solver("csmri_admm", ("x", "z", "u"), ("sigma_d", "mu"),
                  init, iterate, _out_x, _aux)


@register_solver("csmri_hqs")
def make_hqs(denoiser) -> Solver:
    """PnP-HQS (tasks/csmri/solver.py:60-89)."""

    def init(data):
        x = data["x0"].astype(jnp.complex64)
        return {"x": x, "z": x}

    def iterate(state, aux, hyper):
        z = state["z"]
        y0, mask = aux["y0"], aux["mask"]
        x = real2complex(denoiser(complex2real(z), hyper["sigma_d"]))
        zf = fft2c(x)
        z = ifft2c(_data_consistency(zf, y0, mask, hyper["mu"]))
        return {"x": x, "z": z}

    return Solver("csmri_hqs", ("x", "z"), ("sigma_d", "mu"),
                  init, iterate, _out_x, _aux)


@register_solver("csmri_pg")
def make_pg(denoiser) -> Solver:
    """PnP proximal gradient (tasks/csmri/solver.py:92-120)."""

    def init(data):
        return {"x": data["x0"].astype(jnp.complex64)}

    def iterate(state, aux, hyper):
        x = state["x"]
        y0, mask = aux["y0"], aux["mask"]
        resid = jnp.where(mask, fft2c(x) - y0, 0.0)
        tau = hyper["tau"].reshape(-1, 1, 1).astype(x.dtype)
        z = x - tau * ifft2c(resid)
        x = real2complex(denoiser(complex2real(z), hyper["sigma_d"]))
        return {"x": x}

    return Solver("csmri_pg", ("x",), ("sigma_d", "tau"),
                  init, iterate, _out_x, _aux)


@register_solver("csmri_apg")
def make_apg(denoiser) -> Solver:
    """Accelerated PG with learned extrapolation beta
    (tasks/csmri/solver.py:123-165)."""

    def init(data):
        x = data["x0"].astype(jnp.complex64)
        return {"x": x, "s": x}

    def iterate(state, aux, hyper):
        x, s = state["x"], state["s"]
        y0, mask = aux["y0"], aux["mask"]
        tau = hyper["tau"].reshape(-1, 1, 1).astype(x.dtype)
        beta = hyper["beta"].reshape(-1, 1, 1).astype(x.dtype)
        resid = jnp.where(mask, fft2c(s) - y0, 0.0)
        z = s - tau * ifft2c(resid)
        x_prev = x
        x = real2complex(denoiser(complex2real(z), hyper["sigma_d"]))
        s = x + beta * (x - x_prev)
        return {"x": x, "s": s}

    return Solver("csmri_apg", ("x", "s"), ("sigma_d", "tau", "beta"),
                  init, iterate, _out_x, _aux)


@register_solver("csmri_redadmm")
def make_redadmm(denoiser) -> Solver:
    """RED-ADMM (tasks/csmri/solver.py:168-204)."""

    def init(data):
        x = data["x0"].astype(jnp.complex64)
        return {"x": x, "z": x, "u": jnp.zeros_like(x)}

    def iterate(state, aux, hyper):
        x, z, u = state["x"], state["z"], state["u"]
        y0, mask = aux["y0"], aux["mask"]
        mu = hyper["mu"].reshape(-1, 1, 1).astype(x.dtype)
        lam = hyper["lamda"].reshape(-1, 1, 1).astype(x.dtype)
        x_half = real2complex(denoiser(complex2real(x), hyper["sigma_d"]))
        # mu = lam = 0 (both action ranges include 0, and a saturated
        # policy CAN emit exact zeros) makes the x-subproblem vacuous;
        # 0/0 here poisoned whole training rollouts (round 3). Keep the
        # previous iterate in that degenerate corner.
        denom = mu + lam
        x = jnp.where(jnp.abs(denom) > 1e-8,
                      (lam * x_half + mu * (z - u))
                      / jnp.where(jnp.abs(denom) > 1e-8, denom, 1.0), x)
        zf = fft2c(x + u)
        z = ifft2c(_data_consistency(zf, y0, mask, hyper["mu"]))
        u = u + x - z
        return {"x": x, "z": z, "u": u}

    return Solver("csmri_redadmm", ("x", "z", "u"), ("sigma_d", "mu", "lamda"),
                  init, iterate, _out_x, _aux)


@register_solver("csmri_amp")
def make_amp(denoiser) -> Solver:
    """Approximate message passing with Onsager correction.

    The reference AMP (tasks/csmri/solver.py:207-250) is a dead code path
    (missing helpers); this is the working algorithm it sketches, with the
    Monte-Carlo divergence computed exactly via ``jax.jvp`` on a Gaussian
    probe instead of a finite difference.
    """

    def init(data):
        x0 = data["x0"].astype(jnp.complex64)
        return {"x": jnp.zeros_like(x0), "z": data["y0"].astype(jnp.complex64)}

    def iterate(state, aux, hyper, key):
        x, z = state["x"], state["z"]
        y0, mask = aux["y0"], aux["mask"]
        b, h, w = x.shape
        n = h * w
        m = jnp.sum(mask.reshape(b, -1), axis=-1).astype(jnp.float32)

        r = complex2real(x + ifft2c(z))
        sigma_hat = (jnp.linalg.norm(z.reshape(b, -1), axis=-1) / jnp.sqrt(n)) * hyper["sigma_d"]

        denoise = lambda img: denoiser(img, sigma_hat)
        x_real, = (denoise(r),)
        delta = jax.random.normal(key, r.shape)
        _, jv = jax.jvp(denoise, (r,), (delta,))
        div = jnp.sum((delta * jv).reshape(b, -1), axis=-1)

        x = real2complex(x_real)
        onsager = z * (div / m).reshape(b, 1, 1).astype(z.dtype)
        z = jnp.where(mask, y0 - fft2c(x), 0.0) + onsager
        return {"x": x, "z": z}

    return Solver("csmri_amp", ("x", "z"), ("sigma_d",),
                  init, iterate, _out_x, _aux, stochastic=True)
