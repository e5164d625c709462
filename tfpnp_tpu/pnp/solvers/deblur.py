"""Deconvolution (non-blind deblurring) PnP solvers: ADMM, HQS, PG.

Beyond-reference task family: the reference covers CS-MRI/PR/CT/SPI
(SURVEY §2.2) but not deconvolution — the application PnP proximal
splitting originates from, and the one its own classic hyperparameter
schedule was tuned for (the log-spaced rho/sigma ladder in reference
utils/utils_pnp.py:21-42 is the IRCNN deblurring schedule). Also a worked
example of the extension contract (docs/extending.md).

Forward model: circular convolution ``y = k * x + n``. The data dict
carries the kernel as its Fourier OTF (``kf``), so the quadratic
data-consistency update is a closed-form pointwise divide in frequency
space — an exact proximal step with no inner CG, two batched FFTs per
iteration. Solver state is plain real ``[B, H, W]`` float32 (complex
arrays appear only inside the iterate, so every call site is
tunnel-safe by construction; see CLAUDE.md rules 3-4).

Data dict fields (built by ``tfpnp_tpu.tasks.deblur``):
  ``y0`` [B, H, W] float    blurred noisy measurement
  ``kf`` [B, H, W] complex  blur-kernel OTF (standard DFT convention)
  ``x0`` [B, H, W] float    initialization (= y0)
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.fft import fft2, ifft2  # MXU matmul-DFT on TPU
from .base import Solver, register_solver

__all__ = []


def _aux(data):
    # y0 in frequency space once per bundle; kf is already an OTF.
    # NOTE the basis convention: ops.fft2 is orthonormal while kf is the
    # unnormalized DFT of the kernel (psf2otf). The convolution theorem
    # F(k*x) = kf . F(x) holds for any uniform scaling of F as long as kf
    # stays unnormalized, so all pointwise algebra below is exact.
    return {"kf": data["kf"], "y0f": fft2(data["y0"])}


def _out_x(state):
    return state["x"]


def _wiener_step(v: jnp.ndarray, aux, mu: jnp.ndarray) -> jnp.ndarray:
    """argmin_z ||Az - y||^2 + mu ||z - v||^2 for A = circular conv:
    Z = (conj(K) Y + mu V) / (|K|^2 + mu), pointwise in frequency.
    (The DFT normalization cancels between the two Parseval terms.)
    Takes spatial ``v`` so callers never mix FFT conventions."""
    kf, y0f = aux["kf"], aux["y0f"]
    vf = fft2(v)
    mu = mu.reshape(-1, 1, 1)
    num = jnp.conj(kf) * y0f + mu.astype(vf.dtype) * vf
    den = jnp.abs(kf) ** 2 + mu
    z = jnp.real(ifft2(num / den)).astype(jnp.float32)
    # Projected splitting, as in ct_iadmm (ct.py:53-57): the image domain
    # is [0,1]; a box with margin is a no-op on the stable path but keeps
    # iterates (and their gradients in the MDDPG update) bounded when the
    # policy samples mu ~ 0 where the OTF has near-zero magnitude.
    return jnp.clip(z, -1.0, 2.0)


@register_solver("deblur_admm")
def make_admm(denoiser) -> Solver:
    """PnP-ADMM with exact Fourier z-update (same splitting as the
    CS-MRI ADMM, reference tasks/csmri/solver.py:24-57, with the k-space
    line blend replaced by the deconvolution Wiener divide)."""

    def init(data):
        x = data["x0"].astype(jnp.float32)
        return {"x": x, "z": x, "u": jnp.zeros_like(x)}

    def iterate(state, aux, hyper):
        x, z, u = state["x"], state["z"], state["u"]
        x = denoiser(z - u, hyper["sigma_d"])
        z = _wiener_step(x + u, aux, hyper["mu"])
        u = u + x - z
        return {"x": x, "z": z, "u": u}

    return Solver("deblur_admm", ("x", "z", "u"), ("sigma_d", "mu"),
                  init, iterate, _out_x, _aux)


@register_solver("deblur_hqs")
def make_hqs(denoiser) -> Solver:
    """PnP-HQS (half-quadratic splitting; the IRCNN deblurring loop)."""

    def init(data):
        x = data["x0"].astype(jnp.float32)
        return {"x": x, "z": x}

    def iterate(state, aux, hyper):
        x = denoiser(state["z"], hyper["sigma_d"])
        z = _wiener_step(x, aux, hyper["mu"])
        return {"x": x, "z": z}

    return Solver("deblur_hqs", ("x", "z"), ("sigma_d", "mu"),
                  init, iterate, _out_x, _aux)


@register_solver("deblur_pg")
def make_pg(denoiser) -> Solver:
    """PnP proximal gradient: one explicit A^T(Ax - y) step, then the
    denoiser prox (same scheme as csmri_pg, tasks/csmri/solver.py:92-120)."""

    def init(data):
        return {"x": data["x0"].astype(jnp.float32)}

    def iterate(state, aux, hyper):
        x = state["x"]
        kf, y0f = aux["kf"], aux["y0f"]
        grad = jnp.real(ifft2(
            jnp.conj(kf) * (kf * fft2(x) - y0f))).astype(jnp.float32)
        tau = hyper["tau"].reshape(-1, 1, 1)
        x = denoiser(x - tau * grad, hyper["sigma_d"])
        return {"x": x}

    return Solver("deblur_pg", ("x",), ("sigma_d", "tau"),
                  init, iterate, _out_x, _aux)
