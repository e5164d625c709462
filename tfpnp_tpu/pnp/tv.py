"""Classical total-variation denoiser (Chambolle 2004 dual projection).

A trained-weights-free prior used as (a) a fallback proximal denoiser, and
(b) the reference prior in tests and verification drives. The reference
framework has no classical prior — its tests would need the external
``unet-nm.pt`` checkpoint; this makes the PnP machinery testable
self-contained.

All-VPU elementwise work with a ``lax.fori_loop`` — jits cleanly on TPU and
is differentiable (the solvers' ``jax.grad`` path works through it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tv_denoise", "TVDenoiser"]


def _grad2(u):
    gx = jnp.concatenate([u[..., 1:] - u[..., :-1], jnp.zeros_like(u[..., :1])], -1)
    gy = jnp.concatenate([u[..., 1:, :] - u[..., :-1, :], jnp.zeros_like(u[..., :1, :])], -2)
    return gx, gy


def _div2(px, py):
    dx = jnp.concatenate([px[..., :1], px[..., 1:-1] - px[..., :-2], -px[..., -2:-1]], -1)
    dy = jnp.concatenate([py[..., :1, :], py[..., 1:-1, :] - py[..., :-2, :], -py[..., -2:-1, :]], -2)
    return dx + dy


def tv_denoise(x: jnp.ndarray, lam: jnp.ndarray, n_iter: int = 30) -> jnp.ndarray:
    """Solve min_u ||u - x||^2 / 2 + lam * TV(u) by Chambolle's dual
    fixed-point iteration. ``x``: [..., H, W]; ``lam`` broadcasts."""
    px = jnp.zeros_like(x)
    py = jnp.zeros_like(x)
    tau = 0.25

    def body(_, c):
        px, py = c
        gx, gy = _grad2(_div2(px, py) - x / lam)
        # eps inside the sqrt keeps the gradient finite at 0 (the MDDPG
        # trainer differentiates through the denoiser prox)
        nrm = 1.0 + tau * jnp.sqrt(gx ** 2 + gy ** 2 + 1e-12)
        return (px + tau * gx) / nrm, (py + tau * gy) / nrm

    px, py = jax.lax.fori_loop(0, n_iter, body, (px, py))
    return x - lam * _div2(px, py)


class TVDenoiser:
    """Drop-in denoiser with the framework's ``(x, sigma)`` prox signature.

    ``lam = weight * sigma`` is a good default mapping from noise level to
    TV strength (calibrated: weight ~ 1.0 maximizes PSNR on piecewise
    phantoms across sigma in [10, 50]/255).
    """

    def __init__(self, weight: float = 1.0, n_iter: int = 30):
        self.weight = weight
        self.n_iter = n_iter

    def __call__(self, x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
        lam = jnp.maximum(self.weight * sigma.reshape(-1, 1, 1), 1e-4)
        return jnp.clip(tv_denoise(x, lam, self.n_iter), 0.0, 1.0)
