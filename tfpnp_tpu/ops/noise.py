"""Measurement-noise models, as pure key-passing JAX functions.

Re-design of /root/reference/tfpnp/utils/noise.py: the reference's stateful
numpy/torch noise classes become pure functions so measurement synthesis can
run jitted *on device* as part of the data pipeline (TPU-first: the noisy
forward models are generated at HBM bandwidth, not on the host).

Each model returns ``(y, sigma)`` like the reference.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "gaussian_c",
    "gaussian_d",
    "gaussian_p",
    "poisson_pr",
]


def gaussian_c(key: jax.Array, x: jnp.ndarray, low: float = 0.0, high: float = 55.0):
    """Continuous uniform noise level in [low, high]/255
    (reference ``GaussianModelC``, noise.py:5-17)."""
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, (), minval=low, maxval=high) / 255.0
    y = x + jax.random.normal(k2, x.shape, x.dtype) * sigma
    return y, sigma


def gaussian_d(key: jax.Array, x: jnp.ndarray, sigmas: Sequence[float], idx=None):
    """Discrete noise level drawn from ``sigmas`` (values on a 0-255 scale);
    reference ``GaussianModelD`` (noise.py:20-33)."""
    k1, k2 = jax.random.split(key)
    sig = jnp.asarray(sigmas, jnp.float32) / 255.0
    if idx is None:
        idx = jax.random.randint(k1, (), 0, len(sigmas))
    sigma = sig[idx]
    y = x + jax.random.normal(k2, x.shape) * sigma
    return y, sigma


def gaussian_p(key: jax.Array, x: jnp.ndarray, sigmas_p: Sequence[float]):
    """Noise as a percentage of the per-sample mean absolute signal, drawn
    per batch element; reference ``GaussianModelP`` batch mode
    (noise.py:36-53). ``x``: [B, ...]."""
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    idx = jax.random.randint(k1, (b,), 0, len(sigmas_p))
    sigma = jnp.asarray(sigmas_p, jnp.float32)[idx]
    sigma_b = sigma.reshape((b,) + (1,) * (x.ndim - 1))
    x_mean = jnp.mean(jnp.abs(x.reshape(b, -1)), axis=1).reshape(sigma_b.shape)
    y = x + jax.random.normal(k2, x.shape) * x_mean * sigma_b
    return y.astype(jnp.float32), sigma


def poisson_pr(key: jax.Array, z: jnp.ndarray, alpha: float):
    """Poisson-like intensity noise for phase retrieval; reference
    ``PoissonModel`` (noise.py:56-76). ``z`` is the clean magnitude field;
    returns the noisy magnitude and the empirical residual std."""
    intensity_noise = (alpha / 255.0) * jnp.abs(z) * jax.random.normal(key, z.shape)
    y2 = jnp.clip(z ** 2 + intensity_noise, 0.0, None)
    y = jnp.sqrt(y2)
    sigma = jnp.std(y - jnp.abs(z))
    return y, sigma
