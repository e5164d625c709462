"""Procedural grayscale image generator (training/eval data source).

The reference trains on an external 'Images_128' folder of natural images
and evaluates on released .mat sets (tasks/csmri/main.py:42-44,
tasks/csmri/dataset.py) — neither ships with the repo. This module
generates a deterministic, diverse corpus of 128x128 grayscale images
*on device* (jit + vmap over a key batch): smooth Gaussian-bump fields,
piecewise-constant shape collages, oriented sinusoidal textures, and
mixtures — the statistics PnP priors care about (smooth regions + sharp
edges + texture).

Natural-image anchors (matplotlib's bundled samples) are mixed in on the
host side by ``tfpnp_tpu.data.dataset``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["random_image", "random_images"]


def _coords(n: int):
    g = (jnp.arange(n) + 0.5) / n
    return jnp.meshgrid(g, g, indexing="ij")


def _smooth_field(key: jax.Array, n: int) -> jnp.ndarray:
    """Sum of ~8 random anisotropic Gaussian bumps."""
    yy, xx = _coords(n)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    m = 8
    cy = jax.random.uniform(k1, (m,))
    cx = jax.random.uniform(k2, (m,))
    sy = jax.random.uniform(k3, (m,), minval=0.05, maxval=0.35)
    sx = jax.random.uniform(k4, (m,), minval=0.05, maxval=0.35)
    amp = jax.random.uniform(k5, (m,), minval=-1.0, maxval=1.0)
    bumps = amp[:, None, None] * jnp.exp(
        -((yy[None] - cy[:, None, None]) ** 2 / (2 * sy[:, None, None] ** 2)
          + (xx[None] - cx[:, None, None]) ** 2 / (2 * sx[:, None, None] ** 2)))
    return bumps.sum(0)


def _shapes(key: jax.Array, n: int) -> jnp.ndarray:
    """Collage of ~10 soft-edged ellipses and rectangles."""
    yy, xx = _coords(n)
    keys = jax.random.split(key, 7)
    m = 10
    cy = jax.random.uniform(keys[0], (m,))
    cx = jax.random.uniform(keys[1], (m,))
    ry = jax.random.uniform(keys[2], (m,), minval=0.04, maxval=0.3)
    rx = jax.random.uniform(keys[3], (m,), minval=0.04, maxval=0.3)
    val = jax.random.uniform(keys[4], (m,), minval=-0.8, maxval=0.8)
    is_rect = jax.random.bernoulli(keys[5], 0.5, (m,))
    sharp = 2.0 * n
    dy = (yy[None] - cy[:, None, None]) / ry[:, None, None]
    dx = (xx[None] - cx[:, None, None]) / rx[:, None, None]
    d_ell = jnp.sqrt(dy ** 2 + dx ** 2) - 1.0
    d_rect = jnp.maximum(jnp.abs(dy), jnp.abs(dx)) - 1.0
    d = jnp.where(is_rect[:, None, None], d_rect, d_ell)
    inside = jax.nn.sigmoid(-d * sharp / 8.0)
    return (val[:, None, None] * inside).sum(0)


def _texture(key: jax.Array, n: int) -> jnp.ndarray:
    """Sum of a few oriented sinusoids (texture/stripes)."""
    yy, xx = _coords(n)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    m = 4
    freq = jax.random.uniform(k1, (m,), minval=2.0, maxval=24.0)
    theta = jax.random.uniform(k2, (m,), minval=0.0, maxval=3.1416)
    phase = jax.random.uniform(k3, (m,), minval=0.0, maxval=6.2832)
    amp = jax.random.uniform(k4, (m,), minval=0.05, maxval=0.3)
    arg = 6.2832 * freq[:, None, None] * (
        jnp.cos(theta)[:, None, None] * xx[None] + jnp.sin(theta)[:, None, None] * yy[None])
    return (amp[:, None, None] * jnp.sin(arg + phase[:, None, None])).sum(0)


def random_image(key: jax.Array, n: int = 128) -> jnp.ndarray:
    """One [n, n] image in [0, 1]: random mixture of the three families,
    normalized to full dynamic range."""
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    w = jax.random.dirichlet(k0, jnp.ones(3) * 0.7)
    img = (w[0] * _smooth_field(k1, n)
           + w[1] * _shapes(k2, n)
           + w[2] * _texture(k3, n))
    lo = jnp.percentile(img, 2.0)
    hi = jnp.percentile(img, 98.0)
    img = (img - lo) / jnp.maximum(hi - lo, 1e-6)
    # random global contrast/brightness jitter
    a = jax.random.uniform(k4, (), minval=0.7, maxval=1.0)
    return jnp.clip(img * a + (1 - a) / 2, 0.0, 1.0)


def random_images(key: jax.Array, batch: int, n: int = 128) -> jnp.ndarray:
    """[batch, n, n] images; vmapped and jit-friendly."""
    return jax.vmap(lambda k: random_image(k, n))(jax.random.split(key, batch))
