"""Single-photon-imaging (SPI) forward model and likelihood prox.

TPU-native re-design of /root/reference/tfpnp/utils/transforms.py:395-439.
The forward model Poisson-samples photon counts on a K x K oversampled grid
and binarizes; the likelihood prox is a fully vectorized, differentiable
bisection run as a ``lax.fori_loop`` — pure VPU element-wise work with
static shapes (the reference's boolean index sets become ``jnp.where``
masks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["spi_forward", "spi_inverse"]


def spi_forward(x: jnp.ndarray, K: int, alpha: float, q: float, key: jax.Array) -> jnp.ndarray:
    """Binary photon observation of an image at K^2 oversampling.

    Matches reference ``spi_forward`` (transforms.py:395-401):
    theta = alpha * kron(x, 1_{KxK}) / K^2; y ~ Poisson(theta); ob = y >= q.

    Args:
      x:   ``[..., H, W]`` image in [0, 1].
      K:   integer oversampling factor (static).
      alpha, q: photon scale / detection threshold.
      key: PRNG key for the Poisson draw.

    Returns:
      ``[..., H*K, W*K]`` float binary observation.
    """
    up = jnp.repeat(jnp.repeat(x, K, axis=-2), K, axis=-1)
    theta = alpha * up / (K ** 2)
    y = jax.random.poisson(key, theta).astype(jnp.float32)
    return (y >= q).astype(jnp.float32)


def spi_inverse(ztilde: jnp.ndarray, K1: jnp.ndarray, K: jnp.ndarray, mu: jnp.ndarray) -> jnp.ndarray:
    """Prox of the SPI binomial likelihood, 10-step vectorized bisection.

    Solves, element-wise, f(y) = K1/(exp(y)-1) - mu*y - K0 + mu*ztilde = 0
    on [1e-5, 1.1] (K0 = K^2 - K1); where K1 == 0 the closed form
    ztilde - K0/mu applies. Matches reference ``spi_inverse``
    (transforms.py:404-439) with index-set updates replaced by masks.

    All arguments broadcast element-wise against ``ztilde``.

    Returns:
      prox result, clamped to [0, 1].
    """
    K0 = K ** 2 - K1
    zero_count = K1 == 0
    z_closed = ztilde - K0 / mu

    def f(y):
        return K1 / (jnp.exp(y) - 1.0) - mu * y - K0 + mu * ztilde

    bmin = jnp.full_like(ztilde, 1e-5)
    bmax = jnp.full_like(ztilde, 1.1)
    bave = (bmin + bmax) / 2.0

    def body(_, carry):
        bmin, bmax, bave = carry
        t = f(bave)
        bmin = jnp.where(t > 0, bave, bmin)
        bmax = jnp.where(t < 0, bave, bmax)
        # reference freezes an element permanently once f hits exactly 0
        bave = jnp.where(t == 0, bave, (bmin + bmax) / 2.0)
        return bmin, bmax, bave

    _, _, bave = jax.lax.fori_loop(0, 10, body, (bmin, bmax, bave))
    z = jnp.where(zero_count, z_closed, bave)
    return jnp.clip(z, 0.0, 1.0)
