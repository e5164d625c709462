"""Coded-diffraction-pattern (CDP) and compressive phase-retrieval operators.

TPU-native re-design of the reference PR forward models
(/root/reference/tfpnp/utils/transforms.py:282-387): native complex64,
uncentered unitary FFTs, einsum on the MXU for the compressive subsampling
matrix.

Shapes:
  image      ``[B, H, W]``      real or complex
  cdp mask   ``[B, S, H, W]``   complex (S = sampling rate)
  cdp field  ``[B, S, H, W]``   complex
  cpr matrix ``[M, N]``         real, N = H*W
"""

from __future__ import annotations

import jax.numpy as jnp

from .fft import fft2, ifft2

__all__ = ["cdp_forward", "cdp_backward", "cpr_forward", "cpr_backward"]


def cdp_forward(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """CDP forward model  A(x) = F(mask * x)  per sampling pattern.

    Matches reference ``cdp_forward`` (transforms.py:282-301): the image is
    broadcast over the S mask patterns, multiplied by the complex mask, then
    transformed with an *uncentered* unitary FFT.

    Args:
      x:    ``[B, H, W]`` real or complex image.
      mask: ``[B, S, H, W]`` complex mask.

    Returns:
      ``[B, S, H, W]`` complex field.
    """
    x = x.astype(jnp.complex64)
    return fft2(x[:, None] * mask)


def cdp_backward(y: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """CDP pseudo-inverse  conj(mask) * F^-1(y), averaged over patterns.

    Matches reference ``cdp_backward`` (transforms.py:304-320).

    Args:
      y:    ``[B, S, H, W]`` complex field.
      mask: ``[B, S, H, W]`` complex mask.

    Returns:
      ``[B, H, W]`` complex image estimate.
    """
    return jnp.mean(ifft2(y) * jnp.conj(mask), axis=1)


def cpr_forward(x: jnp.ndarray, mask: jnp.ndarray, sample_matrix: jnp.ndarray) -> jnp.ndarray:
    """Compressive phase-retrieval forward  S F(mask*x) * sqrt(N/M).

    Matches reference ``cpr_forward`` (transforms.py:323-344); the matrix
    contraction maps onto the MXU.

    Args:
      x:             ``[B, H, W]`` image.
      mask:          ``[B, H, W]`` complex mask (single pattern).
      sample_matrix: ``[M, N]`` real subsampling matrix, N = H*W.

    Returns:
      ``[B, M]`` complex measurements.
    """
    b, h, w = x.shape
    m, n = sample_matrix.shape
    f = fft2(x.astype(jnp.complex64) * mask).reshape(b, h * w)
    out = jnp.einsum("bn,mn->bm", f, sample_matrix.astype(f.dtype))
    return out * (n / m) ** 0.5


def cpr_backward(y: jnp.ndarray, mask: jnp.ndarray, sample_matrix: jnp.ndarray) -> jnp.ndarray:
    """Adjoint-style backward for compressive PR.

    Matches reference ``cpr_backward`` (transforms.py:347-372).

    Args:
      y:             ``[B, M]`` complex measurements.
      mask:          ``[B, H, W]`` complex mask.
      sample_matrix: ``[M, N]`` real subsampling matrix.

    Returns:
      ``[B, H, W]`` complex image estimate.
    """
    b = y.shape[0]
    _, h, w = mask.shape
    m, n = sample_matrix.shape
    back = jnp.einsum("bm,mn->bn", y, sample_matrix.astype(y.dtype))
    img = ifft2(back.reshape(b, h, w))
    return img * jnp.conj(mask) * (n / m) ** 0.5
