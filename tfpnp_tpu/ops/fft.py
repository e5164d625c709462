"""Centered orthonormal 2-D FFTs and complex-layout helpers.

The reference encodes complex arrays as a trailing real/imag dimension of
size 2 and implements fft2/ifft2 as ifftshift -> fft(norm) -> fftshift over
the spatial axes (see /root/reference/tfpnp/utils/transforms.py:68-103).
Here we use native ``complex64`` arrays — the idiomatic XLA representation —
with spatial axes last, and provide the exact same centered-orthonormal
convention.

Layout conventions of this framework:
  - solver variables / k-space:  ``[B, H, W]`` complex64 (channel-free)
  - network observations:        ``[B, H, W, C]`` float32 (NHWC, TPU-native)

``complex2channel`` maps a complex stack ``[..., H, W]`` into interleaved
real/imag NHWC channels, matching the channel ordering of the reference's
``complex2channel`` (transforms.py:20-26) up to the NCHW->NHWC transpose.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

__all__ = [
    "fft2c",
    "ifft2c",
    "fft2",
    "ifft2",
    "real2complex",
    "complex2real",
    "complex_abs",
    "complex2channel",
]

# FFT backend. "matmul" computes the 2-D DFT as two small complex matmuls
# (Y = F_h X F_w^T) — at PnP image sizes (128-512) this runs on the MXU
# systolic array instead of the scalar FFT butterfly path, and it is the
# only path supported by some partial TPU runtimes. "xla" uses jnp.fft.
# Matmul is the default on TPU; override with TFPNP_FFT=xla|matmul.
_FFT_BACKEND = os.environ.get("TFPNP_FFT", "auto")


def _use_matmul() -> bool:
    if _FFT_BACKEND == "matmul":
        return True
    if _FFT_BACKEND == "xla":
        return False
    try:
        import jax
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _dft_mat(n: int, centered: bool, inverse: bool):
    """1-D orthonormal DFT as a dense matrix (optionally with the
    fftshift/ifftshift pair folded in). Returns (real, imag) float32
    *numpy* arrays — trace-time constants must be host arrays so they embed
    directly into the program instead of forcing a device round-trip."""
    eye = np.eye(n)
    fn = np.fft.ifft if inverse else np.fft.fft
    if centered:
        m = np.fft.fftshift(fn(np.fft.ifftshift(eye, axes=0), axis=0, norm="ortho"), axes=0)
    else:
        m = fn(eye, axis=0, norm="ortho")
    return (np.asarray(m.real, np.float32), np.asarray(m.imag, np.float32))


def _dft2_matmul(x: jnp.ndarray, centered: bool, inverse: bool) -> jnp.ndarray:
    """Y = F_h @ X @ F_w^T via real matmuls (MXU), complex in/out."""
    h, w = x.shape[-2], x.shape[-1]
    fr_h, fi_h = _dft_mat(h, centered, inverse)
    fr_w, fi_w = _dft_mat(w, centered, inverse)
    xr, xi = jnp.real(x), jnp.imag(x)
    # rows: (fr + i fi) @ (xr + i xi)
    yr = jnp.einsum("ij,...jk->...ik", fr_h, xr) - jnp.einsum("ij,...jk->...ik", fi_h, xi)
    yi = jnp.einsum("ij,...jk->...ik", fr_h, xi) + jnp.einsum("ij,...jk->...ik", fi_h, xr)
    # cols: Y @ F_w^T
    zr = jnp.einsum("...ik,jk->...ij", yr, fr_w) - jnp.einsum("...ik,jk->...ij", yi, fi_w)
    zi = jnp.einsum("...ik,jk->...ij", yi, fr_w) + jnp.einsum("...ik,jk->...ij", yr, fi_w)
    return jax_lax_complex(zr, zi)


def jax_lax_complex(r, i):
    import jax
    return jax.lax.complex(r, i)


def fft2c(x: jnp.ndarray) -> jnp.ndarray:
    """Centered orthonormal FFT2 over the last two axes.

    Matches reference ``transforms.fft2`` (transforms.py:68-84):
    ifftshift -> unitary FFT -> fftshift.
    """
    if _use_matmul():
        return _dft2_matmul(x.astype(jnp.complex64), centered=True, inverse=False)
    x = jnp.fft.ifftshift(x, axes=(-2, -1))
    x = jnp.fft.fft2(x, norm="ortho")
    return jnp.fft.fftshift(x, axes=(-2, -1))


def ifft2c(x: jnp.ndarray) -> jnp.ndarray:
    """Centered orthonormal inverse FFT2 over the last two axes.

    Matches reference ``transforms.ifft2`` (transforms.py:87-103).
    """
    if _use_matmul():
        return _dft2_matmul(x.astype(jnp.complex64), centered=True, inverse=True)
    x = jnp.fft.ifftshift(x, axes=(-2, -1))
    x = jnp.fft.ifft2(x, norm="ortho")
    return jnp.fft.fftshift(x, axes=(-2, -1))


def fft2(x: jnp.ndarray) -> jnp.ndarray:
    """Uncentered orthonormal FFT2 (used by the CDP operator,
    reference transforms.py:300 calls torch.fft without shifts)."""
    if _use_matmul():
        return _dft2_matmul(x.astype(jnp.complex64), centered=False, inverse=False)
    return jnp.fft.fft2(x, norm="ortho")


def ifft2(x: jnp.ndarray) -> jnp.ndarray:
    """Uncentered orthonormal inverse FFT2."""
    if _use_matmul():
        return _dft2_matmul(x.astype(jnp.complex64), centered=False, inverse=True)
    return jnp.fft.ifft2(x, norm="ortho")


def real2complex(x: jnp.ndarray) -> jnp.ndarray:
    """Lift a real array to complex64 with zero imaginary part
    (reference transforms.py:12-13)."""
    return x.astype(jnp.complex64)


def complex2real(x: jnp.ndarray) -> jnp.ndarray:
    """Real part of a complex array (reference transforms.py:16-17)."""
    return jnp.real(x).astype(jnp.float32)


def complex_abs(x: jnp.ndarray) -> jnp.ndarray:
    """Magnitude of a complex array (reference transforms.py:106-118)."""
    return jnp.abs(x).astype(jnp.float32)


def complex2channel(x: jnp.ndarray) -> jnp.ndarray:
    """Interleave real/imag of ``[..., S, H, W]`` complex into NHWC channels.

    Input  ``[B, S, H, W]`` complex  ->  output ``[B, H, W, 2*S]`` float32
    with channel order (re_0, im_0, re_1, im_1, ...), the same per-source
    ordering as reference ``transforms.complex2channel`` (transforms.py:20-26).
    A 3-D input ``[B, H, W]`` is treated as S == 1.
    """
    if x.ndim == 3:
        x = x[:, None]
    b, s, h, w = x.shape
    ri = jnp.stack([jnp.real(x), jnp.imag(x)], axis=2)  # [B, S, 2, H, W]
    ri = ri.reshape(b, s * 2, h, w)
    return jnp.transpose(ri, (0, 2, 3, 1)).astype(jnp.float32)  # NHWC
