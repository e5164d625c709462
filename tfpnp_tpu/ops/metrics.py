"""Image quality metrics.

Two PSNR flavours, mirroring the reference which uses an in-graph
``torch_psnr`` for RL rewards (/root/reference/tfpnp/env/base.py:237-242)
and a skimage-based band-wise ``psnr_qrnn3d`` with data_range=255 for
evaluation (/root/reference/tfpnp/utils/metric.py:23-25).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "psnr_255"]


def psnr(output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Differentiable per-sample PSNR with data range 1.0.

    ``output`` is clamped to [0, 1]; MSE is taken over all non-batch axes.
    Matches reference ``torch_psnr`` (env/base.py:237-242) but returns
    shape ``[B]`` instead of ``[B, 1]``.
    """
    b = output.shape[0]
    out = jnp.clip(output, 0.0, 1.0).reshape(b, -1)
    mse = jnp.mean((out - gt.reshape(b, -1)) ** 2, axis=1)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def psnr_255(x: np.ndarray, y: np.ndarray, data_range: float = 255.0) -> float:
    """Band-wise evaluation PSNR (host-side numpy).

    Matches reference ``psnr_qrnn3d`` (utils/metric.py:23-25): per-channel
    peak_signal_noise_ratio with data_range=255, averaged over channels.
    Inputs are ``[C, H, W]`` (or ``[H, W]``) arrays already scaled to
    [0, 255].
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if x.ndim == 2:
        x, y = x[None], y[None]
    vals = []
    for c in range(x.shape[0]):
        mse = np.mean((x[c] - y[c]) ** 2)
        vals.append(10.0 * np.log10(data_range ** 2 / max(mse, 1e-12)))
    return float(np.mean(vals))
