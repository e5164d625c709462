"""Residual UNet Gaussian denoiser (the learned PnP prior), flax/linen.

Re-design of /root/reference/tfpnp/pnp/denoiser/models/unet.py:21-131 in
NHWC (TPU-native layout): 5 scales with 32->512 channels, 3-conv
LeakyReLU(0.2) blocks, 2x max-pool downsampling, bilinear
(align_corners=True, matching torch ``nn.Upsample``) upsampling with skip
concatenation, a 1x1 output conv, and a residual add onto the first
``out_channels`` input channels. The dead SGN family (unet.py:134-357) and
the unused block zoo (basicblock.py) are intentionally not rebuilt.

The denoiser *call* convention (noise-map concat + clamp) lives in
``tfpnp_tpu.pnp.denoiser``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["UNet", "upsample2x_align_corners"]


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsampling with align_corners=True semantics.

    ``jax.image.resize`` uses half-pixel centers (align_corners=False);
    torch ``nn.Upsample(scale_factor=2, align_corners=True)`` maps output
    index i to input position i * (in - 1) / (out - 1). Implemented as two
    1-D linear interpolations via gathers so converted torch weights
    reproduce the reference exactly. x: [B, H, W, C].
    """
    b, h, w, c = x.shape

    def interp_axis(v, size, axis):
        out = 2 * size
        pos = jnp.arange(out, dtype=jnp.float32) * (size - 1) / (out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        frac = (pos - lo).reshape((-1,) + (1,) * (v.ndim - axis - 1))
        vlo = jnp.take(v, lo, axis=axis)
        vhi = jnp.take(v, hi, axis=axis)
        return vlo * (1 - frac) + vhi * frac

    x = interp_axis(x, h, axis=1)
    x = interp_axis(x, w, axis=2)
    return x


class ConvBlock(nn.Module):
    """num_layer 3x3 convs with LeakyReLU(0.2)
    (reference unet.py:21-31)."""

    features: int
    num_layer: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layer):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return x


class UNet(nn.Module):
    """Residual UNet; input [B, H, W, in_channels] -> [B, H, W, out_channels].

    Mirrors reference ``UNet`` (unet.py:34-66): residual output is added to
    the first ``out_channels`` input channels.
    """

    in_channels: int = 2
    out_channels: int = 1
    widths: Sequence[int] = (32, 64, 128, 256, 512)
    # computation dtype for the convolutions (flax ``dtype``): bf16 runs
    # them at the MXU's native double-rate precision while parameters,
    # upsampling interpolation (f32 lerp weights promote), and the final
    # residual add stay f32 — the mixed variant whose restoration quality
    # holds where pure-bf16 is borderline (ROADMAP "bf16 quality gate")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        w = self.widths
        skips = []
        x = ConvBlock(w[0], dtype=self.dtype, name="inc")(x)
        for i in range(1, len(w)):
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ConvBlock(w[i], dtype=self.dtype, name=f"down{i}")(x)
        for i in range(len(w) - 2, -1, -1):
            x = upsample2x_align_corners(x)
            skip = skips[i]
            # pad if odd-size mismatch (reference unet.py:109-113)
            dh = skip.shape[1] - x.shape[1]
            dw = skip.shape[2] - x.shape[2]
            if dh or dw:
                x = jnp.pad(x, ((0, 0), (dw // 2, dw - dw // 2),
                                (dh // 2, dh - dh // 2), (0, 0)))
            x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
            x = ConvBlock(w[i], dtype=self.dtype, name=f"up{i}")(x)
        residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="outc")(x)
        return (inp[..., : self.out_channels].astype(jnp.float32)
                + residual.astype(jnp.float32))
