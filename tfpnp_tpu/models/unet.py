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

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["UNet", "UNetS2D", "upsample2x_align_corners",
           "space_to_depth", "depth_to_space"]


@functools.lru_cache(maxsize=None)
def _interp_matrix(size: int) -> np.ndarray:
    """[size, 2*size] 1-D align_corners=True 2x interpolation matrix:
    out[j] = sum_i M[i, j] * in[i], with the exact lo/hi/frac taps of the
    gather formulation (so converted torch weights stay bit-equivalent)."""
    out = 2 * size
    pos = np.arange(out, dtype=np.float64) * (size - 1) / (out - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, size - 1)
    frac = (pos - lo).astype(np.float32)
    m = np.zeros((size, out), np.float32)
    m[lo, np.arange(out)] += 1.0 - frac
    m[hi, np.arange(out)] += frac
    return m


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsampling with align_corners=True semantics.

    ``jax.image.resize`` uses half-pixel centers (align_corners=False);
    torch ``nn.Upsample(scale_factor=2, align_corners=True)`` maps output
    index i to input position i * (in - 1) / (out - 1).

    The 1-D interpolation along each axis is a fixed 2-banded linear map,
    so it runs as two small MXU matmuls (einsum against [n, 2n] matrices)
    instead of gathers — gathers scalarize on the VPU and dominated the
    UNet forward (level-ablation probe, RESULTS.md). x: [B, H, W, C].
    """
    b, h, w, c = x.shape
    mh = jnp.asarray(_interp_matrix(h))
    mw = jnp.asarray(_interp_matrix(w))
    x = jnp.einsum("bhwc,hH->bHwc", x, mh.astype(x.dtype),
                   preferred_element_type=x.dtype)
    x = jnp.einsum("bhwc,wW->bhWc", x, mw.astype(x.dtype),
                   preferred_element_type=x.dtype)
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


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/r, W/r, C*r*r] (pixel-unshuffle)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[B, H, W, C*r*r] -> [B, H*r, W*r, C] (inverse of space_to_depth)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r, c // (r * r))


class UNetS2D(nn.Module):
    """TPU-shaped residual denoiser: UNet behind a space-to-depth shuffle.

    The reference UNet's top level runs 3x3 convs at 32 output channels on
    the full-resolution grid — 25% of the MXU's 128 lanes and the largest
    HBM working set of the network (measured: the full-res blocks dominate
    the forward at ~28% MFU). Pixel-unshuffling the input by ``factor``
    moves the same information into channels: every conv then runs at
    >=64 lanes on a 4x-smaller grid. Per-conv FLOPs are invariant
    ((H/2)^2 (2C)^2 = H^2 C^2) but one whole scale of full-res blocks
    disappears and the top-level bandwidth halves.

    Same denoiser interface as ``UNet`` (in 2ch noisy+sigma-map ->
    residual 1ch, reference denoiser/base.py:23-32); trained by
    ``scripts/train_denoiser.py --arch s2d``. The reference repo contains
    an (unused) shuffle-based denoiser family of its own — the SGN nets
    (unet.py:134-357) — validating the design lineage.
    """

    in_channels: int = 2
    out_channels: int = 1
    widths: Sequence[int] = (64, 128, 256, 512)
    factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        r = self.factor
        w = self.widths
        # the shuffle + 2x up/down ladder needs H, W divisible by
        # factor * 2^(levels-1); reflect-pad up and crop the residual
        # back so arbitrary sizes (e.g. the SR x3 126^2 grids) work —
        # shapes are static under jit, so this costs nothing when the
        # input is already aligned
        m = r * (1 << (len(w) - 1))
        h, wd = x.shape[1], x.shape[2]
        ph, pw = (-h) % m, (-wd) % m
        if ph or pw:
            # reflect needs pad < dim; inputs smaller than the alignment
            # modulus (e.g. H=5 with m=16) fall back to edge replication
            mode = "reflect" if (ph < h and pw < wd) else "edge"
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
        z = space_to_depth(x, r)
        skips = []
        z = ConvBlock(w[0], dtype=self.dtype, name="inc")(z)
        for i in range(1, len(w)):
            skips.append(z)
            z = nn.max_pool(z, (2, 2), strides=(2, 2))
            z = ConvBlock(w[i], dtype=self.dtype, name=f"down{i}")(z)
        for i in range(len(w) - 2, -1, -1):
            z = upsample2x_align_corners(z)
            z = jnp.concatenate([skips[i], z.astype(skips[i].dtype)], axis=-1)
            z = ConvBlock(w[i], dtype=self.dtype, name=f"up{i}")(z)
        z = nn.Conv(self.out_channels * r * r, (1, 1), dtype=self.dtype,
                    name="outc")(z)
        residual = depth_to_space(z.astype(jnp.float32), r)[:, :h, :wd]
        return inp[..., : self.out_channels].astype(jnp.float32) + residual
