"""MXU-saturating inference path for the UNetS2D denoiser.

Round-4's roofline (`scripts/roofline_s2d.py`, RESULTS.md "Where the
other 50% of MXU peak lives") localized the gap to bf16 peak in two
places, neither of them HBM bytes:

  1. 3x3 convs on 8^2-32^2 grids underfill the 128x128 systolic array:
     XLA's implicit GEMM keeps the reduction dimension at Cin per tap,
     so deep stages measured 11-17% MXU.
  2. The align_corners upsampling einsums are pure data movement
     (0 useful TFLOP/s) feeding a conv that immediately re-reads the
     4x-larger fine grid.

This module is the fix the roofline names (VERDICT r4 #3), as a pure
function over the SAME parameter pytree the flax module owns — training
and checkpoints are untouched; the rewrite is exact linear algebra:

  (a) **im2col GEMM**: each 3x3 conv becomes ONE matmul
      ``[B*H*W, 9*Cin] x [9*Cin, Cout]`` — the reduction dimension is
      9x deeper, the exact trick that fixed the upsampling in round 2.
  (b) **Composed upsample+conv**: for an up block,
      ``conv3x3(concat[skip, U(x)])`` splits by linearity into
      ``conv_skip(skip) + sum_{dy,dx} interp_dy,dx(x @ W_up[dy,dx])``
      where ``interp_dy,dx`` are the fixed interpolation matrices
      SHIFTED by the conv tap — the channel mixing (where the FLOPs
      are) now runs on the COARSE grid: 4x fewer MACs for the
      upsampled half of the first conv, and the standalone upsampling
      stage disappears entirely.

Both are bit-exact re-associations in exact arithmetic (tested to f32
tolerance against ``module.apply`` in tests/test_denoiser_arch.py).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .unet import _interp_matrix, depth_to_space, space_to_depth

__all__ = ["s2d_fast_apply"]


@functools.lru_cache(maxsize=None)
def _shifted_interp(size: int):
    """The three conv-tap-shifted copies of the align_corners 2x
    interpolation matrix: T[o][i, p] = M[i, p+o] for o in (-1, 0, 1),
    zero outside the fine grid (conv SAME zero padding)."""
    m = _interp_matrix(size)                       # [size, 2*size]
    pad = np.pad(m, ((0, 0), (1, 1)))
    fine = 2 * size
    return tuple(np.ascontiguousarray(pad[:, 1 + o: 1 + o + fine])
                 for o in (-1, 0, 1))


def _conv3x3_gemm(x: jnp.ndarray, kernel: jnp.ndarray,
                  bias: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv as a single im2col GEMM. x: [B,H,W,Ci];
    kernel: [3,3,Ci,Co] (flax layout)."""
    ci, co = kernel.shape[2], kernel.shape[3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    taps = [xp[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(taps, axis=-1)       # [B,H,W,9*Ci]
    out = jnp.einsum("bhwk,kc->bhwc", patches,
                     kernel.reshape(9 * ci, co).astype(patches.dtype),
                     preferred_element_type=jnp.float32)
    return out + bias.astype(jnp.float32)


def _conv3x3_xla(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: jnp.ndarray) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return out + bias.astype(jnp.float32)


def _conv3x3(x, p, gemm):
    fn = _conv3x3_gemm if gemm else _conv3x3_xla
    return fn(x, p["kernel"], p["bias"])


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _block(x, p, dtype, gemm):
    """3-conv LeakyReLU block (models/unet.py ConvBlock) with f32
    accumulation and bf16-or-f32 operands."""
    for i in range(3):
        x = _lrelu(_conv3x3(x.astype(dtype), p[f"conv{i}"], gemm))
    return x


def _up_first_conv(skip, xc, p, dtype, gemm):
    """First conv of an up block without materializing the upsampled
    grid: conv_skip(skip) + composed interp/channel-mix of the coarse
    input (header (b)). skip: [B,2h,2w,Cs]; xc: [B,h,w,Cu]."""
    kernel, bias = p["kernel"], p["bias"]          # [3,3,Cs+Cu,Co]
    cs = skip.shape[-1]
    k_skip, k_up = kernel[:, :, :cs], kernel[:, :, cs:]
    fn = _conv3x3_gemm if gemm else _conv3x3_xla
    out = fn(skip.astype(dtype), k_skip, bias)
    th = _shifted_interp(xc.shape[1])
    tw = _shifted_interp(xc.shape[2])
    xc = xc.astype(dtype)
    for oy in range(3):
        # channel mixing on the coarse grid (the 4x FLOP saving); the
        # per-tap row/col interp maps are small matmuls over Co lanes
        for ox in range(3):
            t = jnp.einsum("bhwc,cd->bhwd", xc,
                           k_up[oy, ox].astype(dtype),
                           preferred_element_type=dtype)
            t = jnp.einsum("bhwd,hH->bHwd", t,
                           jnp.asarray(th[oy], dtype),
                           preferred_element_type=dtype)
            t = jnp.einsum("bhwd,wW->bhWd", t,
                           jnp.asarray(tw[ox], dtype),
                           preferred_element_type=jnp.float32)
            out = out + t
    return out


def _max_pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def s2d_fast_apply(params: Any, x: jnp.ndarray, *, factor: int = 2,
                   compute_dtype: Any = jnp.bfloat16,
                   gemm_max_grid: int = 32) -> jnp.ndarray:
    """UNetS2D forward (models/unet.py:142-199), inference-optimized.

    Args:
      params: the flax param tree of a trained ``UNetS2D``.
      x: ``[B, H, W, 2]`` noisy+sigma-map input (f32).
      compute_dtype: conv operand dtype (accumulation is f32).
      gemm_max_grid: grids at or below this edge run convs as single
        im2col GEMMs (deep stages where XLA's per-tap reduction
        underfills the MXU); larger grids keep XLA's conv schedule.

    Returns ``[B, H, W, 1]`` f32, numerically equal to
    ``UNetS2D().apply({'params': params}, x)`` up to re-association.
    """
    inp = x
    r = factor
    n_down = sum(1 for k in params if k.startswith("down"))
    widths = [params["inc"]["conv0"]["kernel"].shape[-1]]
    widths += [params[f"down{i}"]["conv0"]["kernel"].shape[-1]
               for i in range(1, n_down + 1)]
    m = r * (1 << n_down)
    h, wd = x.shape[1], x.shape[2]
    ph, pw = (-h) % m, (-wd) % m
    if ph or pw:
        mode = "reflect" if (ph < h and pw < wd) else "edge"
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
    z = space_to_depth(x, r)

    def use_gemm(t):
        return t.shape[1] <= gemm_max_grid and t.shape[2] <= gemm_max_grid

    z = _block(z, params["inc"], compute_dtype, use_gemm(z))
    skips = []
    for i in range(1, n_down + 1):
        skips.append(z)
        z = _max_pool2(z)
        z = _block(z, params[f"down{i}"], compute_dtype, use_gemm(z))
    for i in range(n_down - 1, -1, -1):
        p = params[f"up{i}"]
        skip = skips[i]
        z = _lrelu(_up_first_conv(skip, z, p["conv0"], compute_dtype,
                                  use_gemm(skip)))
        gemm = use_gemm(z)
        z = _lrelu(_conv3x3(z.astype(compute_dtype), p["conv1"], gemm))
        z = _lrelu(_conv3x3(z.astype(compute_dtype), p["conv2"], gemm))
    ko, bo = params["outc"]["kernel"], params["outc"]["bias"]
    z = jnp.einsum("bhwc,cd->bhwd", z.astype(compute_dtype),
                   ko[0, 0].astype(compute_dtype),
                   preferred_element_type=jnp.float32) + bo
    residual = depth_to_space(z.astype(jnp.float32), r)[:, :h, :wd]
    return inp[..., :residual.shape[-1]].astype(jnp.float32) + residual
