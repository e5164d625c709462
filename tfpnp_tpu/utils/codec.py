"""float32 wire codec for the device<->host boundary.

Replay experience and eval metrics cross the device boundary every episode.
Complex solver states are encoded as real/imag halves concatenated along
the last axis and bool/int fields as float32 — this (a) keeps host<->device
traffic in the one dtype every TPU runtime moves at full speed (the
tunneled single-chip backend cannot transfer complex64 to the host at all),
(b) makes replay storage uniform f32, which is what the numpy ring buffer
wants anyway, and (c) never raises array rank: the same tunnel also
rejects device->host reads of rank >= 5, and rollout entries gain a
leading ``lax.scan`` step axis before transfer, so a [B,H,W] complex leaf
must encode to [B,H,2W] (rank 3 -> scan rank 4), not [B,H,W,2].

``make_codec(template)`` captures the dtype tree once; ``encode`` runs
inside the producing jit, ``decode`` inside the consuming jit — both are
pure reshape/cast ops that XLA fuses away.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["make_codec"]


def make_codec(template: Any) -> Tuple[Callable[[Any], Any], Callable[[Any], Any]]:
    # accepts arrays or jax.eval_shape structs (only dtypes are consumed,
    # so templates need no eager computation)
    dtypes = jax.tree.map(
        lambda a: a.dtype if hasattr(a, "dtype") else jnp.asarray(a).dtype,
        template)

    def encode(tree):
        def enc(x):
            x = jnp.asarray(x)
            if jnp.issubdtype(x.dtype, jnp.complexfloating):
                return jnp.concatenate(
                    [jnp.real(x), jnp.imag(x)], axis=-1).astype(jnp.float32)
            return x.astype(jnp.float32)

        return jax.tree.map(enc, tree)

    def decode(tree):
        def dec(x, dt):
            x = jnp.asarray(x)
            if jnp.issubdtype(dt, jnp.complexfloating):
                half = x.shape[-1] // 2
                return jax.lax.complex(x[..., :half], x[..., half:]).astype(dt)
            return x.astype(dt)

        return jax.tree.map(dec, tree, dtypes)

    return encode, decode
