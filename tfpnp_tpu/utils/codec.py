"""float32 wire codec for the device<->host boundary.

Replay experience and eval metrics cross the device boundary every episode.
Complex solver states are encoded as a trailing real/imag pair and
bool/int fields as float32 — this (a) keeps host<->device traffic in the
one dtype every TPU runtime moves at full speed (and the only d2h dtype
the tunneled single-chip backend supports at all), and (b) makes replay
storage uniform f32, which is what the numpy ring buffer wants anyway.

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
    dtypes = jax.tree.map(lambda a: jnp.asarray(a).dtype, template)

    def encode(tree):
        def enc(x):
            x = jnp.asarray(x)
            if jnp.issubdtype(x.dtype, jnp.complexfloating):
                return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).astype(jnp.float32)
            return x.astype(jnp.float32)

        return jax.tree.map(enc, tree)

    def decode(tree):
        def dec(x, dt):
            x = jnp.asarray(x)
            if jnp.issubdtype(dt, jnp.complexfloating):
                return jax.lax.complex(x[..., 0], x[..., 1]).astype(dt)
            return x.astype(dt)

        return jax.tree.map(dec, tree, dtypes)

    return encode, decode
