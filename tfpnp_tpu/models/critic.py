"""Value network: batchnorm-free ResNet with weight-normalized convs + TReLU.

Re-design of /root/reference/tfpnp/trainer/mddpg/critic.py: the critic must
work on replayed minibatches whose statistics differ from rollout batches,
so the reference strips BN and uses weight normalization with a
learnable-threshold ReLU (TReLU, critic.py:11-19). Same design here:
``nn.WeightNorm`` over the conv kernels (per-output-channel, matching
torch's weight_norm dim=0) and a scalar-threshold TReLU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .resnet import RESNET_CFG

__all__ = ["ResNetCritic", "TReLU"]


class TReLU(nn.Module):
    """relu(x - alpha) + alpha with learnable scalar alpha, init 0
    (reference critic.py:11-19)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        return nn.relu(x - alpha) + alpha


def _wn_conv(features: int, kernel: Tuple[int, int], stride: int = 1):
    # torch-style symmetric padding (see models/resnet.py _PAD3)
    pad = tuple((k // 2, k // 2) for k in kernel)
    return nn.WeightNorm(nn.Conv(features, kernel, (stride, stride),
                                 padding=pad, use_bias=True))


class _WNBasicBlock(nn.Module):
    """Weight-norm BasicBlock with TReLU activations
    (reference critic.py:37-60)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out = TReLU()(_wn_conv(self.features, (3, 3), self.stride)(x))
        out = _wn_conv(self.features, (3, 3))(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = _wn_conv(self.features, (1, 1), self.stride)(x)
        return TReLU()(out + x)


class ResNetCritic(nn.Module):
    """V(ob) scalar head over the same observation the actor sees
    (reference critic.py:95-131; ``get_eval_ob == get_policy_ob`` in all
    four reference tasks)."""

    depth: int = 18
    num_outputs: int = 1

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        kind, blocks = RESNET_CFG[self.depth]
        assert kind == "basic", "critic supports basic blocks (depth 18/34)"
        x = TReLU()(_wn_conv(64, (3, 3), 2)(obs))
        for feats, n in zip((64, 128, 256, 512), blocks):
            for i in range(n):
                x = _WNBasicBlock(feats, stride=2 if i == 0 else 1)(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_outputs)(x)
