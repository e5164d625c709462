"""ResNet encoder backbone for the policy network (flax/linen, NHWC).

Re-design of /root/reference/tfpnp/policy/network.py:16-116: ResNet-18/34
style BasicBlock stacks (Bottleneck for 50+), all stages stride 2, BatchNorm
after every conv.

Cross-replica BN sync: the reference vendors 736 LoC of thread-queue
machinery (tfpnp/policy/sync_batchnorm/) to synchronize batch statistics
across DataParallel replicas. Here batch statistics are plain means over the
batch axis; under ``jit`` with the batch sharded over the mesh 'dp' axis,
GSPMD lowers those means to cross-chip collectives automatically — sync-BN
is the default behavior, zero extra code.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ResNetEncoder", "RESNET_CFG"]

RESNET_CFG = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, use_running_average: bool):
        return nn.BatchNorm(use_running_average=use_running_average,
                            momentum=0.9, epsilon=1e-5)(x)


# torch Conv2d(k=3, padding=1) pads (1, 1) on both axes for every stride;
# XLA "SAME" pads (0, 1) at stride 2, which shifts borders and breaks exact
# equivalence with converted reference checkpoints
_PAD3 = ((1, 1), (1, 1))


class BasicBlock(nn.Module):
    """conv-bn-relu-conv-bn + projection shortcut
    (reference network.py:33-56)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        ura = use_running_average
        out = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                      padding=_PAD3, use_bias=False)(x)
        out = nn.relu(_BN()(out, ura))
        out = nn.Conv(self.features, (3, 3), padding=_PAD3, use_bias=False)(out)
        out = _BN()(out, ura)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        use_bias=False)(x)
            x = _BN()(x, ura)
        return nn.relu(out + x)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 bottleneck with expansion 4
    (reference network.py:59-84)."""

    features: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        ura = use_running_average
        out = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        out = nn.relu(_BN()(out, ura))
        out = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                      padding=_PAD3, use_bias=False)(out)
        out = nn.relu(_BN()(out, ura))
        out = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False)(out)
        out = _BN()(out, ura)
        if self.stride != 1 or x.shape[-1] != self.features * self.expansion:
            x = nn.Conv(self.features * self.expansion, (1, 1),
                        (self.stride, self.stride), use_bias=False)(x)
        return nn.relu(out + x)


class ResNetEncoder(nn.Module):
    """Stem conv (stride 2) + four stages (each stride 2) -> [B, h', w', 512]
    feature map (reference network.py:87-116)."""

    depth: int = 18

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        kind, blocks = RESNET_CFG[self.depth]
        block_cls = BasicBlock if kind == "basic" else Bottleneck
        x = nn.Conv(64, (3, 3), (2, 2), padding=_PAD3, use_bias=False)(x)
        x = nn.relu(_BN()(x, use_running_average))
        for stage, (feats, n) in enumerate(zip((64, 128, 256, 512), blocks)):
            for i in range(n):
                x = block_cls(feats, stride=2 if i == 0 else 1)(x, use_running_average)
        return x
