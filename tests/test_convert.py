"""Torch->flax UNet weight conversion: numerical equivalence test.

Builds the reference UNet architecture in torch (from its published layout,
models/unet.py:34-131), converts the random state_dict, and checks the flax
forward matches torch to float tolerance — including the
align_corners=True bilinear upsampling path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tfpnp_tpu.models.unet import UNet  # noqa: E402
from tfpnp_tpu.utils.convert_torch import convert_unet_state_dict  # noqa: E402


def _torch_unet():
    """Reference UNet(2, 1) layout with matching state_dict key names."""

    class ConvLayer(nn.Sequential):
        def __init__(self, cin, cout):
            super().__init__()
            self.add_module("conv2d", nn.Conv2d(cin, cout, 3, 1, 1))
            self.add_module("act", nn.LeakyReLU(0.2))

    class ConvBlock(nn.Sequential):
        def __init__(self, cin, cout):
            super().__init__()
            for i in range(3):
                self.add_module(f"conv-{i}", ConvLayer(cin if i == 0 else cout, cout))

    class Inc(nn.Module):
        def __init__(s, cin, cout):
            super().__init__()
            s.conv = ConvBlock(cin, cout)

        def forward(s, x):
            return s.conv(x)

    class Down(nn.Module):
        def __init__(s, cin, cout):
            super().__init__()
            s.mpconv = nn.Sequential(nn.MaxPool2d(2), ConvBlock(cin, cout))

        def forward(s, x):
            return s.mpconv(x)

    class Up(nn.Module):
        def __init__(s, cin, cout):
            super().__init__()
            s.up = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
            s.conv = ConvBlock(cin, cout)

        def forward(s, x1, x2):
            return s.conv(torch.cat([x2, s.up(x1)], dim=1))

    class TorchUNet(nn.Module):
        def __init__(s):
            super().__init__()
            s.inc = Inc(2, 32)
            s.down1 = Down(32, 64)
            s.down2 = Down(64, 128)
            s.down3 = Down(128, 256)
            s.down4 = Down(256, 512)
            s.up1 = Up(512 + 256, 256)
            s.up2 = Up(256 + 128, 128)
            s.up3 = Up(128 + 64, 64)
            s.up4 = Up(64 + 32, 32)
            s.outc = Inc.__new__(Inc)  # placeholder replaced below
            s.outc = nn.Module()
            s.outc.conv = nn.Conv2d(32, 1, 1)

        def forward(s, x):
            x1 = s.inc(x)
            x2 = s.down1(x1)
            x3 = s.down2(x2)
            x4 = s.down3(x3)
            x5 = s.down4(x4)
            y = s.up1(x5, x4)
            y = s.up2(y, x3)
            y = s.up3(y, x2)
            y = s.up4(y, x1)
            return x[:, :1] + s.outc.conv(y)

    return TorchUNet()


def test_converted_weights_match_torch_forward():
    torch.manual_seed(0)
    net = _torch_unet().eval()
    x = torch.rand(2, 2, 32, 32)
    with torch.no_grad():
        want = net(x).numpy()

    params = convert_unet_state_dict(net.state_dict())
    flax_unet = UNet(2, 1)
    x_nhwc = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    got = flax_unet.apply({"params": params}, x_nhwc)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-5)


def _torch_actor(num_inputs=9, bundle=5, n_actions=2, deep=False):
    """Reference-faithful ResNet-18 actor (policy/network.py:16-135) used
    to validate the checkpoint converter."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def conv3x3(cin, cout, stride=1):
        return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)

    class BasicBlock(nn.Module):
        def __init__(s, cin, planes, stride=1):
            super().__init__()
            s.conv1 = conv3x3(cin, planes, stride)
            s.bn1 = nn.BatchNorm2d(planes)
            s.conv2 = conv3x3(planes, planes)
            s.bn2 = nn.BatchNorm2d(planes)
            s.shortcut = nn.Sequential()
            if stride != 1 or cin != planes:
                s.shortcut = nn.Sequential(
                    nn.Conv2d(cin, planes, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(planes))

        def forward(s, x):
            out = F.relu(s.bn1(s.conv1(x)))
            out = s.bn2(s.conv2(out))
            return F.relu(out + s.shortcut(x))

    class Encoder(nn.Module):
        def __init__(s):
            super().__init__()
            s.conv1 = conv3x3(num_inputs, 64, 2)
            s.bn1 = nn.BatchNorm2d(64)
            cin = 64
            for li, planes in enumerate((64, 128, 256, 512), 1):
                blocks = []
                for bi in range(2):
                    blocks.append(BasicBlock(cin, planes, 2 if bi == 0 else 1))
                    cin = planes
                setattr(s, f"layer{li}", nn.Sequential(*blocks))

        def forward(s, x):
            x = F.relu(s.bn1(s.conv1(x)))
            for li in range(1, 5):
                x = getattr(s, f"layer{li}")(x)
            return x

    class Actor(nn.Module):
        def __init__(s):
            super().__init__()
            s.actor_encoder = Encoder()
            s.fc_softmax = nn.Sequential(nn.Linear(512, 2), nn.Softmax(dim=1))
            if deep:
                s.fc_deterministic = nn.Sequential(
                    nn.Linear(512, 64), nn.ReLU(),
                    nn.Linear(64, bundle * n_actions), nn.Sigmoid())
            else:
                s.fc_deterministic = nn.Sequential(
                    nn.Linear(512, bundle * n_actions), nn.Sigmoid())

        def forward(s, x):
            h = s.actor_encoder(x)
            h = F.adaptive_avg_pool2d(h, 1).flatten(1)
            return s.fc_softmax(h), s.fc_deterministic(h)

    return Actor()


@pytest.mark.parametrize("deep", [False, True])
def test_converted_actor_matches_torch_forward(deep):
    import torch

    from tfpnp_tpu.models.actor import ResNetActor
    from tfpnp_tpu.utils.convert_torch import convert_actor_state_dict

    torch.manual_seed(0)
    net = _torch_actor(deep=deep).eval()
    # randomize running stats so the BN mapping is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.5)

    x = torch.rand(2, 9, 32, 32)
    with torch.no_grad():
        probs_t, raw_t = net(x)

    params, stats = convert_actor_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()}, deep_head=deep)
    actor = ResNetActor(action_bundle=5, action_keys=("sigma_d", "mu"),
                        deep_head=deep)
    obs = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    probs_j, raw_j = actor.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        obs, use_running_average=True)
    np.testing.assert_allclose(np.asarray(probs_j), probs_t.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(raw_j), raw_t.numpy(), atol=2e-5)
