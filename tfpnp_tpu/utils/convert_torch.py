"""Convert reference PyTorch checkpoints to this framework's parameter trees.

Gives users of the reference a migration path: the released ``unet-nm.pt``
denoiser (reference denoiser/base.py:11) and ``actor_*.pkl`` policy
checkpoints load here without retraining.

Weight layout mapping:
  torch Conv2d  [out, in, kh, kw]  ->  flax Conv kernel [kh, kw, in, out]
  torch Linear  [out, in]          ->  flax Dense kernel [in, out]

UNet module-name mapping (reference models/unet.py:34-66 -> models/unet.py
here):
  inc.conv.conv-{i}.conv2d      -> inc/conv{i}
  down{k}.mpconv.1.conv-{i}...  -> down{k}/conv{i}
  up{k}.conv.conv-{i}...        -> up{4-k}/conv{i}   (reference up1 fuses
                                   the deepest scale; ours are indexed by
                                   resolution level)
  outc.conv                     -> outc
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np

__all__ = ["convert_unet_state_dict", "convert_unet_checkpoint",
           "convert_actor_state_dict", "convert_actor_checkpoint"]


def _conv(w, b=None) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(np.asarray(w), (2, 3, 1, 0))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def convert_unet_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference ``UNet(2, 1)`` state_dict to our flax param tree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}

    def block(dst: str, src_prefix: str):
        node = {}
        for i in range(3):
            w = sd[f"{src_prefix}.conv-{i}.conv2d.weight"]
            b = sd[f"{src_prefix}.conv-{i}.conv2d.bias"]
            node[f"conv{i}"] = _conv(w, b)
        params[dst] = node

    block("inc", "inc.conv")
    for k in range(1, 5):
        block(f"down{k}", f"down{k}.mpconv.1")
    # reference up1..up4 go deepest->shallowest; our up{i} is indexed by the
    # skip scale i (3..0), i.e. reference up{j} == ours up{4-j}
    for j in range(1, 5):
        block(f"up{4 - j}", f"up{j}.conv")
    params["outc"] = _conv(sd["outc.conv.weight"], sd["outc.conv.bias"])
    return params


def _bn(sd: Dict[str, np.ndarray], prefix: str):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def _dense(w, b) -> Dict[str, np.ndarray]:
    return {"kernel": np.transpose(np.asarray(w), (1, 0)),
            "bias": np.asarray(b)}


def convert_actor_state_dict(state_dict: Dict[str, Any],
                             deep_head: bool = False):
    """Map a reference ``ResNetActor_*`` (depth-18) state_dict to our flax
    ``(params, batch_stats)`` variable trees.

    Name mapping (reference policy/network.py:33-56, 87-135 -> models here):
      actor_encoder.conv1/bn1            -> ResNetEncoder_0/Conv_0, _BN_0
      actor_encoder.layer{s}.{i}         -> ResNetEncoder_0/BasicBlock_{2(s-1)+i}
        .conv1/.conv2/.shortcut.0        ->   Conv_0 / Conv_1 / Conv_2
        .bn1/.bn2/.shortcut.1            ->   _BN_0 / _BN_1 / _BN_2
      fc_softmax.0                       -> Dense_0
      fc_deterministic.0[,2]             -> Dense_1[, Dense_2] (deep head)
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_p: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}

    def put_bn(dst: str, src: str, node_p, node_s):
        p, s = _bn(sd, src)
        node_p[dst] = {"BatchNorm_0": p}
        node_s[dst] = {"BatchNorm_0": s}

    enc_p["Conv_0"] = {"kernel": np.transpose(sd["actor_encoder.conv1.weight"],
                                              (2, 3, 1, 0))}
    put_bn("_BN_0", "actor_encoder.bn1", enc_p, enc_s)

    blk = 0
    for stage in range(1, 5):
        i = 0
        while f"actor_encoder.layer{stage}.{i}.conv1.weight" in sd:
            src = f"actor_encoder.layer{stage}.{i}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            bp["Conv_0"] = {"kernel": np.transpose(sd[f"{src}.conv1.weight"],
                                                   (2, 3, 1, 0))}
            bp["Conv_1"] = {"kernel": np.transpose(sd[f"{src}.conv2.weight"],
                                                   (2, 3, 1, 0))}
            put_bn("_BN_0", f"{src}.bn1", bp, bs)
            put_bn("_BN_1", f"{src}.bn2", bp, bs)
            if f"{src}.shortcut.0.weight" in sd:
                bp["Conv_2"] = {"kernel": np.transpose(
                    sd[f"{src}.shortcut.0.weight"], (2, 3, 1, 0))}
                put_bn("_BN_2", f"{src}.shortcut.1", bp, bs)
            enc_p[f"BasicBlock_{blk}"] = bp
            enc_s[f"BasicBlock_{blk}"] = bs
            blk += 1
            i += 1

    params: Dict[str, Any] = {"ResNetEncoder_0": enc_p}
    params["Dense_0"] = _dense(sd["fc_softmax.0.weight"], sd["fc_softmax.0.bias"])
    params["Dense_1"] = _dense(sd["fc_deterministic.0.weight"],
                               sd["fc_deterministic.0.bias"])
    if deep_head:
        params["Dense_2"] = _dense(sd["fc_deterministic.2.weight"],
                                   sd["fc_deterministic.2.bias"])
    batch_stats = {"ResNetEncoder_0": enc_s}
    return params, batch_stats


def convert_actor_checkpoint(pkl_path: str | Path, out_path: str | Path,
                             deep_head: bool = False) -> None:
    """Reference ``actor_*.pkl`` -> our slim actor checkpoint format
    ({actor_params, actor_stats}), loadable by the CLI ``--eval -r``."""
    import pickle

    import torch

    sd = torch.load(str(pkl_path), map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, stats = convert_actor_state_dict(
        {k: v.numpy() for k, v in sd.items()}, deep_head=deep_head)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump({"actor_params": params, "actor_stats": stats,
                     "step": 0}, f)


def convert_unet_checkpoint(pt_path: str | Path, out_path: str | Path) -> None:
    """unet-nm.pt -> unet_denoiser.pkl. Requires torch (CPU) to unpickle."""
    import pickle

    import torch

    sd = torch.load(str(pt_path), map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = convert_unet_state_dict({k: v.numpy() for k, v in sd.items()})
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(params, f)
