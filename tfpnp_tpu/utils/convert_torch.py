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

__all__ = ["convert_unet_state_dict", "convert_unet_checkpoint"]


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
