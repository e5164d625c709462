#!/usr/bin/env python3
"""Extract the actor subset of a trainer checkpoint into the shipped
policy registry (tfpnp_tpu/pretrained/{task}_{solver}_{pack}x{steps}_actor.pkl).

The reference distributes whole-training pickles as external downloads;
here the shipped artifact is just what --eval needs: actor params +
batch stats (pretrained/__init__.py:load_policy).

Usage: python scripts/ship_policy.py logs/csmri_redadmm_5x6_48/ckpt/best.pkl \
           csmri_redadmm_5x6
"""

import pickle
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    src, name = Path(sys.argv[1]), sys.argv[2]
    with open(src, "rb") as f:
        state = pickle.load(f)
    out = ROOT / "tfpnp_tpu" / "pretrained" / f"{name}_actor.pkl"
    slim = {"step": state["step"],
            "actor_params": state["actor_params"],
            "actor_stats": state["actor_stats"]}
    with open(out, "wb") as f:
        pickle.dump(slim, f)
    print(f"shipped {src} (step {state['step']}) -> {out} "
          f"({out.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
