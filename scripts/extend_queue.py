#!/usr/bin/env python3
"""Extend round-3 retrain runs whose stop head hasn't opened yet.

Stopping emergence is family-dependent (the critic's v_next_late has to
reach ~0 before eval-argmax flips); runs that just miss the budget only
need a resume extension — final.pkl carries the replay ring + critic +
optimizers, so +1200 steps costs ~4-6 min with a warm compile cache.

Usage:
  python scripts/extend_queue.py EXP [EXP ...] [--extra 1200] [--ship]
where EXP is a logs/ run dir name, e.g. csmri_redadmm_5x6_48r3.
"""

import argparse
import json
import pickle
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))
from train_queue import COMMON, run_watched  # noqa: E402


def parse_exp(exp: str):
    """csmri_redadmm_5x6_48r3 -> (task, solver, scale, pack, ep, batch).

    The batch token is parsed from the name (not hardcoded to 48), so
    runs trained at other env_batch values extend correctly (advisor r3).
    """
    m = re.match(r"([a-z]+?)(\d)?_([a-z0-9]+)_(\d+)x(\d+)_(\d+)", exp)
    if not m:
        raise ValueError(f"unparseable exp {exp}")
    return (m.group(1), m.group(3), m.group(2), m.group(4), m.group(5),
            m.group(6))


def read_step(final: Path) -> int:
    """Resume step of a checkpoint, cheaply: the trainer writes a
    ``.meta.json`` sidecar next to every ``.pkl`` (orbax checkpoints
    carry ``meta.json`` inside the directory); only legacy checkpoints
    without one pay the full unpickle of the multi-GB replay ring."""
    side = final.with_suffix(".meta.json")
    if side.exists():
        return int(json.loads(side.read_text())["step"])
    if final.is_dir() and (final / "meta.json").exists():
        return int(json.loads((final / "meta.json").read_text())["step"])
    with open(final, "rb") as f:
        return int(pickle.load(f)["step"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exps", nargs="+")
    ap.add_argument("--extra", type=int, default=1200)
    ap.add_argument("--ship", action="store_true")
    ap.add_argument("--denoiser_ckpt",
                    default="tfpnp_tpu/pretrained/unet_s2d_denoiser.pkl")
    ap.add_argument("--lp", type=float, default=None,
                    help="loop-penalty override — MUST match the original "
                         "run's lp (e.g. the round-5 band retrains use "
                         "0.1) or the extension flips the objective "
                         "mid-run")
    args = ap.parse_args()

    for exp in args.exps:
        task, solver, scale, pack, ep, batch = parse_exp(exp)
        final = ROOT / "logs" / exp / "ckpt" / "final.pkl"
        if not final.exists():
            print(f"=== {exp}: no final.pkl, skipping ===", flush=True)
            continue
        step = read_step(final)
        target = int(step) + args.extra
        cmd = [sys.executable, "-m", "tfpnp_tpu", "--task", task,
               "--solver", solver, "--exp", exp,
               "--train_steps", str(target), "-r", str(final),
               "--denoiser_ckpt", args.denoiser_ckpt] + COMMON
        cmd += ["--action_pack", pack, "--max_episode_step", ep,
                "--env_batch", batch]
        if args.lp is not None:
            cmd += ["-lp", str(args.lp)]  # after COMMON: overrides 0.05
        if task == "sr" and scale:
            cmd += ["--scale", scale]
        print(f"=== extend {exp}: step {step} -> {target} ===", flush=True)
        rc = run_watched(cmd, ROOT / "logs" / exp / "log.txt", 2400.0)
        print(f"=== {exp} extension rc={rc} ===", flush=True)
        if rc == 0 and args.ship:
            best = ROOT / "logs" / exp / "ckpt" / "best.pkl"
            if best.exists():
                fam = task if not (task == "sr" and scale
                                   and scale != "2") else f"sr{scale}"
                subprocess.run([sys.executable, "scripts/ship_policy.py",
                                str(best), f"{fam}_{solver}_{pack}x{ep}"],
                               cwd=ROOT)


if __name__ == "__main__":
    main()
