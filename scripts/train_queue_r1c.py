#!/usr/bin/env python3
"""Session training queue: resume ct_pg to 1800 steps, then train
deblur_admm 2400 steps. ONE TPU process at a time (CLAUDE.md); each
attempt retries through chip-wedge windows with a cooldown.

Usage: python scripts/train_queue_r1c.py
"""

import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

COMMON = ["--env_batch", "48", "--rmsize", "480", "--warmup", "20",
          "--max_episode_step", "6", "--action_pack", "5",
          "--episode_train_times", "10", "--validate_interval", "50",
          "--save_freq", "300", "-lp", "0.05", "-le", "0.2"]

JOBS = [
    ("ct_pg", [sys.executable, "-m", "tfpnp_tpu", "--task", "ct",
               "--solver", "pg", "--exp", "ct_pg_5x6_48",
               "--train_steps", "1800",
               "-r", "logs/ct_pg_5x6_48/ckpt/interrupted.pkl"] + COMMON),
    ("deblur_admm", [sys.executable, "-m", "tfpnp_tpu", "--task", "deblur",
                     "--solver", "admm", "--exp", "deblur_admm_5x6_48",
                     "--train_steps", "2400"] + COMMON),
]


def main():
    for name, cmd in JOBS:
        for attempt in (1, 2, 3):
            print(f"=== {name} attempt {attempt} ===", flush=True)
            rc = subprocess.run(cmd, cwd=ROOT).returncode
            if rc == 0:
                print(f"=== {name} OK ===", flush=True)
                break
            print(f"=== {name} rc={rc}; cooling down 240s ===", flush=True)
            # a crashed TPU process can wedge the chip for ~5-10 min
            time.sleep(240)
            # resume from whatever landed if the first attempt got far
            ckpt = ROOT / f"logs/{name}_5x6_48/ckpt/final.pkl"
            if ckpt.exists() and "-r" not in cmd:
                cmd = cmd + ["-r", str(ckpt)]
        else:
            print(f"=== {name} FAILED ===", flush=True)
    print("=== queue complete ===", flush=True)


if __name__ == "__main__":
    main()
