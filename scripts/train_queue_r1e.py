#!/usr/bin/env python3
"""Session training queue #3: deblur_admm (post-stabilization, fresh run),
then sr_admm x2, then bench.py. ONE TPU process at a time; retries wait
out chip-wedge windows (CLAUDE.md).

Usage: python scripts/train_queue_r1e.py
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
    ("deblur_admm", [sys.executable, "-m", "tfpnp_tpu", "--task", "deblur",
                     "--solver", "admm", "--exp", "deblur_admm_5x6_48",
                     "--train_steps", "2400"] + COMMON),
    ("sr_admm", [sys.executable, "-m", "tfpnp_tpu", "--task", "sr",
                 "--solver", "admm", "--scale", "2",
                 "--exp", "sr_admm_5x6_48", "--train_steps", "2400"] + COMMON),
    ("bench", [sys.executable, "bench.py"]),
]


def main():
    for name, cmd in JOBS:
        for attempt in (1, 2, 3):
            print(f"=== {name} attempt {attempt} ===", flush=True)
            rc = subprocess.run(cmd, cwd=ROOT).returncode
            if rc == 0:
                print(f"=== {name} OK ===", flush=True)
                break
            print(f"=== {name} rc={rc}; cooling down 300s ===", flush=True)
            time.sleep(300)
            ckpt = ROOT / f"logs/{name}_5x6_48/ckpt/final.pkl"
            if ckpt.exists() and "-r" not in cmd:
                cmd = cmd + ["-r", str(ckpt)]
        else:
            print(f"=== {name} FAILED ===", flush=True)
    print("=== queue complete ===", flush=True)


if __name__ == "__main__":
    main()
