#!/usr/bin/env python3
"""Report learned-stopping status of the round-3 retrain runs.

Scans logs/*r3*/log.txt, takes each run's LAST validation block, and
prints mean eval iters + PSNR per run — the quick answer to "which
retrains still run every step and need a resume extension"
(python scripts/train_queue.py wouldn't know; stopping emergence is
family-dependent).

Usage: python scripts/check_stopping.py [--suffix r3] [--max_iters 5.0]
Exit code 1 if any run's mean iters exceeds --max_iters.
"""

import argparse
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def last_eval_block(log: Path):
    """[(set, iters, psnr)] of the last Step_ block in the log."""
    rows = []
    pat = re.compile(r"Step_(\d+): (\S+) \| iters: ([\d.]+) \| .*"
                     r"psnr: ([\d.]+)")
    for line in log.read_text().splitlines():
        line = re.sub(r"\x1b\[[0-9;]*m", "", line)
        m = pat.search(line)
        if m:
            rows.append((int(m.group(1)), m.group(2),
                         float(m.group(3)), float(m.group(4))))
    if not rows:
        return None
    last_step = max(r[0] for r in rows)
    return [(s, i, p) for st, s, i, p in rows if st == last_step]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="r3")
    ap.add_argument("--max_iters", type=float, default=5.0,
                    help="mean-iters threshold above which a run counts "
                         "as not-stopping")
    args = ap.parse_args()

    bad = []
    for d in sorted(ROOT.glob(f"logs/*{args.suffix}*")):
        log = d / "log.txt"
        if not log.is_file():
            continue
        block = last_eval_block(log)
        if not block:
            print(f"{d.name}: no eval yet")
            continue
        mean_iters = sum(i for _, i, _ in block) / len(block)
        mean_psnr = sum(p for _, _, p in block) / len(block)
        flag = "  <-- still always-on" if mean_iters > args.max_iters else ""
        print(f"{d.name}: iters {mean_iters:.2f} | psnr {mean_psnr:.2f}"
              f"{flag}")
        if mean_iters > args.max_iters:
            bad.append(d.name)
    if bad:
        print("\nextend these (resume final.pkl with more steps):",
              ", ".join(bad))
        sys.exit(1)


if __name__ == "__main__":
    main()
