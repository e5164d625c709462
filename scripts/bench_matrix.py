#!/usr/bin/env python3
"""Perf matrix for the flagship iteration: precision x FFT backend.

Prints iter/s and restoration PSNR for each config so RESULTS.md can
attribute the headline number. ONE TPU process; run alone.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROBE = r"""
import json, sys
sys.path.insert(0, {root!r})
import bench
its, q = bench.bench_tpu({prec!r})
print("RESULT " + json.dumps({{"fft": {fft!r}, "precision": {prec!r},
                               "iter_s": round(its, 1), "psnr": round(q, 2)}}))
"""


def main():
    for fft in ("matmul", "xla"):
        for prec in ("f32", "bf16"):
            env = dict(os.environ, TFPNP_FFT=fft)
            code = PROBE.format(root=str(ROOT), prec=prec, fft=fft)
            r = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                               env=env, capture_output=True, text=True)
            for line in r.stdout.splitlines():
                if line.startswith("RESULT "):
                    print(line[7:], flush=True)
                    break
            else:
                print(json.dumps({"fft": fft, "precision": prec,
                                  "error": r.stderr.strip()[-300:]}), flush=True)


if __name__ == "__main__":
    main()
