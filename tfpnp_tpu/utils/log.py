"""Logging: colored stdout + log.txt + structured JSONL metrics.

Re-design of /root/reference/tfpnp/utils/log.py (ANSI logger) plus the
trainer's tensorboardX scalars (trainer.py:41,104-106) — scalars go to a
machine-readable ``metrics.jsonl`` (and tensorboardX when available).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

__all__ = ["Logger", "COLOR"]


class COLOR:
    RED = "\033[31m"
    GREEN = "\033[32m"
    YELLOW = "\033[33m"
    BLUE = "\033[34m"
    END = "\033[0m"


class Logger:
    def __init__(self, log_dir: str | Path, enable_tensorboard: bool = False):
        self.log_dir = str(log_dir)
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        self._txt = Path(log_dir) / "log.txt"
        self._jsonl = Path(log_dir) / "metrics.jsonl"
        self._tb = None
        if enable_tensorboard:
            try:
                from tensorboardX import SummaryWriter
            except ImportError:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                except ImportError:
                    SummaryWriter = None
            if SummaryWriter is not None:
                self._tb = SummaryWriter(str(Path(log_dir) / "tb"))

    def log(self, msg: str, color: str | None = None):
        stamp = time.strftime("%m-%d %H:%M:%S")
        line = f"[{stamp}] {msg}"
        print(f"{color}{line}{COLOR.END}" if color else line, flush=True)
        with open(self._txt, "a") as f:
            f.write(line + "\n")

    def scalars(self, step: int, values: dict):
        rec = {"step": step, "time": time.time(), **values}
        with open(self._jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in values.items():
                try:
                    self._tb.add_scalar(f"train/{k}", v, step)
                except Exception:
                    pass
