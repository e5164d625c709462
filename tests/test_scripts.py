"""Operational script helpers: the training queue's crash-resume probe.

A previous queue probed only final.pkl — which a crashed run never
writes — so retries silently retrained from scratch. Lock the newest-
checkpoint probe instead.
"""

import importlib.util
import os
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load_queue():
    spec = importlib.util.spec_from_file_location(
        "train_queue", ROOT / "scripts" / "train_queue.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestNewestCheckpoint:
    def test_prefers_latest_partial_checkpoint(self, tmp_path, monkeypatch):
        q = _load_queue()
        monkeypatch.setattr(q, "ROOT", tmp_path)
        ck = tmp_path / "logs" / "exp1" / "ckpt"
        ck.mkdir(parents=True)
        for i, name in enumerate(["best.pkl", "step_0000301.pkl",
                                  "interrupted.pkl"]):
            p = ck / name
            p.write_bytes(b"x")
            t = time.time() - 100 + i
            os.utime(p, (t, t))
        # final.pkl must NOT be considered (it only exists after success)
        f = ck / "final.pkl"
        f.write_bytes(b"x")
        got = q.newest_checkpoint("exp1")
        assert got is not None and got.name == "interrupted.pkl"

    def test_none_when_no_run_dir(self, tmp_path, monkeypatch):
        q = _load_queue()
        monkeypatch.setattr(q, "ROOT", tmp_path)
        assert q.newest_checkpoint("nope") is None
