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


class TestWatchdog:
    def test_completing_command_passes_through(self, tmp_path):
        q = _load_queue()
        rc = q.run_watched(["true"], tmp_path / "log.txt", stall_timeout=5.0)
        assert rc == 0

    def test_silent_hang_is_terminated(self, tmp_path, monkeypatch):
        """A child whose log never advances must be SIGTERMed by its exact
        PID once the stall window passes (never pattern-killed)."""
        q = _load_queue()
        log = tmp_path / "log.txt"
        log.write_text("boot")
        # make the 60 s poll cadence test-fast
        orig_wait = q.subprocess.Popen.wait

        def fast_wait(self, timeout=None):
            return orig_wait(self, timeout=0.2 if timeout == 60 else timeout)
        monkeypatch.setattr(q.subprocess.Popen, "wait", fast_wait)
        t0 = time.time()
        os.utime(log, (t0 - 3600, t0 - 3600))  # log stale for an hour
        rc = q.run_watched(["sleep", "60"], log, stall_timeout=1.0)
        assert rc == 124
        assert time.time() - t0 < 30


class TestStoppingSummary:
    """eval_policies.stopping_summary: the computed ladder accounting
    (in band / evidenced-optimal via committed oracle curves /
    straggler) — VERDICT r4 #1c: zero hand tallies."""

    def _load(self):
        spec = importlib.util.spec_from_file_location(
            "eval_policies", ROOT / "scripts" / "eval_policies.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_bands_match_reference_rows(self):
        ep = self._load()
        assert ep.band_for("pr") == (1.0, 3.75)
        assert ep.band_for("spi") == (4.23, 9.77)   # advisor r4: 4.23
        assert ep.band_for("csmri") == ep.band_for("ct") == (1.0, 4.43)

    def test_classification(self, tmp_path):
        import json
        ep = self._load()
        # committed-evidence stand-ins
        (tmp_path / "a_pol_5x6.json").write_text(json.dumps(
            {"oracle_iters_mean": 5.1, "oracle_stop_psnr_cost_db": 0.005,
             "always_on_penalty_optimal": False}))
        (tmp_path / "b_pol_5x6.json").write_text(json.dumps(
            {"oracle_iters_mean": 5.8, "oracle_stop_psnr_cost_db": 0.4,
             "always_on_penalty_optimal": True}))
        rows = [
            {"task": "csmri", "policy": "in_pol_5x6_actor.pkl",
             "mean_iters": 2.5},                       # in band
            {"task": "sr", "policy": "a_pol_5x6_actor.pkl",
             "mean_iters": 5.0},   # oracle 5.1 > band 4.43, tracks it
            {"task": "inpaint", "policy": "b_pol_5x6_actor.pkl",
             "mean_iters": 6.0},   # always-on penalty-optimal
            {"task": "pr", "policy": "c_pol_5x6_actor.pkl",
             "mean_iters": 4.0},   # PR band <=3.75, no evidence
            {"task": "sr", "policy": "d_pol_5x6_actor.pkl",
             "mean_iters": 6.0},   # far from a_pol's oracle, no file
        ]
        s = ep.stopping_summary(rows, evidence_dir=tmp_path)
        assert s["in_reference_band"] == 1
        assert s["evidenced_optimal"] == 2
        assert s["in_band_or_evidenced"] == 3
        assert [t.split(":")[0] for t in s["stragglers"]] == \
            ["c_pol_5x6", "d_pol_5x6"]


class TestMergeEvalRows:
    """merge_eval_rows: partial re-evals fold into a sweep snapshot and
    the ladder is recomputed by the same module function (round 5)."""

    def test_merge_replaces_rows_and_recomputes(self, tmp_path, capsys):
        import json
        spec = importlib.util.spec_from_file_location(
            "merge_eval_rows", ROOT / "scripts" / "merge_eval_rows.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        snap = tmp_path / "snap.json"
        snap.write_text(json.dumps({"rows": [
            {"policy": "aa_admm_5x6_actor.pkl", "task": "csmri",
             "mean_iters": 6.0, "mean_psnr": 30.0},
            {"policy": "bb_hqs_5x6_actor.pkl", "task": "csmri",
             "mean_iters": 2.0, "mean_psnr": 31.0}],
            "stopping_summary": {}}))
        part = tmp_path / "part.json"
        part.write_text(json.dumps({"rows": [
            {"policy": "aa_admm_5x6_actor.pkl", "task": "csmri",
             "mean_iters": 3.0, "mean_psnr": 30.1}]}))

        import sys
        import unittest.mock as um
        reg = tmp_path / "summary.json"
        with um.patch.object(sys, "argv",
                             ["merge", str(snap), str(part)]), \
             um.patch.object(mod, "write_registry_summary",
                             lambda s, out=None: reg):
            mod.main()

        merged = json.loads(snap.read_text())
        by = {r["policy"]: r for r in merged["rows"]}
        assert by["aa_admm_5x6_actor.pkl"]["mean_iters"] == 3.0   # replaced
        assert by["bb_hqs_5x6_actor.pkl"]["mean_iters"] == 2.0    # kept
        s = merged["stopping_summary"]
        assert s["in_reference_band"] == 2 and s["total"] == 2
