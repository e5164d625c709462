"""CLI end-to-end: train a few steps, eval a checkpoint, artifacts exist."""

import json
from pathlib import Path

import pytest


class TestCLI:
    @pytest.fixture()
    def run_dir(self, tmp_path):
        from tfpnp_tpu.cli import main
        main(["--task", "csmri", "--solver", "admm", "--denoiser", "tv",
              "--exp", "t", "--log_root", str(tmp_path),
              "--env_batch", "2", "--rmsize", "4", "--warmup", "1",
              "--train_steps", "6", "--max_episode_step", "2",
              "--action_pack", "1", "--episode_train_times", "1",
              "--validate_interval", "1000000", "--save_freq", "1000000",
              "--image_size", "32", "--mesh_dp", "1"])
        return tmp_path / "t"

    def test_train_then_eval(self, tmp_path, run_dir):
        from tfpnp_tpu.cli import main
        ckpt = run_dir / "ckpt" / "final.pkl"
        assert ckpt.exists()
        # metrics.jsonl has per-episode scalars
        lines = (run_dir / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) >= 3
        rec = json.loads(lines[-1])
        assert "psnr" in rec and "acc_reward" in rec

        main(["--task", "csmri", "--solver", "admm", "--denoiser", "tv",
              "--exp", "t", "--log_root", str(tmp_path), "--eval",
              "-r", str(ckpt), "--max_episode_step", "2",
              "--action_pack", "1", "--image_size", "32", "--mesh_dp", "1"])
        arts = list((run_dir / "eval_results").rglob("action_seqs.json"))
        assert arts, "eval artifacts missing"


class TestPretrainedRegistry:
    def test_registry_lists_and_resolves(self):
        from tfpnp_tpu import pretrained
        names = pretrained.available_policies()
        assert "csmri_admm_5x6_actor.pkl" in names
        assert pretrained.policy_path("csmri", "admm").name == \
            "csmri_admm_5x6_actor.pkl"
        assert pretrained.policy_path("csmri", "nope") is None

    def test_load_policy_variables(self):
        from tfpnp_tpu import pretrained
        variables = pretrained.load_policy("spi", "admm")
        assert set(variables) == {"params", "batch_stats"}

    def test_unknown_policy_raises(self):
        import pytest as _pytest
        from tfpnp_tpu import pretrained
        with _pytest.raises(FileNotFoundError, match="available"):
            pretrained.load_policy("csmri", "nope")

    def test_eval_falls_back_to_shipped_policy(self, tmp_path):
        """--eval with no --resume uses the shipped (task, solver) actor.

        Uses the real shipped CS-MRI policy on a tiny eval set; the actor
        is resolution-agnostic (global pooling) so 32^2 images work."""
        from tfpnp_tpu.cli import main
        main(["--task", "csmri", "--solver", "admm", "--denoiser", "tv",
              "--exp", "t2", "--log_root", str(tmp_path), "--eval",
              "--max_episode_step", "2", "--action_pack", "5",
              "--image_size", "32", "--mesh_dp", "1"])
        arts = list((tmp_path / "t2" / "eval_results").rglob("action_seqs.json"))
        assert arts, "eval artifacts missing"


class TestPolicyStatus:
    """Ship-registry honesty (VERDICT r4 #5): a checkpoint whose stopping
    is knowingly outside the reference band must say so at load time;
    precedence = explicit POLICY_STATUS > sweep summary.json > raw
    oracle-evidence file > None (nominal)."""

    def _tmp_dir(self, monkeypatch, tmp_path):
        from tfpnp_tpu import pretrained
        (tmp_path / "stopping").mkdir()
        monkeypatch.setattr(pretrained, "_DIR", tmp_path)
        return pretrained

    def test_explicit_override_wins(self, monkeypatch, tmp_path):
        import json
        pretrained = self._tmp_dir(monkeypatch, tmp_path)
        (tmp_path / "stopping" / "summary.json").write_text(
            json.dumps({"zz_test_5x6": "from summary"}))
        monkeypatch.setitem(pretrained.POLICY_STATUS, "zz_test_5x6",
                            "stopping: collapsed")
        assert pretrained.policy_status("zz_test_5x6") == \
            "stopping: collapsed"

    def test_sweep_summary_beats_raw_evidence(self, monkeypatch, tmp_path):
        import json
        pretrained = self._tmp_dir(monkeypatch, tmp_path)
        (tmp_path / "stopping" / "aa_pol_5x6.json").write_text(json.dumps(
            {"oracle_iters_mean": 3.6, "oracle_stop_psnr_cost_db": -0.03,
             "always_on_penalty_optimal": False}))
        # no summary yet: the raw evidence note surfaces
        s = pretrained.policy_status("aa_pol_5x6")
        assert s is not None and "oracle" in s
        # a sweep that found the (retrained) policy in band silences it
        (tmp_path / "stopping" / "summary.json").write_text(
            json.dumps({"aa_pol_5x6": None}))
        assert pretrained.policy_status("aa_pol_5x6") is None
        # and a straggler verdict surfaces the warning
        (tmp_path / "stopping" / "summary.json").write_text(
            json.dumps({"aa_pol_5x6": "stops outside the reference band"}))
        assert "outside" in pretrained.policy_status("aa_pol_5x6")

    def test_nominal_policy_has_no_status(self, monkeypatch, tmp_path):
        pretrained = self._tmp_dir(monkeypatch, tmp_path)
        assert pretrained.policy_status("bb_pol_5x6") is None

    def test_shipped_registry_consistent(self):
        """Whatever the CURRENT shipped state is, policy_status must
        resolve without raising for every shipped policy."""
        from tfpnp_tpu import pretrained
        for f in pretrained.available_policies():
            pretrained.policy_status(f)  # no exception
