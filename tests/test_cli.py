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
    is knowingly outside the reference band must say so at load time."""

    def test_explicit_override_wins(self):
        from tfpnp_tpu import pretrained
        pretrained.POLICY_STATUS["zz_test_5x6"] = "stopping: collapsed"
        try:
            assert pretrained.policy_status("zz_test_5x6") == \
                "stopping: collapsed"
        finally:
            del pretrained.POLICY_STATUS["zz_test_5x6"]

    def test_oracle_evidence_surfaced(self):
        """csmri_amp ships with a committed oracle curve
        (pretrained/stopping/csmri_amp_5x6.json); the status must report
        the oracle stopping point so `--eval` users learn the policy's
        behavior relative to it."""
        from tfpnp_tpu import pretrained
        s = pretrained.policy_status("csmri_amp_5x6")
        assert s is not None and "oracle" in s

    def test_nominal_policy_has_no_status(self):
        from tfpnp_tpu import pretrained
        # flagship stops in-band (release sweep); no note unless one of
        # its evidence files appears
        import pathlib
        stopping = pathlib.Path(pretrained.__file__).parent / "stopping"
        if not (stopping / "csmri_admm_5x6.json").exists() and \
                "csmri_admm_5x6" not in pretrained.POLICY_STATUS:
            assert pretrained.policy_status("csmri_admm_5x6") is None
