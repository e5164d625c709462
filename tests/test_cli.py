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
