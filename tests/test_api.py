"""One-call restoration API (tfpnp_tpu.api)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpnp_tpu.api import restore, restore_policy
from tfpnp_tpu.data.synthetic import random_images
from tfpnp_tpu.ops.metrics import psnr
from tfpnp_tpu.pnp.tv import TVDenoiser
from tfpnp_tpu.utils.options import Options

TASKS = [("csmri", "admm"), ("pr", "iadmm"), ("ct", "iadmm"), ("spi", "admm")]


def _data(task, solver, tmp_path, n=32, b=2):
    opt = Options().parse(["--task", task, "--solver", solver,
                           "--env_batch", str(b), "--image_size", str(n),
                           "--exp", "t", "--log_root", str(tmp_path)])
    mod = importlib.import_module(f"tfpnp_tpu.tasks.{task}")
    _, sample_data, _, _, _ = mod.build(opt, TVDenoiser(n_iter=2))
    return sample_data(jax.random.PRNGKey(0))


class TestRestore:
    @pytest.mark.parametrize("task,solver", TASKS)
    def test_classic_restore_improves(self, task, solver, tmp_path):
        d = _data(task, solver, tmp_path)
        tv = TVDenoiser(n_iter=3)
        out = restore(f"{task}_{solver}", d, denoiser=tv, iters=10)
        assert out.shape == d["gt"].shape
        p1 = float(psnr(out, d["gt"]).mean())
        assert np.isfinite(p1) and p1 > 15.0, p1

    def test_policy_restore_uses_shipped_actor(self, tmp_path):
        d = _data("spi", "admm", tmp_path)
        tv = TVDenoiser(n_iter=3)
        out = restore_policy("spi", "admm", d, denoiser=tv)
        classic = restore("spi_admm", d, denoiser=tv, iters=10)
        p_rl = float(psnr(out, d["gt"]).mean())
        p_cl = float(psnr(classic, d["gt"]).mean())
        assert p_rl > p_cl, (p_rl, p_cl)  # the trained policy must help

    def test_policy_restore_deblur_shipped_actor(self, tmp_path):
        """The beyond-reference deblur family ships a trained policy; the
        one-call API must load it by solver name and beat the classic
        schedule (same contract as the reference tasks above)."""
        from tfpnp_tpu.tasks import deblur as dtask
        kernels = jnp.asarray(dtask.kernel_bank())
        d = jax.jit(lambda k1, k2: dtask.make_data(
            k2, random_images(k1, 2, 64), kernels, sigma_list=(7.65,)))(
                jax.random.PRNGKey(30), jax.random.PRNGKey(31))
        tv = TVDenoiser(n_iter=3)
        out = restore_policy("deblur", "admm", d, denoiser=tv)
        assert out.shape == d["gt"].shape
        p_rl = float(psnr(out, d["gt"]).mean())
        p0 = float(psnr(d["x0"], d["gt"]).mean())
        assert np.isfinite(p_rl) and p_rl > p0, (p_rl, p0)

    def test_custom_variables_require_protocol(self, tmp_path):
        d = _data("spi", "admm", tmp_path)
        with pytest.raises(AssertionError, match="action_pack"):
            restore_policy("spi", "admm", d, variables={"params": {}},
                           denoiser=TVDenoiser(n_iter=1))

class TestEvalSetGrid:
    def test_csmri_eval_flag_expands_sigma_grid(self, tmp_path):
        """--eval expands CS-MRI eval sets to sigma in {5,10,15} x {x2,x4,x8}
        (reference tasks/csmri/main.py:82-90); training keeps sigma=15 only."""
        mod = importlib.import_module("tfpnp_tpu.tasks.csmri")
        base = ["--task", "csmri", "--solver", "admm", "--image_size", "32",
                "--exp", "t", "--log_root", str(tmp_path), "--mesh_dp", "1"]
        tv = TVDenoiser(n_iter=2)
        _, _, train_sets, _, _ = mod.build(Options().parse(base), tv)
        _, _, eval_sets, _, _ = mod.build(Options().parse(base + ["--eval"]), tv)
        assert sorted(train_sets) == [f"radial_32_{a}_15" for a in (2, 4, 8)]
        # --eval also appends the held-out natural anchor (data/natural.py)
        assert sorted(eval_sets) == sorted(
            [f"radial_32_{a}_{s}" for a in (2, 4, 8) for s in (10, 15, 5)]
            + ["natural_4_15"])


class TestMixedPrecisionDenoiser:
    def test_bf16_mixed_within_quality_gate(self):
        """--precision bf16 runs convs in bf16 with f32 params/residual
        (models/unet.py dtype); denoising PSNR must stay within 0.1 dB of
        f32 (bench.py's adoption gate)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from tfpnp_tpu.data.synthetic import random_images
        from tfpnp_tpu.pnp.denoiser import load_denoiser

        f32 = load_denoiser()
        bf16 = load_denoiser(compute_dtype=jnp.bfloat16)
        assert bf16.module.dtype == jnp.bfloat16
        key = jax.random.PRNGKey(0)
        gt = random_images(key, 4, 64)
        noisy = gt + (15 / 255.) * jax.random.normal(
            jax.random.fold_in(key, 1), gt.shape)
        sig = jnp.full((4,), 15 / 255.)
        d32 = jax.jit(lambda a, s: f32(a, s))(noisy, sig)
        d16 = jax.jit(lambda a, s: bf16(a, s))(noisy, sig)
        assert d16.dtype == jnp.float32  # output is f32 regardless

        def psnr(a, b):
            return -10 * jnp.log10(jnp.mean((a - b) ** 2, axis=(1, 2)))
        delta = float(np.asarray(psnr(d32, gt)).mean()
                      - np.asarray(psnr(d16, gt)).mean())
        assert abs(delta) < 0.1, f"bf16 quality gap {delta:.3f} dB"
