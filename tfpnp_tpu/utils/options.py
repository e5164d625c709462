"""CLI options — mirrors the reference's single argparse namespace
(/root/reference/tfpnp/utils/options.py:8-61), plus TPU-native flags
(--mesh_dp for data-parallel width, --image_size, --denoiser_ckpt)."""

from __future__ import annotations

import argparse
import random

import numpy as np

__all__ = ["Options"]


class Options:
    def __init__(self):
        p = argparse.ArgumentParser(
            description="tfpnp_tpu: tuning-free plug-and-play proximal algorithm (TPU)")
        p.add_argument("--task", default="csmri",
                       choices=["csmri", "pr", "ct", "spi", "deblur", "sr",
                                "inpaint"],
                       help="inverse problem")
        p.add_argument("--scale", default=2, type=int, choices=[2, 3, 4],
                       help="super-resolution factor (sr task only)")
        p.add_argument("--exp", default="csmri_admm_5x6_48", type=str)
        p.add_argument("--warmup", default=20, type=int,
                       help="episodes that only fill the replay memory")
        p.add_argument("--actor_warmup", default=0, type=int,
                       help="episodes after warmup trained critic-only "
                            "(actor lr 0); pairs with --init_actor so the "
                            "fresh critic converges before the donor "
                            "policy is touched")
        p.add_argument("--discount", default=0.99, type=float)
        p.add_argument("--rmsize", default=480, type=int)
        p.add_argument("--env_batch", default=48, type=int)
        p.add_argument("--tau", default=0.001, type=float)
        p.add_argument("--max_episode_step", default=6, type=int)
        p.add_argument("--train_steps", default=15000, type=int)
        p.add_argument("--validate_interval", default=50, type=int)
        p.add_argument("--save_freq", default=1000, type=int)
        p.add_argument("--episode_train_times", default=10, type=int)
        p.add_argument("--resume", "-r", default=None, type=str)
        p.add_argument("--resume_step", "-rs", default=None, type=int)
        p.add_argument("--init_actor", default=None, type=str,
                       help="warm-start ONLY the actor from a shipped policy "
                            "('auto' = this solver's registry entry, or a "
                            "registry name / actor-pickle path); critic, "
                            "optimizers and step start fresh. Used to "
                            "transfer a converged policy onto new trainer "
                            "machinery (e.g. the stop-head retrains) at a "
                            "fraction of from-scratch steps")
        p.add_argument("--eval", action="store_true")
        p.add_argument("--seed", default=1234, type=int)
        p.add_argument("--loop_penalty", "-lp", type=float, default=0.05)
        p.add_argument("--action_pack", "-ap", type=int, default=5)
        p.add_argument("--lambda_e", "-le", type=float, default=0.05)
        p.add_argument("--stop_grad", type=str, default="exact",
                       choices=["exact", "reinforce"],
                       help="stop-head gradient: exact two-action policy "
                            "gradient (default) or the reference's "
                            "single-sample REINFORCE (rl/trainer.py)")
        p.add_argument("--mc_weight", type=float, default=0.5,
                       help="Monte-Carlo return-to-go weight in the critic "
                            "loss (0 = reference 1-step bootstrap)")
        p.add_argument("--no_advantage_norm", action="store_true",
                       help="disable A2C advantage normalization (the "
                            "stop head then collapses to always-continue "
                            "at this reward scale; see rl/trainer.py)")
        p.add_argument("--no_terminal_mask", action="store_true",
                       help="bootstrap V past the episode cap like the "
                            "reference (trainer.py:182-185)")
        p.add_argument("--reset_best", action="store_true",
                       help="on --resume, restart best-checkpoint selection "
                            "(use when the eval score semantics changed)")
        p.add_argument("--keep_ckpts", type=int, default=3,
                       help="periodic step checkpoints kept on disk "
                            "(they carry the replay ring)")
        p.add_argument("--denoiser", type=str, default="unet",
                       choices=["unet", "tv"], help="prior (tv needs no weights)")
        p.add_argument("--denoiser_ckpt", type=str, default=None)
        p.add_argument("--precision", type=str, default="f32",
                       choices=["f32", "bf16"],
                       help="denoiser conv compute dtype (bf16 = MXU-native)")
        p.add_argument("--replay", type=str, default="device",
                       choices=["device", "native", "host"],
                       help="replay ring backend (device = HBM-resident)")
        p.add_argument("--ckpt_backend", type=str, default="pickle",
                       choices=["pickle", "orbax"],
                       help="checkpoint format (orbax = sharded dir, "
                            "multi-host-safe)")
        p.add_argument("--solver", type=str, default="admm")
        p.add_argument("--image_size", type=int, default=128)
        p.add_argument("--mesh_dp", type=int, default=None,
                       help="data-parallel mesh width (default: all devices)")
        p.add_argument("--log_root", type=str, default="logs")
        p.add_argument("--data_root", type=str, default=None,
                       help="folder of training images (default: procedural corpus)")
        p.add_argument("--eval_data", action="append", default=None,
                       metavar="NAME=PATH.npz",
                       help="evaluate on converted reference sets instead of "
                            "the synthetic protocol (repeatable; see "
                            "scripts/convert_reference_data.py)")
        p.add_argument("--profile", action="store_true",
                       help="write jax.profiler traces under <output>/trace")
        p.add_argument("--tensorboard", action="store_true",
                       help="also write TensorBoard event files under <output>/tb")
        p.add_argument("--no_compile_cache", action="store_true")
        p.add_argument("--debug", action="store_true")
        self.parser = p

    def parse(self, argv=None):
        opt = self.parser.parse_args(argv)
        random.seed(opt.seed)
        np.random.seed(opt.seed)
        opt.output = f"{opt.log_root}/{opt.exp}"
        if not opt.no_compile_cache:
            # persistent XLA compile cache: first compile of the episode
            # scan is tens of seconds on TPU, subsequent runs are instant
            import os

            import jax
            cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   str(__import__("pathlib").Path(".jax_cache").resolve()))
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return opt
