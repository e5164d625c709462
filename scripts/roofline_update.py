#!/usr/bin/env python3
"""Roofline the MDDPG update phase (VERDICT r4 #7).

The flagship trains at ~1.05 s/episode: rollout 0.16 s + 10 fused
updates 0.88 s. The denoiser *forward* was attributed in round 4
(scripts/roofline_s2d.py); this probe attributes the update phase the
same way: measure the fused `_update_many` program (all
episode_train_times minibatches in one executable — large enough to
time truthfully on the tunneled runtime, CLAUDE.md rule 7) and compare
against XLA's own cost model for the compiled program
(`compiled.cost_analysis()`: FLOPs + bytes accessed).

Per update the program runs: actor fwd (+bwd) through the
differentiable env re-simulation (solver bundle incl. denoiser fwd+bwd),
two critic applies + target apply, critic bwd, and two Adam steps. If
measured time is >=2x the compute bound there is easy headline room; if
not, the update phase is compute-bound and the topic is closed.

Run on the real chip (exclusive): python scripts/roofline_update.py
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_BF16 = 197e12    # v5e MXU peak, bf16
PEAK_F32 = PEAK_BF16 / 4   # f32 matmuls pass the MXU at ~1/4 rate
PEAK_HBM = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--precision", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--denoiser_ckpt",
                    default="tfpnp_tpu/pretrained/unet_s2d_denoiser.pkl")
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(".jax_cache").resolve()))

    from tfpnp_tpu.models.actor import actor_spec_for
    from tfpnp_tpu.pnp.denoiser import load_denoiser
    from tfpnp_tpu.rl.trainer import MDDPGTrainer, TrainConfig
    from tfpnp_tpu.utils.options import Options

    opt = Options().parse(
        ["--task", "csmri", "--solver", "admm", "--exp", "roofline_update",
         "--log_root", "logs/roofline", "--env_batch", "48", "--rmsize",
         "480", "--max_episode_step", "6", "--action_pack", "5",
         "--episode_train_times", "10", "--precision", args.precision,
         "--denoiser_ckpt", args.denoiser_ckpt])
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    denoiser = load_denoiser(opt.denoiser_ckpt, compute_dtype=dtype)
    task = importlib.import_module("tfpnp_tpu.tasks.csmri")
    env, sample_data, _, solver_name, lr_schedule = task.build(opt, denoiser)
    ranges, actor = actor_spec_for(solver_name, opt.action_pack)
    cfg = TrainConfig(train_steps=60, env_batch=48, max_episode_step=6,
                      action_pack=5, rmsize=480, warmup=0,
                      episode_train_times=10, replay_backend="device")
    tr = MDDPGTrainer(cfg, env, actor, ranges, sample_data, lr_schedule,
                      evaluator=None, log_dir="logs/roofline/update")
    assert tr._fused_updates, "device replay required for the fused phase"

    # seed the ring with two episodes of real experience
    key = jax.random.PRNGKey(0)
    for i in range(2):
        key, k1, k2 = jax.random.split(key, 3)
        tr.collect_episode(k1, k2)
    print(f"ring: {tr.buffer.size} rows", flush=True)

    k_times = cfg.episode_train_times
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.stack([
        rng.choice(tr.buffer.size, size=cfg.env_batch)
        for _ in range(k_times)]), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(1), k_times)
    lr = dict(lr_schedule(1))
    carry = (tr.actor_params, tr.actor_stats, tr.critic_params,
             tr.target_params, tr.actor_opt, tr.critic_opt)

    # XLA's own cost model for the whole fused program. NOTE: donation in
    # tr._update_many would invalidate `carry` for the timing loop, so
    # analyze a separate non-donating jit of the same impl.
    lowered = jax.jit(tr._update_many_impl).lower(
        *carry, tr.buffer._storage, idx, keys, lr["actor"], lr["critic"])
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    bytes_hbm = float(cost.get("bytes accessed", float("nan")))

    # fenced timing of the donating executable the trainer actually runs:
    # params update in place each rep, so no two calls are elidable
    out = tr._update_many(*carry, tr.buffer._storage, idx, keys,
                          lr["actor"], lr["critic"])
    jax.block_until_ready(out)
    carry, metrics = out[:-1], out[-1]
    t0 = time.time()
    for _ in range(args.reps):
        out = tr._update_many(*carry, tr.buffer._storage, idx, keys,
                              lr["actor"], lr["critic"])
        carry, metrics = out[:-1], out[-1]
    float(jax.device_get(metrics["critic_loss"]))  # scalar d2h fence
    dt = (time.time() - t0) / args.reps

    peak = PEAK_BF16 if args.precision == "bf16" else PEAK_F32
    t_compute = flops / peak
    t_bytes = bytes_hbm / PEAK_HBM
    report = {
        "precision": args.precision,
        "updates_per_program": k_times,
        "measured_s": round(dt, 4),
        "xla_flops": flops,
        "xla_bytes_accessed": bytes_hbm,
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "compute_bound_s": round(t_compute, 4),
        "hbm_bound_s": round(t_bytes, 4),
        "x_over_compute_bound": round(dt / t_compute, 2),
        "x_over_hbm_bound": round(dt / t_bytes, 2),
        "verdict": ("compute-bound (within 2x of the MXU bound: no easy "
                    "headline room)" if dt < 2 * t_compute else
                    "NOT compute-bound: attribution needed"),
    }
    print(json.dumps(report, indent=1))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
