#!/usr/bin/env python3
"""Diagnose learned early stopping (VERDICT r1 weak #1).

For a shipped policy, runs the full max_episode_step episode with
stopping DISABLED and records, per eval set:
  - per-step batch-mean PSNR (the marginal value of each extra bundle)
  - the policy's stop probability at each step
  - per-image step index after which the remaining gain is < threshold
    (the oracle stopping point)

This separates two hypotheses for "iters 6.0" in RESULTS.md:
  (a) continuing genuinely pays on this data (marginal gain > loop_penalty
      at every step) -> always-6 is the RL-optimal policy;
  (b) gains plateau early but the stop head never learned -> training bug.

CPU by default (chip stays free). Usage:
  python scripts/diag_stopping.py [--policy csmri_admm] [--size 128]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# unconditional: the session environment pins JAX_PLATFORMS to the
# tunneled TPU, so setdefault would silently land this CPU probe on the
# exclusive chip next to a live training job (CLAUDE.md rule 1)
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", default="csmri_admm")
    ap.add_argument("--ckpt", default=None,
                    help="evaluate a raw checkpoint file instead of the "
                         "shipped registry policy")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--denoiser_ckpt", default=None,
                    help="prior checkpoint; pass the s2d prior to match "
                         "the release-sweep protocol (eval_policies.py)")
    ap.add_argument("--json_out", default=None,
                    help="write the per-set report + summary as JSON "
                         "(committed as oracle-curve evidence for "
                         "always-6 policies, VERDICT r4 #1c)")
    ap.add_argument("--threshold", type=float, default=0.05,
                    help="remaining-gain threshold (= loop_penalty)")
    ap.add_argument("--gt", default="procedural",
                    choices=["procedural", "noise", "natural"],
                    help="eval gt source: the training-distribution "
                         "procedural corpus, OUT-OF-DISTRIBUTION uniform "
                         "noise (the stop head's known failure mode), or "
                         "the bundled natural anchors")
    args = ap.parse_args()

    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfpnp_tpu import pretrained
    from tfpnp_tpu.models.actor import actor_spec_for, policy_apply
    from tfpnp_tpu.pnp.denoiser import load_denoiser
    from tfpnp_tpu.utils.options import Options

    task_name, solver = args.policy.split("_", 1)
    extra = []
    if task_name[-1].isdigit():  # scale-suffixed SR families (sr3, sr4)
        extra = ["--scale", task_name[-1]]
        task_name = task_name[:-1]
    opt = Options().parse(
        ["--task", task_name, "--solver", solver, "--exp", "diag_stop",
         "--log_root", "logs/diag", "--image_size", str(args.size),
         "--mesh_dp", "1", "--eval"] + extra)  # --eval: include the held-out
    # natural anchor the release sweep scores (tasks/*.py build)
    task = importlib.import_module(f"tfpnp_tpu.tasks.{task_name}")
    denoiser = load_denoiser(args.denoiser_ckpt)
    env, _, eval_sets, solver_name, _ = task.build(opt, denoiser)
    if args.gt != "procedural":
        # out-of-corpus probe (csmri protocol): same masks/sigma, gt
        # swapped for uniform noise / natural anchors — characterizes the
        # stop head's off-distribution behavior (RESULTS.md
        # "Off-distribution stopping")
        assert task_name == "csmri", "--gt override is a csmri-only probe"
        n = args.size
        if args.gt == "noise":
            gt = jax.random.uniform(jax.random.PRNGKey(42), (7, n, n))
        else:
            from tfpnp_tpu.data.natural import natural_images
            gt = jnp.asarray(natural_images(7, n))
        from tfpnp_tpu.tasks.csmri import make_data, radial_mask
        masks = jnp.asarray(np.stack([radial_mask(n, a) for a in (2, 4, 8)]))
        mk = jax.jit(lambda k, g, m: make_data(k, g, m, sigma_list=(15.0,)))
        eval_sets = {
            f"{args.gt}_radial_{n}_{a}_15": mk(
                jax.random.PRNGKey(50 + i), gt, masks[i:i + 1])
            for i, a in enumerate((2, 4, 8))}
    ranges, actor = actor_spec_for(solver_name, opt.action_pack)
    if args.ckpt:
        from tfpnp_tpu.utils.checkpoint import load_state
        state = load_state(args.ckpt)
        variables = {"params": state["actor_params"],
                     "batch_stats": state["actor_stats"]}
    else:
        variables = pretrained.load_policy(solver_name)
    variables = jax.tree.map(jnp.asarray, variables)

    n_steps = env.max_episode_step

    @jax.jit
    def forced_episode(variables, data):
        state = env.reset(data)
        psnr0 = state["last_psnr"]

        def step_fn(state, _):
            obs = env.observe(state)
            action, _, entropy, _ = policy_apply(
                actor, variables, obs, ranges, stochastic=False,
                use_running_average=True)
            p_stop = action["p_stop"]
            action = dict(action)
            action["idx_stop"] = jnp.zeros_like(action["idx_stop"])  # force run
            state, reward, _, _ = env.step(state, action, jax.random.PRNGKey(0))
            return state, (state["last_psnr"], p_stop)

        state, (psnr_seq, p_stop_seq) = jax.lax.scan(
            step_fn, state, jnp.arange(n_steps))
        return psnr0, psnr_seq, p_stop_seq

    report = {}
    for name, data in eval_sets.items():
        psnr0, psnr_seq, p_stop = jax.device_get(
            forced_episode(variables, data))
        psnr_all = np.concatenate([psnr0[None], psnr_seq], 0)  # [T+1, B]
        marg = np.diff(psnr_all, axis=0)                        # [T, B]
        final = psnr_all[-1]
        # oracle stop: first step t such that final - psnr_all[t] < thr
        remaining = final[None] - psnr_all                      # [T+1, B]
        oracle = np.argmax(remaining < args.threshold, axis=0)  # [B]
        report[name] = {
            "psnr_mean": [round(float(x), 3) for x in psnr_all.mean(1)],
            "marginal_gain_mean": [round(float(x), 3) for x in marg.mean(1)],
            "marginal_gain_max": [round(float(x), 3) for x in marg.max(1)],
            "p_stop_mean": [round(float(x), 3) for x in p_stop.mean(1)],
            "oracle_iters_mean": round(float(oracle.mean()), 2),
            "oracle_psnr_mean": round(float(
                psnr_all[oracle, np.arange(psnr_all.shape[1])].mean()), 3),
            "full_psnr_mean": round(float(final.mean()), 3),
        }
        print(name, json.dumps(report[name], indent=1))

    # summary: is (b) plausible?
    om = np.mean([r["oracle_iters_mean"] for r in report.values()])
    cost = np.mean([r["full_psnr_mean"] - r["oracle_psnr_mean"]
                    for r in report.values()])
    print(f"\noracle mean iters {om:.2f} / {n_steps}; "
          f"PSNR cost of oracle stopping {cost:.3f} dB "
          f"(threshold {args.threshold})")
    if args.json_out:
        # RL-objective comparison: always-on is penalty-optimal iff
        # full_psnr - lp*T >= oracle_psnr - lp*oracle_iters, i.e. the
        # PSNR cost of oracle stopping exceeds the loop-penalty savings
        # (threshold doubles as the loop penalty, the eval protocol's
        # selection score; evaluator.py score)
        penalty_saving = args.threshold * (n_steps - om)
        blob = {"policy": solver_name, "threshold": args.threshold,
                "denoiser_ckpt": args.denoiser_ckpt,
                "max_episode_step": int(n_steps),
                "oracle_iters_mean": round(float(om), 2),
                "oracle_stop_psnr_cost_db": round(float(cost), 3),
                "always_on_penalty_optimal": bool(cost >= penalty_saving),
                "sets": report}
        Path(args.json_out).write_text(json.dumps(blob, indent=1))
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
