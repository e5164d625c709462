#!/usr/bin/env python3
"""Kernel-mismatch robustness sweep for the deblur / SR shipped policies.

Blind-deconvolution reality check: the policy and solver only ever see the
*estimated* OTF |kf| (tasks/deblur.py pack_obs), so what happens when that
estimate is wrong? Measurements are synthesized with the true isotropic
Gaussian kernel (sigma 1.8) while the solver/policy are handed a kernel
whose width is off by eps in {-20%..+20%}; PSNR degradation vs the
matched-kernel run quantifies robustness. The reference has no analogous
study (its kernels are always exact).

Runs on CPU by default so it can execute alongside a live TPU training
job (CLAUDE.md rule 1: the tunneled chip is single-process).

Usage: python scripts/eval_robustness.py [--task deblur|sr|both]
         [--image_size 64] [--tpu]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="both", choices=["deblur", "sr", "both"])
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=7)
    ap.add_argument("--eps", type=float, nargs="*",
                    default=[-0.2, -0.1, -0.05, 0.0, 0.05, 0.1, 0.2])
    ap.add_argument("--tpu", action="store_true",
                    help="run on the tunneled TPU (needs the chip free)")
    ap.add_argument("--blind", action="store_true",
                    help="also run BLIND kernel estimation: the width is "
                         "estimated from the measurements alone "
                         "(pnp/blind.py spectral estimator calibrated on "
                         "a disjoint corpus draw) instead of assumed")
    ap.add_argument("--out", type=str, default="logs/robustness")
    args = ap.parse_args()

    import os
    if not args.tpu:
        # BEFORE importing jax/tfpnp_tpu: the package __init__ re-applies
        # the JAX_PLATFORMS env var over any in-process config pin
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(".jax_cache").resolve()))
    import jax.numpy as jnp
    import numpy as np

    from tfpnp_tpu import pretrained
    from tfpnp_tpu.data.synthetic import random_images
    from tfpnp_tpu.env.base import PnPEnv
    from tfpnp_tpu.eval.evaluator import Evaluator
    from tfpnp_tpu.models.actor import actor_spec_for
    from tfpnp_tpu.pnp.denoiser import load_denoiser
    from tfpnp_tpu.pnp.solvers import get_solver
    from tfpnp_tpu.tasks import deblur, sr
    from tfpnp_tpu.utils.log import Logger

    SIGMA_TRUE = 1.8
    denoiser = load_denoiser()
    logger = Logger(args.out)
    tasks = ["deblur", "sr"] if args.task == "both" else [args.task]
    all_rows = []

    for task_name in tasks:
        n = args.image_size
        scale = 2
        if task_name == "sr":
            n -= n % scale
        solver_name = "deblur_admm" if task_name == "deblur" else "sr_admm"
        solver = get_solver(solver_name, denoiser)
        env = PnPEnv(solver, deblur.pack_obs if task_name == "deblur"
                     else sr.pack_obs, max_episode_step=6)
        ranges, actor = actor_spec_for(solver_name, 5)
        variables = jax.tree.map(jnp.asarray, pretrained.load_policy(solver_name))
        ev = Evaluator(env, actor, ranges, {}, save_dir=None, logger=logger)

        k_true = jnp.asarray(deblur.gaussian_kernel(SIGMA_TRUE)[None])
        key = jax.random.PRNGKey(77)
        gt = random_images(key, args.batch, n)

        if task_name == "deblur":
            mk = jax.jit(lambda k, g: deblur.make_data(
                k, g, k_true, sigma_list=(7.65,)))
        else:
            mk = jax.jit(lambda k, g: sr.make_data(
                k, g, k_true, scale=scale, sigma_list=(2.55,)))
        data = mk(jax.random.fold_in(key, 1), gt)

        base_psnr = None
        for eps in args.eps:
            k_est = jnp.asarray(
                deblur.gaussian_kernel(SIGMA_TRUE * (1.0 + eps))[None])
            # measurement stays from the TRUE kernel; only the OTF handed
            # to the solver/policy is perturbed
            kf_mis = jax.jit(lambda ks: jnp.broadcast_to(
                deblur.psf2otf(ks, n)[0], data["kf"].shape))(k_est)
            r = ev.run_set(variables, {**data, "kf": kf_mis})
            if eps == 0.0:
                base_psnr = r["psnr"]
            row = {"task": task_name, "eps": eps, **{k: round(v, 2)
                   for k, v in r.items()}}
            all_rows.append(row)
            print(json.dumps(row), flush=True)

        if args.blind:
            # fully blind: width estimated from the measurements alone.
            # For SR the estimator sees the LR observation; its spectrum
            # is the aliased decimation — estimate from the deblur-domain
            # statistics is out of scope, so blind mode covers deblur
            # (the task whose kernel is the dominant unknown).
            if task_name == "deblur":
                from tfpnp_tpu.pnp.blind import estimate_gaussian_width
                ref = np.asarray(random_images(jax.random.PRNGKey(999),
                                               64, n))
                w_hat = estimate_gaussian_width(
                    np.asarray(data["y0"]), 7.65 / 255, ref_images=ref)
                k_blind = jnp.asarray(
                    deblur.gaussian_kernel(float(w_hat))[None])
                kf_blind = jax.jit(lambda ks: jnp.broadcast_to(
                    deblur.psf2otf(ks, n)[0], data["kf"].shape))(k_blind)
                r = ev.run_set(variables, {**data, "kf": kf_blind})
                row = {"task": task_name, "eps": "blind",
                       "w_hat": round(float(w_hat), 3),
                       "w_err": round(float(w_hat) / SIGMA_TRUE - 1.0, 3),
                       **{k: round(v, 2) for k, v in r.items()}}
                all_rows.append(row)
                print(json.dumps(row), flush=True)

        if args.blind and task_name == "deblur":
            # ---- family-blind sweep (round 4): the estimator covers all
            # three shipped kernel families — and in 'auto' mode it is
            # handed neither the parameters NOR the family. Per family:
            # oracle (true kernel) vs a no-estimator fallback (the bank's
            # median isotropic kernel — what a system that cannot
            # estimate would assume) vs the blind estimate. The blind
            # mode must recover >= half of the fallback's loss.
            from tfpnp_tpu.pnp.blind import estimate_kernel
            from tfpnp_tpu.tasks.deblur import kernel_bank
            ref = np.asarray(random_images(jax.random.PRNGKey(999), 64, n))
            bank = kernel_bank()
            fam_true = {"gaussian": bank[1], "aniso": bank[4],
                        "motion": bank[6]}
            k_fallback = jnp.asarray(bank[1][None])  # isotropic w=1.8
            for fam, kt in fam_true.items():
                d_fam = jax.jit(
                    lambda k, g, kk: deblur.make_data(
                        k, g, kk, sigma_list=(7.65,)))(
                    jax.random.fold_in(key, 2), gt, jnp.asarray(kt)[None])
                rows = {}
                k_hat, info = estimate_kernel(
                    np.asarray(d_fam["y0"]), 7.65 / 255, family="auto",
                    ref_images=ref)
                for mode, ks in (("oracle", jnp.asarray(kt)[None]),
                                 ("fallback", k_fallback),
                                 ("blind", jnp.asarray(k_hat)[None])):
                    kf = jax.jit(lambda s: jnp.broadcast_to(
                        deblur.psf2otf(s, n)[0], d_fam["kf"].shape))(ks)
                    rows[mode] = ev.run_set(variables, {**d_fam, "kf": kf})
                loss_fb = rows["oracle"]["psnr"] - rows["fallback"]["psnr"]
                loss_bl = rows["oracle"]["psnr"] - rows["blind"]["psnr"]
                rec = (1.0 - loss_bl / loss_fb) if loss_fb > 1e-6 else 1.0
                row = {"task": "deblur_family_blind", "family": fam,
                       "picked": info["family"],
                       "params": [round(p, 3) for p in info["params"]],
                       "oracle": round(rows["oracle"]["psnr"], 2),
                       "fallback": round(rows["fallback"]["psnr"], 2),
                       "blind": round(rows["blind"]["psnr"], 2),
                       "recovered_frac": round(rec, 3)}
                all_rows.append(row)
                print(json.dumps(row), flush=True)

        logger.log(f"## {solver_name} kernel-width mismatch "
                   f"(sigma_true={SIGMA_TRUE}, {n}^2)")
        logger.log("| eps | psnr_init | psnr | delta vs matched | iters |")
        logger.log("|---|---|---|---|---|")
        for row in [r for r in all_rows if r["task"] == task_name]:
            d = row["psnr"] - (base_psnr or row["psnr"])
            eps_lbl = (f"{row['eps']:+.0%}" if isinstance(row["eps"], float)
                       else f"blind (w_hat {row.get('w_hat')})")
            logger.log(f"| {eps_lbl} | {row['psnr_init']} | "
                       f"{row['psnr']} | {d:+.2f} | {row['iters']} |")

    with open(Path(args.out) / "robustness.json", "w") as f:
        json.dump(all_rows, f, indent=1)


if __name__ == "__main__":
    main()
