#!/usr/bin/env python3
"""Classic (hand-scheduled, no-RL) PnP evaluation across all four tasks.

The reference validates end-metrics only through its RL evaluator; this
script is the framework's algorithm-level regression: each task's
flagship solver runs a classic log-spaced sigma/rho schedule
(ops/schedules.py, after utils_pnp.py:21-42) and reports PSNR
init -> final. Run on TPU for the real numbers or CPU with --size 64
for a quick check. Appends a markdown row set + JSON to stdout.

Usage: python scripts/eval_classic.py [--size 128] [--iters 30] [--eval-n 7]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--eval-n", type=int, default=7)
    ap.add_argument("--denoiser", default="unet", choices=["unet", "tv"])
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))

    import tfpnp_tpu.ops as ops
    from tfpnp_tpu.data.synthetic import random_images
    from tfpnp_tpu.ops.radon import RadonGenerator
    from tfpnp_tpu.pnp import get_solver, run_bundle
    from tfpnp_tpu.pnp.tv import TVDenoiser
    from tfpnp_tpu.tasks import csmri, ct, deblur, pr, spi, sr

    if args.denoiser == "tv":
        den = TVDenoiser()
    else:
        from tfpnp_tpu.pnp.denoiser import load_denoiser
        den = load_denoiser()

    n, it, b = args.size, args.iters, args.eval_n
    rows = []

    def run(name, solver, data, hyper):
        @jax.jit
        def go(data):
            st = solver.init(data)
            p0 = ops.psnr(solver.get_output(st), data["gt"])
            st = run_bundle(solver, st, solver.filter_aux(data), hyper)
            p1 = ops.psnr(solver.get_output(st), data["gt"])
            return p0, p1

        t0 = time.time()
        p0, p1 = jax.device_get(go(data))
        dt = time.time() - t0
        rows.append({"task": name, "psnr_init": round(float(p0.mean()), 2),
                     "psnr": round(float(p1.mean()), 2),
                     "gain": round(float((p1 - p0).mean()), 2),
                     "time_s": round(dt, 2)})
        print(f"{name:26s} {p0.mean():6.2f} -> {p1.mean():6.2f} dB "
              f"(+{(p1 - p0).mean():.2f})  [{dt:.1f}s]", flush=True)

    B = lambda a: np.broadcast_to(np.asarray(a, np.float32), (b, it)).copy()

    # CS-MRI PnP-ADMM, radial x4, sigma_n 15 (docs/results.md:11 protocol)
    rhos, sigmas = ops.get_rho_sigma(sigma=15 / 255, iter_num=it,
                                     model_sigma1=35.0, model_sigma2=5.0)
    masks = jnp.asarray(np.stack([csmri.radial_mask(n, 4)]))
    data = jax.jit(lambda k1, k2: csmri.make_data(
        k2, random_images(k1, b, n), masks, sigma_list=(15.0,)))(
            jax.random.PRNGKey(10), jax.random.PRNGKey(11))
    run("csmri_admm  radial4 s15", get_solver("csmri_admm", den), data,
        {"sigma_d": B(sigmas), "mu": B(rhos)})

    # PR iADMM, alpha 27 (docs/results.md:53 protocol)
    rhos, sigmas = ops.get_rho_sigma(sigma=5 / 255, iter_num=it,
                                     model_sigma1=50.0, model_sigma2=8.0)
    # f32 phases only; the complex mask is built in-graph — a captured
    # complex device array becomes an MLIR closure constant, whose d2h
    # materialization is UNIMPLEMENTED on the tunneled TPU runtime
    phase = jnp.asarray(pr.cdp_mask_phase(n))
    data = jax.jit(lambda k1, k2, ph: pr.make_data(
        k2, random_images(k1, b, n), jnp.exp(1j * ph.astype(jnp.complex64)),
        alphas=(27.0,)))(
            jax.random.PRNGKey(12), jax.random.PRNGKey(13), phase)
    run("pr_iadmm    alpha27", get_solver("pr_iadmm", den), data,
        {"sigma_d": B(sigmas), "mu": B(rhos), "tau": B(np.full(it, 1.2))})

    # CT iADMM, 30 views, 7.5% noise
    rhos, sigmas = ops.get_rho_sigma(sigma=7.5 / 255, iter_num=it,
                                     model_sigma1=40.0, model_sigma2=5.0)
    radon = RadonGenerator()(n, ct.DEFAULT_VIEW)
    data = jax.jit(lambda k1, k2: ct.make_data(
        k2, random_images(k1, b, n), radon, sigma_ns=(0.075,)))(
            jax.random.PRNGKey(14), jax.random.PRNGKey(15))
    run("ct_iadmm    30view 7.5%", get_solver("ct_iadmm", den, radon=radon),
        data, {"sigma_d": B(sigmas), "mu": B(rhos), "tau": B(np.full(it, 1.0))})

    # SPI ADMM, K=8 oversampling
    rhos, sigmas = ops.get_rho_sigma(sigma=2 / 255, iter_num=it,
                                     model_sigma1=50.0, model_sigma2=10.0)
    data = jax.jit(lambda k1, k2: spi.make_data(
        k2, random_images(k1, b, n), K=8))(
            jax.random.PRNGKey(16), jax.random.PRNGKey(17))
    run("spi_admm    x8", get_solver("spi_admm", den), data,
        {"sigma_d": B(sigmas), "mu": B(np.clip(rhos, 60 / 255, None))})

    # Deblur ADMM, mixed kernel bank, sigma_n 7.65 (beyond-reference task)
    rhos, sigmas = ops.get_rho_sigma(sigma=7.65 / 255, iter_num=it,
                                     model_sigma1=35.0, model_sigma2=5.0)
    kernels = jnp.asarray(deblur.kernel_bank())
    data = jax.jit(lambda k1, k2: deblur.make_data(
        k2, random_images(k1, b, n), kernels, sigma_list=(7.65,)))(
            jax.random.PRNGKey(18), jax.random.PRNGKey(19))
    run("deblur_admm mixed s7.65", get_solver("deblur_admm", den), data,
        {"sigma_d": B(sigmas), "mu": B(rhos)})

    # SR x2 ADMM, mixed kernel bank, sigma_n 2.55 (beyond-reference task)
    rhos, sigmas = ops.get_rho_sigma(sigma=2.55 / 255, iter_num=it,
                                     model_sigma1=35.0, model_sigma2=5.0)
    data = jax.jit(lambda k1, k2: sr.make_data(
        k2, random_images(k1, b, n), kernels, scale=2, sigma_list=(2.55,)))(
            jax.random.PRNGKey(20), jax.random.PRNGKey(21))
    run("sr_admm x2  s2.55", get_solver("sr_admm", den), data,
        {"sigma_d": B(sigmas), "mu": B(rhos)})

    # Inpainting ADMM, keep rate 0.3, sigma_n 2.55 (beyond-reference task)
    from tfpnp_tpu.tasks import inpaint
    rhos, sigmas = ops.get_rho_sigma(sigma=2.55 / 255, iter_num=it,
                                     model_sigma1=35.0, model_sigma2=5.0)
    data = jax.jit(lambda k1, k2: inpaint.make_data(
        k2, random_images(k1, b, n), rates=(0.3,), sigma_list=(2.55,)))(
            jax.random.PRNGKey(22), jax.random.PRNGKey(23))
    run("inpaint_admm r0.3 s2.55", get_solver("inpaint_admm", den), data,
        {"sigma_d": B(sigmas), "mu": B(rhos)})

    print(json.dumps({"classic_eval": rows, "size": n, "iters": it,
                      "denoiser": args.denoiser}))


if __name__ == "__main__":
    main()
