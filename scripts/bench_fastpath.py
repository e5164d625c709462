#!/usr/bin/env python3
"""Whole-forward + whole-bundle timing of the unet_fast inference path.

Round 4 established that only bundle-scale programs time truthfully on
the tunneled runtime (per-stage probes sit on the ~2 ms dispatch floor;
RESULTS "Where the other 50% of MXU peak lives"). So the im2col +
composed-upsample rewrite (models/unet_fast.py, VERDICT r4 #3) is
judged here at the only two honest granularities:

  1. the full denoiser forward, batch 48 @128^2 bf16 (4.74 ms baseline);
  2. the full CS-MRI ADMM bundle bench.py's headline runs (113 ms
     baseline, 30 prox+DC iterations).

Both fenced: chained inputs + scalar d2h readback (CLAUDE.md rule 7).
Run on the real chip: python scripts/bench_fastpath.py
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH, SIZE, PACK, STEPS = 48, 128, 5, 6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--gemm_max_grid", type=int, default=32)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(".jax_cache").resolve()))
    from tfpnp_tpu.data.synthetic import random_images
    from tfpnp_tpu.models.unet_fast import s2d_fast_apply
    from tfpnp_tpu.ops.metrics import psnr
    from tfpnp_tpu.pnp import get_solver, run_bundle
    from tfpnp_tpu.pnp.denoiser import load_denoiser
    from tfpnp_tpu.tasks import csmri

    ck = "tfpnp_tpu/pretrained/unet_s2d_denoiser.pkl"
    den = load_denoiser(ck, compute_dtype=jnp.bfloat16)
    den_fast = load_denoiser(ck, compute_dtype=jnp.bfloat16, use_fused=True)

    def timed_forward(apply_fn, label):
        x0 = jax.random.uniform(jax.random.PRNGKey(0),
                                (BATCH, SIZE, SIZE, 2))

        from functools import partial

        @partial(jax.jit, static_argnums=1)
        def chained(x, n):
            def body(c, _):
                y = apply_fn(c)
                # feed output back (clipped residual channel) so no two
                # iterations are identical or elidable
                c = c.at[..., :1].set(y[..., :1] * 0.999)
                return c, y[0, 0, 0, 0]
            c, s = jax.lax.scan(body, x, jnp.arange(n))
            return s[-1]

        # warm with the SAME static n — a different n is a different
        # program, and the timed call would pay its compile
        float(chained(x0, args.reps))
        t0 = time.time()
        s = float(chained(x0, args.reps))  # one program, reps forwards
        dt = (time.time() - t0) / args.reps
        print(f"{label}: {dt * 1e3:.2f} ms/forward (scan fence {s:.4f})",
              flush=True)
        return dt

    t_mod = timed_forward(
        lambda x: den.module.apply({"params": den.params}, x), "module.apply")
    t_fast = timed_forward(
        lambda x: s2d_fast_apply(den.params, x,
                                 compute_dtype=jnp.bfloat16,
                                 gemm_max_grid=args.gemm_max_grid),
        f"s2d_fast_apply(gemm<={args.gemm_max_grid})")

    # whole ADMM bundle, both priors (the bench.py protocol)
    masks = jnp.asarray(np.stack([csmri.radial_mask(SIZE, 4)]))
    data = jax.jit(lambda k1, k2: csmri.make_data(
        k2, random_images(k1, BATCH, SIZE), masks, sigma_list=(15.0,)))(
            jax.random.PRNGKey(1), jax.random.PRNGKey(2))
    hyper = {"sigma_d": jnp.full((BATCH, PACK * STEPS), 10 / 255),
             "mu": jnp.full((BATCH, PACK * STEPS), 0.1)}
    report = {"forward_module_ms": round(t_mod * 1e3, 2),
              "forward_fast_ms": round(t_fast * 1e3, 2)}
    for label, d in (("module", den), ("fast", den_fast)):
        solver = get_solver("csmri_admm", d)

        @jax.jit
        def ep(data, prev):
            dd = {**data, "x0": data["x0"]
                  + 1e-6 * prev.astype(jnp.complex64)}
            st = run_bundle(solver, solver.init(dd), solver.filter_aux(dd),
                            hyper)
            return solver.get_output(st)

        out = ep(data, jnp.zeros((BATCH, SIZE, SIZE)))
        out.block_until_ready()
        t0 = time.time()
        for _ in range(5):
            out = ep(data, out)
        float(jnp.abs(out).sum())  # d2h fence
        dt = (time.time() - t0) / 5
        q = float(np.mean(np.asarray(psnr(out, data["gt"]))))
        its = BATCH * PACK * STEPS / dt
        print(f"bundle[{label}]: {dt * 1e3:.1f} ms, {its:.0f} iter/s, "
              f"psnr {q:.2f}", flush=True)
        report[f"bundle_{label}_ms"] = round(dt * 1e3, 1)
        report[f"bundle_{label}_iter_s"] = round(its, 1)
        report[f"bundle_{label}_psnr"] = round(q, 3)

    print(json.dumps(report))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
