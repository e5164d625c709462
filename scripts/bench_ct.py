#!/usr/bin/env python3
"""CT component throughput probe: Radon backends + the iadmm bundle.

Times the parallel-beam Radon forward/adjoint for both backends
(ops/radon.py: MXU matmul vs bilinear gather) and a full 30-iteration
ct_iadmm solver bundle, at the flagship CT protocol (batch 48, 128^2,
30 views). Run on the real TPU when the chip is free (ONE process at a
time, CLAUDE.md); informs RESULTS.md's CT timing table.

Usage: python scripts/bench_ct.py [--batch 48 --size 128 --views 30]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, n=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--views", type=int, default=30)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(".jax_cache").resolve()))
    import jax.numpy as jnp

    from tfpnp_tpu.data.synthetic import random_images
    from tfpnp_tpu.ops.radon import Radon, _make_angles
    from tfpnp_tpu.pnp import get_solver, run_bundle
    from tfpnp_tpu.pnp.denoiser import load_denoiser

    b, n, v, it = args.batch, args.size, args.views, args.iters
    x = random_images(jax.random.PRNGKey(0), b, n)
    rows = {}
    radons = {}
    for be in ("matmul", "gather"):
        r = radons[be] = Radon(n, _make_angles(v), backend=be)
        # _forward_jit/_adjoint_jit are already jitted eager wrappers that
        # pass W as a runtime argument — do NOT re-jit them (that would
        # capture W as a program constant; ops/radon.py _W note)
        sino = r._forward_jit(x)
        rows[f"radon_fwd_{be}_ms"] = round(timeit(r._forward_jit, x) * 1e3, 2)
        rows[f"radon_adj_{be}_ms"] = round(timeit(r._adjoint_jit, sino) * 1e3, 2)

    # full ct_iadmm bundle with the default (auto -> matmul) operator
    from tfpnp_tpu.tasks import ct
    denoiser = load_denoiser()
    radon = radons["matmul"]
    solver = get_solver("ct_iadmm", denoiser, radon=radon)
    data = jax.jit(lambda k1, k2: ct.make_data(
        k2, random_images(k1, b, n), radon))(
            jax.random.PRNGKey(1), jax.random.PRNGKey(2))
    import numpy as np
    hyper = {"sigma_d": np.full((b, it), 10 / 255, np.float32),
             "mu": np.full((b, it), 0.2, np.float32),
             "tau": np.full((b, it), 0.5, np.float32)}

    @jax.jit
    def bundle(d):
        st = solver.init(d)
        st = run_bundle(solver, st, solver.filter_aux(d), hyper)
        return solver.get_output(st)

    dt = timeit(bundle, data, n=5)
    rows["ct_iadmm_bundle_s"] = round(dt, 3)
    rows["ct_iadmm_iters_per_s"] = round(b * it / dt, 1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
