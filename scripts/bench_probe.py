#!/usr/bin/env python3
"""Component-level throughput probe for the flagship solver iteration.

Times each piece of one CS-MRI PnP-ADMM iteration separately — UNet prox
(f32 and bf16), FFT data-consistency (matmul-DFT and XLA FFT backends) —
plus the fused full bundle, to show where the iteration time goes and how
far it sits from the MXU roofline. Informs bench.py tuning; run on the
real TPU when the chip is free (ONE process at a time, CLAUDE.md).

Usage: python scripts/bench_probe.py [--batch 48 --size 128]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, n=20):
    """Chained timing: iteration i+1 consumes iteration i's output (the
    first arg must be shape/dtype-compatible with the output). Repeating
    the IDENTICAL call instead lets the tunneled remote executor elide
    duplicates — observed as impossible 0.02 ms 'UNet forwards'."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def fence(o):
        # block_until_ready on the tunneled runtime resolves before remote
        # execution completes for small programs; a scalar d2h readback is
        # the only reliable completion barrier (costs one ~ms round trip,
        # amortized over n)
        leaf = jax.tree.leaves(o)[0]
        s = jax.jit(lambda a: jnp.abs(a).sum().astype(jnp.float32))(leaf)
        np.asarray(jax.device_get(s))

    x, rest = args[0], args[1:]
    out = fn(x, *rest)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(out, *rest)
    fence(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--denoiser_ckpt", type=str, default=None,
                    help="probe an alternate denoiser checkpoint "
                         "(e.g. the s2d variant)")
    ap.add_argument("--levels", action="store_true",
                    help="also probe each UNet level's conv blocks and the "
                         "upsampling ops separately (where does the "
                         "forward go?)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(".jax_cache").resolve()))
    import jax.numpy as jnp
    import numpy as np

    from tfpnp_tpu.data.synthetic import random_images
    from tfpnp_tpu.ops import fft as fft_mod
    from tfpnp_tpu.pnp import get_solver, run_bundle
    from tfpnp_tpu.pnp.denoiser import UNetDenoiser, load_denoiser
    from tfpnp_tpu.tasks import csmri

    b, n = args.batch, args.size
    den_f32 = load_denoiser(args.denoiser_ckpt)
    den_bf16 = UNetDenoiser(params=den_f32.params, module=den_f32.module,
                            compute_dtype=jnp.bfloat16)

    x = jax.jit(lambda k: random_images(k, b, n))(jax.random.PRNGKey(0))
    sigma = jnp.full((b,), 10 / 255, jnp.float32)

    # UNet FLOPs per call (3x3 convs): sum over blocks of 2*H*W*Cin*Cout*9
    w = [32, 64, 128, 256, 512]
    hw = [(n // 2 ** i) ** 2 for i in range(5)]
    fl = 2 * 9 * (hw[0] * (2 * w[0] + 2 * w[0] * w[0]))
    for i in range(1, 5):
        fl += 2 * 9 * hw[i] * (w[i - 1] * w[i] + 2 * w[i] * w[i])
    for i in range(3, -1, -1):
        fl += 2 * 9 * hw[i] * ((w[i] + w[i + 1]) * w[i] + 2 * w[i] * w[i])
    fl += 2 * hw[0] * w[0]  # 1x1 out conv
    flops = fl * b

    for name, den in [("unet_f32", den_f32), ("unet_bf16", den_bf16)]:
        f = jax.jit(lambda a, s, d=den: d(a, s))
        dt = timeit(f, x, sigma)
        print(f"{name}: {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.2f} TFLOP/s")

    if args.levels:
        # standalone conv-block probes: ConvBlock(w, 3 convs) at each
        # level's resolution/width, plus the upsample einsums — a level's
        # share of the forward is ~its down-block + up-block time
        import flax.linen as nn_

        from tfpnp_tpu.models.unet import ConvBlock, upsample2x_align_corners
        for dt_name, cdt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
            total = 0.0
            for lvl, width in enumerate(w):
                res = n // 2 ** lvl
                blk = ConvBlock(width, dtype=cdt)
                xin = jnp.zeros((b, res, res, width), cdt)
                params = blk.init(jax.random.PRNGKey(0), xin)["params"]
                f = jax.jit(lambda a, p=params, m=blk: m.apply({"params": p}, a))
                t_blk = timeit(f, xin, n=10)
                # block FLOPs: 3 convs width->width (approx; first convs
                # differ at level boundaries)
                bf = 2 * 9 * b * res * res * (3 * width * width)
                total += t_blk
                print(f"  block[{dt_name}] lvl{lvl} {res:4d}^2 x{width:4d}: "
                      f"{t_blk * 1e3:7.2f} ms  {bf / t_blk / 1e12:6.2f} TFLOP/s")
            for lvl, width in enumerate(w[:-1]):
                res = n // 2 ** (lvl + 1)
                xin = jnp.zeros((b, res, res, w[lvl + 1]), cdt)
                # re-decimate so the chained-timing contract (output
                # feeds the next call) holds; the slice is ~free
                f = jax.jit(lambda a: upsample2x_align_corners(a)[:, ::2, ::2, :])
                t_up = timeit(f, xin, n=10)
                print(f"  upsample[{dt_name}] {res}->{res * 2} "
                      f"x{w[lvl + 1]}: {t_up * 1e3:7.2f} ms")
            print(f"  sum of blocks [{dt_name}]: {total * 1e3:7.2f} ms")

    for backend in ("matmul", "xla"):
        fft_mod._FFT_BACKEND = backend
        f = jax.jit(lambda a: jnp.real(fft_mod.ifft2c(fft_mod.fft2c(
            a.astype(jnp.complex64)))))
        try:
            dt = timeit(f, x)
            print(f"fft2c+ifft2c [{backend}]: {dt * 1e3:8.2f} ms")
        except Exception as e:
            print(f"fft2c+ifft2c [{backend}]: failed ({type(e).__name__})")
    fft_mod._FFT_BACKEND = "auto"

    # full bundle, both precisions
    masks = jnp.asarray(np.stack([csmri.radial_mask(n, 4)]))
    data = jax.jit(lambda k1, k2: csmri.make_data(
        k2, random_images(k1, b, n), masks, sigma_list=(15.0,)))(
            jax.random.PRNGKey(1), jax.random.PRNGKey(2))
    hyper = {"sigma_d": np.full((b, args.iters), 10 / 255, np.float32),
             "mu": np.full((b, args.iters), 0.1, np.float32)}
    for name, den in [("bundle_f32", den_f32), ("bundle_bf16", den_bf16)]:
        solver = get_solver("csmri_admm", den)
        # chain through the compute-unused gt field so successive calls
        # have distinct inputs (see timeit docstring)
        f = jax.jit(lambda d, s=solver: {**d, "gt": s.get_output(
            run_bundle(s, s.init(d), s.filter_aux(d), hyper))})
        dt = timeit(f, data, n=5)
        its = b * args.iters / dt
        print(f"{name}: {dt * 1e3:8.2f} ms / {args.iters} iters "
              f"-> {its:8.1f} iter/s  (UNet-only roofline "
              f"{flops * args.iters / dt / 1e12:5.2f} TFLOP/s)")


if __name__ == "__main__":
    main()
