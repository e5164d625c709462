#!/usr/bin/env python3
"""Per-stage roofline of the UNetS2D denoiser forward (VERDICT r3 next #4).

The s2d forward measures 4.74 ms bf16 at batch 48 @128^2 — 98 TFLOP/s,
~50% of v5e bf16 peak. This probe attributes the other 50%: each stage
(conv block / upsample einsum / shuffle) is timed in isolation with the
two fences the tunneled runtime needs (chained inputs so the remote
executor cannot elide repeats; a scalar d2h readback as the completion
barrier — CLAUDE.md rule 7), then compared against its analytic FLOP
count and two HBM byte models:

  - bytes_min:  input read + output write + weight read (perfect fusion
    of the 3 convs in a block — the Pallas upside),
  - bytes_xla:  every conv's input read + output written (activations
    materialize in HBM between convs — XLA's typical schedule at these
    sizes, where one activation tensor exceeds VMEM).

A stage whose measured time ~= bytes_xla / BW is bandwidth-bound: the
gap to peak MXU is a memory problem a fused kernel can recover; a stage
whose time ~= flops / peak is compute-bound and already at speed of
light. Run on the real chip: python scripts/roofline_s2d.py
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH, SIZE = 48, 128
PEAK_BF16 = 197e12     # v5e MXU, bf16
PEAK_HBM = 819e9       # v5e HBM bandwidth (bytes/s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--pallas", action="store_true",
                    help="also time the fused Pallas conv-block kernel "
                         "per stage (ops/pallas_kernels.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(".jax_cache").resolve()))
    from tfpnp_tpu.models.unet import (ConvBlock, depth_to_space,
                                       space_to_depth,
                                       upsample2x_align_corners)

    cdtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    key = jax.random.PRNGKey(0)
    b = BATCH
    g = SIZE // 2          # post-shuffle grid
    widths = (64, 128, 256, 512)

    # stage list: (name, H, Cin, Cout, kind)
    stages = [("inc", g, 8, widths[0], "block")]
    for i in range(1, len(widths)):
        stages.append((f"down{i}", g >> i, widths[i - 1], widths[i],
                       "block"))
    for i in range(len(widths) - 2, -1, -1):
        stages.append((f"ups{i}", g >> (i + 1), widths[i + 1],
                       widths[i + 1], "upsample"))
        stages.append((f"up{i}", g >> i, widths[i] + widths[i + 1],
                       widths[i], "block"))
    stages.append(("outc", g, widths[0], 4, "conv1x1"))

    def timed(fn, x):
        """Fenced timing: chain reps through a tiny perturbation of the
        input and read back a scalar."""
        f = jax.jit(fn)
        out = f(x)
        jax.block_until_ready(out)

        @jax.jit
        def chained(x, s):
            y = fn(x + (s * 1e-6).astype(x.dtype))
            return y, jnp.sum(y.astype(jnp.float32))

        _, s = chained(x, jnp.float32(0))
        float(s)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            _, s = chained(x, s.astype(jnp.float32) * 0 + 1)
        float(s)  # d2h completion barrier
        return (time.perf_counter() - t0) / args.reps

    rows = []
    total_t = 0.0
    for name, h, cin, cout, kind in stages:
        x = jax.random.normal(key, (b, h, h, cin), jnp.float32)
        if kind == "block":
            mod = ConvBlock(cout, dtype=cdtype)
            params = mod.init(key, x)["params"]
            fn = lambda x, m=mod, p=params: m.apply({"params": p}, x)
            flops = 2 * b * h * h * 9 * (cin * cout + 2 * cout * cout)
            w_bytes = 4 * 9 * (cin * cout + 2 * cout * cout)
            act = 2 * b * h * h
            bytes_min = act * (cin + cout) + w_bytes
            bytes_xla = act * (cin + 3 * cout * 2 - cout) + w_bytes
        elif kind == "upsample":
            fn = upsample2x_align_corners
            # two banded einsums ~= 2 taps per output
            flops = 2 * b * (2 * h) * h * cin * 2 + \
                2 * b * (2 * h) * (2 * h) * cin * 2
            act = 2 * b
            bytes_min = act * (h * h + 4 * h * h) * cin
            bytes_xla = act * (h * h + 2 * h * h + 4 * h * h) * cin
        else:  # 1x1 conv
            import flax.linen as nn
            mod = nn.Conv(cout, (1, 1), dtype=cdtype)
            params = mod.init(key, x)["params"]
            fn = lambda x, m=mod, p=params: m.apply({"params": p}, x)
            flops = 2 * b * h * h * cin * cout
            bytes_min = bytes_xla = 2 * b * h * h * (cin + cout) \
                + 4 * cin * cout
        t = timed(fn, x)
        total_t += t
        t_pallas = None
        if args.pallas and kind == "block" and args.dtype == "bf16":
            from tfpnp_tpu.ops.pallas_kernels import fused_conv_block
            t_pallas = timed(
                lambda x, p=params: fused_conv_block(x, p), x)
        rows.append({
            "stage": name, "shape": f"{h}^2x{cin}->{cout}",
            "ms": round(t * 1e3, 3),
            "tflops": round(flops / t / 1e12, 1),
            "mxu_pct": round(100 * flops / t / PEAK_BF16, 1),
            "gbps_xla": round(bytes_xla / t / 1e9, 1),
            "hbm_pct": round(100 * bytes_xla / t / PEAK_HBM, 1),
            "bound": ("compute" if flops / PEAK_BF16 > bytes_xla / PEAK_HBM
                      else "bandwidth"),
            "t_compute_ms": round(1e3 * flops / PEAK_BF16, 3),
            "t_hbm_xla_ms": round(1e3 * bytes_xla / PEAK_HBM, 3),
            "t_hbm_min_ms": round(1e3 * bytes_min / PEAK_HBM, 3),
            **({"ms_pallas": round(t_pallas * 1e3, 3)}
               if t_pallas is not None else {}),
        })

    import json
    for r in rows:
        print(json.dumps(r), flush=True)
    print(json.dumps({"stage": "SUM", "ms": round(total_t * 1e3, 3),
                      "note": "whole-forward measured separately by "
                              "scripts/bench_probe.py (fusion across "
                              "stages may beat the sum)"}))


if __name__ == "__main__":
    main()
