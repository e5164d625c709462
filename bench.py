#!/usr/bin/env python3
"""Headline benchmark: CS-MRI PnP-ADMM solver throughput on one chip.

Metric: plug-and-play solver iterations per second (one iteration = one
denoiser prox + one FFT data-consistency step for one image), on the
flagship configuration — batch 48, 128x128, UNet prior, the reference's
6-step x 5-pack episode shape (docs/results.md, csmri_admm_5x6_48).

``vs_baseline`` compares against the same algorithm implemented in PyTorch
on CPU (the reference is a torch framework with no published throughput
numbers — BASELINE.md: published == {} — so the torch-CPU equivalent is
measured in-process; north star >= 10x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BATCH = 48
SIZE = 128
PACK = 5
STEPS = 6  # episode steps -> PACK*STEPS = 30 solver iterations per image


def bench_tpu(precision: str = "f32", ckpt: str | None = None,
              use_pallas: bool = False, use_fused: bool = False):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(".jax_cache").resolve()))
    import jax.numpy as jnp
    import numpy as np

    from tfpnp_tpu.data.synthetic import random_images
    from tfpnp_tpu.ops.metrics import psnr
    from tfpnp_tpu.pnp import get_solver, run_bundle
    from tfpnp_tpu.pnp.denoiser import (UNetDenoiser, init_denoiser_params,
                                        load_denoiser)
    from tfpnp_tpu.tasks import csmri

    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    path = Path(ckpt) if ckpt else Path("tfpnp_tpu/pretrained/unet_denoiser.pkl")
    if path.exists():
        denoiser = load_denoiser(path, compute_dtype=dtype,
                                 use_pallas=use_pallas,
                                 use_fused=use_fused)  # arch-aware
    else:
        denoiser = UNetDenoiser(
            params=init_denoiser_params(jax.random.PRNGKey(0), SIZE),
            compute_dtype=dtype)

    solver = get_solver("csmri_admm", denoiser)
    masks = jnp.asarray(np.stack([csmri.radial_mask(SIZE, 4)]))
    # jitted synthesis: eager complex64 is unsupported on the tunneled TPU
    data = jax.jit(lambda k1, k2: csmri.make_data(
        k2, random_images(k1, BATCH, SIZE), masks, sigma_list=(15.0,)))(
            jax.random.PRNGKey(1), jax.random.PRNGKey(2))

    # numpy constants: closure-captured arrays embed into the program at
    # trace time without a device round-trip
    import numpy as _np
    hyper = {"sigma_d": _np.full((BATCH, PACK * STEPS), 10 / 255, _np.float32),
             "mu": _np.full((BATCH, PACK * STEPS), 0.1, _np.float32)}

    @jax.jit
    def episode(data, prev):
        # chain each rep's input to the previous output: the tunneled
        # remote executor elides IDENTICAL repeated programs, which
        # inflated an earlier headline (CLAUDE.md rule 7a); the 1e-6
        # perturbation is numerically immaterial but forces execution
        d = {**data, "x0": data["x0"] + 1e-6 * prev.astype(jnp.complex64)}
        state = solver.init(d)
        state = run_bundle(solver, state, solver.filter_aux(d), hyper)
        out = solver.get_output(state)
        return out, psnr(out, data["gt"]).mean()

    prev = jnp.zeros((BATCH, SIZE, SIZE), jnp.float32)
    out, quality = episode(data, prev)
    jax.block_until_ready(out)  # compile
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out, quality = episode(data, out)
    # d2h scalar readback is the only reliable completion fence on the
    # tunneled runtime (CLAUDE.md rule 7b)
    q = float(quality)
    dt = (time.perf_counter() - t0) / n_rep
    its_per_s = BATCH * PACK * STEPS / dt
    return its_per_s, q


def bench_torch_cpu():
    """Same ADMM iteration in PyTorch on CPU (independent implementation of
    the identical math: UNet prior + centered-ortho FFT data consistency)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class Block(nn.Sequential):
        def __init__(self, cin, cout):
            super().__init__(*[m for i in range(3) for m in
                               (nn.Conv2d(cin if i == 0 else cout, cout, 3, padding=1),
                                nn.LeakyReLU(0.2))])

    class TorchUNet(nn.Module):
        def __init__(self):
            super().__init__()
            w = [32, 64, 128, 256, 512]
            self.inc = Block(2, w[0])
            self.down = nn.ModuleList([Block(w[i - 1], w[i]) for i in range(1, 5)])
            self.up = nn.ModuleList([Block(w[i] + w[i + 1], w[i]) for i in range(3, -1, -1)])
            self.outc = nn.Conv2d(w[0], 1, 1)
            self.pool = nn.MaxPool2d(2)
            self.ups = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)

        def forward(self, x):
            inp = x
            skips = []
            x = self.inc(x)
            for d in self.down:
                skips.append(x)
                x = d(self.pool(x))
            for u, s in zip(self.up, reversed(skips)):
                x = u(torch.cat([s, self.ups(x)], 1))
            return inp[:, :1] + self.outc(x)

    net = TorchUNet().eval()
    b = 4  # smaller batch on CPU; throughput normalized per iteration
    x = torch.rand(b, 1, SIZE, SIZE)
    y0 = torch.fft.fftshift(torch.fft.fft2(torch.fft.ifftshift(
        x[:, 0].to(torch.complex64)), norm="ortho"))
    mask = torch.rand(b, SIZE, SIZE) < 0.25
    y0 = torch.where(mask, y0, torch.zeros_like(y0))
    n_iter = 5

    def episode():
        with torch.no_grad():
            xx = torch.fft.fftshift(torch.fft.ifft2(torch.fft.ifftshift(y0), norm="ortho"))
            z = xx.clone()
            u = torch.zeros_like(xx)
            for _ in range(n_iter):
                inp = torch.cat([(z - u).real[:, None],
                                 torch.full((b, 1, SIZE, SIZE), 10 / 255)], 1)
                xr = net(inp).clamp(0, 1)
                xx = xr[:, 0].to(torch.complex64)
                zf = torch.fft.fftshift(torch.fft.fft2(
                    torch.fft.ifftshift(xx + u), norm="ortho"))
                zf = torch.where(mask, (0.1 * zf + y0) / 1.1, zf)
                z = torch.fft.fftshift(torch.fft.ifft2(torch.fft.ifftshift(zf), norm="ortho"))
                u = u + xx - z
        return xx

    episode()  # warm up
    n_rep = 2
    t0 = time.perf_counter()
    for _ in range(n_rep):
        episode()
    dt = (time.perf_counter() - t0) / n_rep
    return b * n_iter / dt


def pinned_cpu_baseline() -> float:
    """The PyTorch-CPU denominator, pinned in BASELINE.json.

    An in-process re-measure per run drifted ~40% with host load
    (BENCH_r03 516x vs RESULTS 715x at the same numerator — VERDICT r3
    weak #5). The first run on a quiet host measures the median of 5
    reps and records {value, date, config}; every later run reports
    against that pinned value so the multiplier is reproducible. Delete
    the ``torch_cpu_baseline`` key to force a re-measure.
    """
    p = Path(__file__).resolve().parent / "BASELINE.json"
    write_back = True
    try:
        blob = json.loads(p.read_text())
    except FileNotFoundError:
        blob = {}
    except Exception as e:
        # unreadable/corrupt BASELINE.json: measure in-process but do NOT
        # rewrite the file — it carries north-star/config metadata that a
        # transient read failure must not discard (advisor r4)
        print(f"# BASELINE.json unreadable ({e}); measuring without "
              f"pinning", file=sys.stderr)
        blob, write_back = {}, False
    pin = blob.get("torch_cpu_baseline")
    if pin:
        return float(pin["iter_s"])
    import statistics
    vals = [bench_torch_cpu() for _ in range(5)]
    its = statistics.median(vals)
    if not write_back:
        return its
    blob["torch_cpu_baseline"] = {
        "iter_s": round(its, 2),
        "runs": [round(v, 2) for v in vals],
        "date": time.strftime("%Y-%m-%d"),
        "config": ("CS-MRI PnP-ADMM, reference-shape TorchUNet prior, "
                   "batch 4 @128^2, torch CPU eager, in-process "
                   "(bench.bench_torch_cpu)"),
    }
    p.write_text(json.dumps(blob, indent=1) + "\n")
    return its


def main():
    tpu_its, q_f32 = bench_tpu("f32")
    # faster candidates (MXU-native bf16 convs; the TPU-shaped s2d prior
    # if trained) are adopted only if restoration quality holds to within
    # 0.1 dB of the f32 reference-UNet on the same inputs
    s2d = Path("tfpnp_tpu/pretrained/unet_s2d_denoiser.pkl")
    candidates = [("bf16", None, False, False)]
    if s2d.exists():
        # the Pallas fused-conv-block and the im2col/composed-upsample
        # (unet_fast) inference paths are candidates like any other:
        # adopted only if faster AND within the quality gate
        candidates += [("f32", str(s2d), False, False),
                       ("bf16", str(s2d), False, False),
                       ("bf16", str(s2d), True, False),
                       ("bf16", str(s2d), False, True)]
    for prec, ck, pallas, fused in candidates:
        try:
            its, q = bench_tpu(prec, ck, use_pallas=pallas, use_fused=fused)
            if its > tpu_its and q_f32 - q < 0.1:
                tpu_its = its
        except Exception:
            pass
    try:
        cpu_its = pinned_cpu_baseline()
    except Exception:
        cpu_its = float("nan")
    vs = tpu_its / cpu_its if cpu_its == cpu_its else None
    print(json.dumps({
        "metric": "csmri_admm_solver_iterations_per_second",
        "value": round(tpu_its, 1),
        "unit": "iter/s (1 iter = UNet prox + FFT DC, per image; batch 48 @128^2)",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
