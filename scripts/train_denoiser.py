#!/usr/bin/env python3
"""Train the residual-UNet Gaussian denoiser prior on-device.

The reference's prior is the external pretrained ``unet-nm.pt`` (not in its
repo, gitignored — denoiser/base.py:11); we train our own on the procedural
corpus: noise-map-conditioned Gaussian denoising with sigma ~ U[0, 70]/255,
matching the conditioning interface the solvers use
(reference denoiser/base.py:23-32).

Everything (data synthesis, noising, fwd/bwd) runs jitted on the chip; the
host only orchestrates and checkpoints.

Usage:
  python scripts/train_denoiser.py [--steps 12000] [--batch 32] [--size 128]
                                   [--arch unet|s2d]
                                   [--out tfpnp_tpu/pretrained/unet_denoiser.pkl]

Round-4 additions for closing the s2d/reference-shape quality gap:
  --distill TEACHER.pkl   add an MSE term toward a frozen teacher
                          denoiser's output on the same noisy input (the
                          teacher output is a lower-variance surrogate for
                          the MMSE posterior mean than the single clean
                          draw, so the student sees a denoised regression
                          target; weight via --distill_w)
  --ema DECAY             maintain an exponential moving average of the
                          parameters and validate/save the EMA weights
                          (classic denoiser-training stabilizer)
  --init CKPT.pkl         warm-start from an existing checkpoint of the
                          same architecture (fresh optimizer + schedule)
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from tfpnp_tpu.data.synthetic import random_images
from tfpnp_tpu.models.unet import UNet
from tfpnp_tpu.pnp.denoiser import make_denoiser_module, save_denoiser_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--sigma_max", type=float, default=70.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arch", type=str, default="unet", choices=["unet", "s2d"],
                    help="unet = reference layout; s2d = TPU-shaped "
                         "space-to-depth variant (models/unet.py)")
    ap.add_argument("--out", type=str, default="tfpnp_tpu/pretrained/unet_denoiser.pkl")
    ap.add_argument("--val_every", type=int, default=1000)
    ap.add_argument("--distill", type=str, default=None,
                    help="teacher denoiser checkpoint (any arch); adds "
                         "distill_w * MSE(student, teacher) on the same "
                         "noisy batch")
    ap.add_argument("--distill_w", type=float, default=0.5)
    ap.add_argument("--ema", type=float, default=0.0,
                    help="EMA decay for the saved/validated weights "
                         "(0 = off; 0.999 typical)")
    ap.add_argument("--init", type=str, default=None,
                    help="warm-start params from this checkpoint "
                         "(same arch; fresh optimizer/schedule)")
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    model = make_denoiser_module(args.arch)
    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    params = model.init(k_init, jnp.zeros((1, args.size, args.size, 2)))["params"]
    if args.init:
        from tfpnp_tpu.pnp.denoiser import load_denoiser
        init_den = load_denoiser(args.init)
        chex_shapes = jax.tree.map(lambda a, b: a.shape == b.shape,
                                   params, init_den.params)
        assert all(jax.tree.leaves(chex_shapes)), \
            f"--init checkpoint arch mismatch for --arch {args.arch}"
        params = jax.tree.map(jnp.asarray, init_den.params)
        print(f"warm-started from {args.init}", flush=True)

    teacher = None
    if args.distill:
        from tfpnp_tpu.pnp.denoiser import load_denoiser
        teacher = load_denoiser(args.distill)
        print(f"distilling from {args.distill} (w={args.distill_w})", flush=True)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"UNet params: {n_params/1e6:.2f}M", flush=True)

    warmup = min(500, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(0.0, args.lr, warmup,
                                               max(args.steps, warmup + 1), args.lr * 0.02)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    def batch_loss(params, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        clean = random_images(k1, args.batch, args.size)
        # augment: random flips + 90-degree rotations (square grids)
        fl = jax.random.bernoulli(k4, 0.5, (2,))
        clean = jnp.where(fl[0], clean[:, ::-1], clean)
        clean = jnp.where(fl[1], clean[:, :, ::-1], clean)
        rot = jax.random.bernoulli(k5, 0.5)
        clean = jnp.where(rot, clean.transpose(0, 2, 1), clean)
        sigma = jax.random.uniform(k2, (args.batch,), minval=0.0,
                                   maxval=args.sigma_max / 255.0)
        noisy = clean + sigma[:, None, None] * jax.random.normal(k3, clean.shape)
        sigma_map = jnp.broadcast_to(sigma[:, None, None, None],
                                     clean.shape + (1,))
        inp = jnp.concatenate([noisy[..., None], sigma_map], axis=-1)
        out = model.apply({"params": params}, inp)[..., 0]
        loss = jnp.mean((out - clean) ** 2)
        if teacher is not None:
            t_out = jax.lax.stop_gradient(teacher(noisy, sigma))
            loss = loss + args.distill_w * jnp.mean((out - t_out) ** 2)
        return loss

    @jax.jit
    def train_step(params, opt_state, ema_params, key):
        loss, grads = jax.value_and_grad(batch_loss)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if args.ema > 0:
            d = args.ema
            ema_params = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                                      ema_params, params)
        return params, opt_state, ema_params, loss

    @functools.partial(jax.jit, static_argnums=(2,))
    def val_psnr(params, key, sigma255):
        clean = random_images(key, 16, args.size)
        sigma = jnp.full((16,), sigma255 / 255.0)
        noisy = clean + sigma[:, None, None] * jax.random.normal(
            jax.random.fold_in(key, 1), clean.shape)
        sigma_map = jnp.broadcast_to(sigma[:, None, None, None], clean.shape + (1,))
        out = model.apply({"params": params},
                          jnp.concatenate([noisy[..., None], sigma_map], -1))[..., 0]
        out = jnp.clip(out, 0, 1)
        mse = jnp.mean((out - clean) ** 2, axis=(1, 2))
        return jnp.mean(10 * jnp.log10(1.0 / mse))

    val_key = jax.random.PRNGKey(12345)
    ema_params = params
    t0 = time.time()
    loss_acc = 0.0
    for step in range(1, args.steps + 1):
        key, k = jax.random.split(key)
        params, opt_state, ema_params, loss = train_step(
            params, opt_state, ema_params, k)
        loss_acc += float(loss)
        if step % 100 == 0:
            print(f"step {step:6d}  loss {loss_acc/100:.5f}  "
                  f"{step/(time.time()-t0):.2f} it/s", flush=True)
            loss_acc = 0.0
        if step % args.val_every == 0 or step == args.steps:
            save_p = ema_params if args.ema > 0 else params
            psnrs = {s: float(val_psnr(save_p, val_key, s)) for s in (15, 25, 50)}
            tag = "ema " if args.ema > 0 else ""
            print(f"  {tag}val PSNR: " + "  ".join(f"s{s}={v:.2f}dB" for s, v in psnrs.items()),
                  flush=True)
            save_denoiser_params(save_p, args.out, arch=args.arch)
            print(f"  saved -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
