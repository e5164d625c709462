#!/usr/bin/env python3
"""Convert the reference's external eval artifacts into ``.npz`` eval sets.

The reference's benchmark data (Medical7_2020 CS-MRI ``.mat`` files,
PrDeep_12 / SPISet13 image folders) are external downloads, not in its
repo. When a user has them, this script packs each set into one ``.npz``
batch consumable by ``python -m tfpnp_tpu ... --eval --eval_data
name=path.npz`` — enabling PSNR comparison directly against the
reference's published tables (docs/results.md) on identical inputs.

No downloads happen here; everything is local file conversion.

Modes
  csmri DIR      directory of reference CSMRIEvalDataset .mat files
                 (fields gt/y0/x0/mask/sigma_n, tasks/csmri/dataset.py:85)
  pr DIR         directory of grayscale images (PrDeep_12 .tif/.png);
                 CDP measurement synthesized at --alpha with the seed-0
                 mask bank (matches tasks/pr.py eval protocol)
  spi DIR        directory of grayscale images (SPISet13); binary
                 photon measurement at oversampling --K
  images DIR     plain grayscale corpus -> npz (for --data_root use)

Usage:
  python scripts/convert_reference_data.py csmri ~/Medical7_2020/radial_128_4/15 \
      --out medical7_radial4_15.npz
  python -m tfpnp_tpu --task csmri --solver admm --eval \
      --eval_data medical7_radial4_15=medical7_radial4_15.npz
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["csmri", "pr", "spi", "images"])
    ap.add_argument("src", type=str, help="source directory")
    ap.add_argument("--out", type=str, required=True, help="output .npz")
    ap.add_argument("--size", type=int, default=128,
                    help="target image size for image-folder modes")
    ap.add_argument("--alpha", type=float, default=27.0, help="pr noise level")
    ap.add_argument("--K", type=int, default=8, help="spi oversampling")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import os
    # BEFORE importing jax/tfpnp_tpu: the package __init__ re-applies the
    # JAX_PLATFORMS env var over any in-process config pin
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")  # pure file conversion
    import jax.numpy as jnp
    import numpy as np

    from tfpnp_tpu.data.folder import load_corpus, load_csmri_mat
    from tfpnp_tpu.data.npz import save_data_npz

    src = Path(args.src)
    if args.mode == "csmri":
        paths = sorted(src.glob("*.mat"))
        if not paths:
            sys.exit(f"no .mat files in {src}")
        data = load_csmri_mat(paths)
        print(f"{len(paths)} cases, sigma_n = "
              f"{np.asarray(data['sigma_n'])[:3]}...")
    elif args.mode == "images":
        gt = load_corpus(src, size=args.size)
        data = {"gt": jnp.asarray(gt)}
        print(f"{gt.shape[0]} images at {args.size}^2")
    elif args.mode == "pr":
        from tfpnp_tpu.tasks import pr
        gt = jnp.asarray(load_corpus(src, size=args.size))
        mk = jax.jit(lambda k, g: pr.make_data(
            k, g, jnp.exp(1j * jnp.asarray(pr.cdp_mask_phase(args.size))),
            alphas=(args.alpha,)))
        data = mk(jax.random.PRNGKey(args.seed), gt)
        print(f"{gt.shape[0]} images, alpha={args.alpha}")
    else:  # spi
        from tfpnp_tpu.tasks import spi
        gt = jnp.asarray(load_corpus(src, size=args.size))
        mk = jax.jit(lambda k, g: spi.make_data(k, g, K=args.K))
        data = mk(jax.random.PRNGKey(args.seed), gt)
        print(f"{gt.shape[0]} images, K={args.K}")

    save_data_npz(args.out, data)
    print(f"wrote {args.out}: "
          + ", ".join(f"{k}{tuple(v.shape)}" for k, v in data.items()))


if __name__ == "__main__":
    main()
