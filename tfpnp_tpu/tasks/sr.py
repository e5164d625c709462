"""Super-resolution task: blur+decimate forward model, obs packing, data.

Second beyond-reference task family (reference ships four, SURVEY §2.2);
follows the extension contract in docs/extending.md. Reuses the deblur
kernel bank / psf2otf machinery — the SR forward model is deblurring
composed with stride-``s`` decimation.

Data dict fields:
  ``gt``      [B, H, W]     float
  ``y0``      [B, H/s, W/s] float    low-res noisy measurement
  ``y0_up``   [B, H, W]     float    bicubic upsample (obs channel)
  ``kf``      [B, H, W]     complex  kernel OTF on the high-res grid
  ``x0``      [B, H, W]     float    init (= y0_up)
  ``sigma_n`` [B]           float
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .deblur import kernel_bank, psf2otf  # shared PSF machinery

OB_BASE_DIM = 4  # y0_up | |kf| | T | sigma_n


def sr_apply(kf: jnp.ndarray, x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Forward operator A x = (k * x)↓s. Call inside jit only."""
    blurred = jnp.real(jnp.fft.ifft2(kf * jnp.fft.fft2(x)))
    return blurred[:, ::scale, ::scale].astype(jnp.float32)


def make_data(key: jax.Array, gt: jnp.ndarray, kernels: jnp.ndarray,
              scale: int = 2,
              sigma_list: Sequence[float] = (0.0, 2.55, 7.65)):
    """Synthesize an SR batch on device: random kernel per sample,
    discrete noise level, Gaussian measurement noise on the low-res grid.
    ``gt`` H, W must be divisible by ``scale``."""
    b, h, w = gt.shape
    if h % scale or w % scale:
        raise ValueError(
            f"SR scale {scale} requires image dims divisible by it, got "
            f"{h}x{w} — the aliased-band fold reshapes H into (scale, H/scale)")
    k1, k2, k3 = jax.random.split(key, 3)
    otfs = psf2otf(kernels, h)
    kf = otfs[jax.random.randint(k1, (b,), 0, otfs.shape[0])]
    sidx = jax.random.randint(k2, (b,), 0, len(sigma_list))
    sigma_n = jnp.asarray(sigma_list, jnp.float32)[sidx] / 255.0
    y0 = sr_apply(kf, gt, scale) + sigma_n[:, None, None] * jax.random.normal(
        k3, (b, h // scale, w // scale))
    y0_up = jax.image.resize(y0, (b, h, w), method="bicubic"
                             ).astype(jnp.float32)
    return {"gt": gt, "y0": y0, "y0_up": y0_up, "kf": kf, "x0": y0_up,
            "sigma_n": sigma_n}


def solver_name_for(solver: str, scale: int) -> str:
    """Registry name for (algorithm, scale): x2 is the plain family."""
    return f"sr_{solver}" if scale == 2 else f"sr{scale}_{solver}"


def build(opt, denoiser):
    """Wire up the SR task for the CLI (scale from ``opt.scale``).

    Returns (env, sample_data, eval_sets, solver_name, lr_schedule).
    """
    from ..data import gt_source
    from ..data.synthetic import random_images
    from ..env.base import PnPEnv
    from ..pnp.solvers import get_solver

    scale = getattr(opt, "scale", 2)
    # the aliased-band fold needs H, W divisible by scale; round the
    # working resolution down to the nearest multiple (128 -> 126 at x3)
    n = opt.image_size - (opt.image_size % scale)
    name = solver_name_for(opt.solver, scale)
    solver = get_solver(name, denoiser)
    env = PnPEnv(solver, pack_obs, max_episode_step=opt.max_episode_step)

    kernels = jnp.asarray(kernel_bank())
    sample_gt = gt_source(opt, size=n)

    @jax.jit
    def sample_data(key):
        k1, k2 = jax.random.split(key)
        gt = sample_gt(k1, opt.env_batch)
        return make_data(k2, gt, kernels, scale=scale)

    sigmas = (0.0, 2.55, 7.65) if getattr(opt, "eval", False) else (2.55,)
    mk_eval = jax.jit(
        lambda k, g, ks, s: make_data(k, g, ks, scale=scale, sigma_list=(s,)),
        static_argnums=3)
    families = {"gaussian": kernels[0:3], "aniso": kernels[3:6],
                "motion": kernels[6:8]}
    # ONE fixed corpus across the kernel-family x sigma grid
    # (see tasks/csmri.py)
    k_img = jax.random.PRNGKey(9100)
    gt = random_images(k_img, 7, n)
    eval_sets = {}
    for i, (fam, ks) in enumerate(families.items()):
        for s in sigmas:
            eval_sets[f"sr{scale}_{fam}_{s:g}"] = mk_eval(
                jax.random.fold_in(k_img, 100 * i + int(s)), gt, ks, s)

    if getattr(opt, "eval", False):
        # held-out natural anchor (see tasks/csmri.py); gaussian s2.55
        from ..data.natural import available, natural_images
        if available():
            nat = jnp.asarray(natural_images(7, n))
            eval_sets[f"natural{scale}_gaussian_2.55"] = mk_eval(
                jax.random.fold_in(k_img, 999), nat,
                families["gaussian"], 2.55)

    def lr_schedule(step):  # same ladder as CS-MRI (tasks/csmri/main.py:53-57)
        if step < 10000:
            return {"critic": 3e-4, "actor": 1e-3}
        return {"critic": 1e-4, "actor": 3e-4}

    return env, sample_data, eval_sets, name, lr_schedule


def pack_obs(data, var_channels: jnp.ndarray, t_map: jnp.ndarray) -> jnp.ndarray:
    """Policy observation: variables | y0_up | |kf| | T | sigma_n."""
    b, h, w, _ = var_channels.shape
    sig = jnp.broadcast_to(data["sigma_n"].reshape(b, 1, 1, 1), (b, h, w, 1))
    return jnp.concatenate([
        var_channels,
        data["y0_up"][..., None],
        jnp.abs(data["kf"]).astype(jnp.float32)[..., None],
        t_map,
        sig,
    ], axis=-1)
