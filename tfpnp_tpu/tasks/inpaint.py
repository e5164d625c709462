"""Inpainting task: random-pixel dropout forward model, obs packing, data.

Beyond-reference seventh task family (the reference ships CS-MRI/PR/CT/
SPI, SURVEY §2.2). Follows the same extension contract as the other
tasks (docs/extending.md): a data synthesizer, a ``pack_obs`` layout,
registered solvers (pnp/solvers/inpaint.py), and a ``build()`` wiring
function.

Forward model: ``y = M ⊙ x + M ⊙ n`` — a Bernoulli keep-mask M drops
(1 - rate) of the pixels; noise only exists where pixels are observed.
Init fills the dropped pixels with the observed mean (a flat but
unbiased start, so psnr_init is meaningful).

Data dict fields:
  ``gt``      [B, H, W] float
  ``y0``      [B, H, W] float   masked noisy measurement (zeros dropped)
  ``mask``    [B, H, W] bool    keep-mask
  ``x0``      [B, H, W] float   mean-filled init
  ``sigma_n`` [B] float
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

OB_BASE_DIM = 4  # y0 | mask | T | sigma_n

KEEP_RATES = (0.5, 0.3, 0.2)  # observed-pixel fractions (x2/x3.3/x5)


def make_data(key: jax.Array, gt: jnp.ndarray,
              rates: Sequence[float] = KEEP_RATES,
              sigma_list: Sequence[float] = (0.0, 2.55, 7.65)):
    """Synthesize an inpainting batch on device: per-sample keep rate and
    discrete noise level."""
    b, h, w = gt.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rate = jnp.asarray(rates, jnp.float32)[
        jax.random.randint(k1, (b,), 0, len(rates))]
    mask = jax.random.uniform(k2, (b, h, w)) < rate[:, None, None]
    sigma_n = jnp.asarray(sigma_list, jnp.float32)[
        jax.random.randint(k3, (b,), 0, len(sigma_list))] / 255.0
    noise = sigma_n[:, None, None] * jax.random.normal(k4, gt.shape)
    y0 = jnp.where(mask, gt + noise, 0.0).astype(jnp.float32)
    # mean-fill init over observed pixels
    kept = jnp.maximum(mask.sum(axis=(1, 2)), 1)
    mean = y0.sum(axis=(1, 2)) / kept
    x0 = jnp.where(mask, y0, mean[:, None, None]).astype(jnp.float32)
    return {"gt": gt, "y0": y0, "mask": mask, "x0": x0, "sigma_n": sigma_n}


def build(opt, denoiser):
    """Wire up the inpainting task for the CLI.

    Returns (env, sample_data, eval_sets, solver_name, lr_schedule).
    Eval sets: 7 fixed images per keep rate at sigma_n = 2.55 during
    training validation, expanded to {0, 2.55, 7.65} under --eval."""
    from ..data import gt_source
    from ..data.synthetic import random_images
    from ..env.base import PnPEnv
    from ..pnp.solvers import get_solver

    n = opt.image_size
    solver_name = f"inpaint_{opt.solver}"
    solver = get_solver(solver_name, denoiser)
    env = PnPEnv(solver, pack_obs, max_episode_step=opt.max_episode_step)

    sample_gt = gt_source(opt)

    @jax.jit
    def sample_data(key):
        k1, k2 = jax.random.split(key)
        return make_data(k2, sample_gt(k1, opt.env_batch))

    sigmas = (0.0, 2.55, 7.65) if getattr(opt, "eval", False) else (2.55,)
    mk_eval = jax.jit(
        lambda k, g, r, s: make_data(k, g, rates=(r,), sigma_list=(s,)),
        static_argnums=(2, 3))
    # ONE fixed corpus across the keep-rate x sigma grid
    # (see tasks/csmri.py)
    k_img = jax.random.PRNGKey(11000)
    gt = random_images(k_img, 7, n)
    eval_sets = {}
    for i, rate in enumerate(KEEP_RATES):
        for s in sigmas:
            eval_sets[f"inpaint_{rate:g}_{s:g}"] = mk_eval(
                jax.random.fold_in(k_img, 100 * i + int(s)), gt, rate, s)

    if getattr(opt, "eval", False):
        # held-out natural anchor (see tasks/csmri.py); keep 0.3, s2.55
        from ..data.natural import available, natural_images
        if available():
            nat = jnp.asarray(natural_images(7, n))
            eval_sets["natural_0.3_2.55"] = mk_eval(
                jax.random.fold_in(k_img, 999), nat, 0.3, 2.55)

    def lr_schedule(step):  # same ladder as CS-MRI (tasks/csmri/main.py:53-57)
        if step < 10000:
            return {"critic": 3e-4, "actor": 1e-3}
        return {"critic": 1e-4, "actor": 3e-4}

    return env, sample_data, eval_sets, solver_name, lr_schedule


def pack_obs(data, var_channels: jnp.ndarray, t_map: jnp.ndarray) -> jnp.ndarray:
    """Policy observation: variables | y0 | mask | T | sigma_n.

    The mask channel tells the policy how much of the image is observed
    (the analogue of the CS-MRI sampling-mask channel)."""
    b, h, w, _ = var_channels.shape
    sig = jnp.broadcast_to(data["sigma_n"].reshape(b, 1, 1, 1), (b, h, w, 1))
    return jnp.concatenate([
        var_channels,
        data["y0"][..., None],
        data["mask"].astype(jnp.float32)[..., None],
        t_map,
        sig,
    ], axis=-1)
