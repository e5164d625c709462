"""Sparse-view CT task: Radon measurements + observations.

Re-design of /root/reference/tasks/ct/{env.py,dataset.py}. Like the
reference — whose CT data synthesis runs on the GPU inside a batch
transform (CT_transform, tasks/ct/dataset.py:80-105) — synthesis here is a
jitted device function: sinogram, percentage Gaussian noise
(sigma_n in {0.05, 0.075, 0.10}, tasks/ct/main.py:27-28), normalized
backprojection and FBP initialization.

Data dict fields:
  ``gt``      [B, H, W] float
  ``y0``      [B, V, D] float   noisy sinogram
  ``ATy0``    [B, H, W] float   normalized backprojection (obs channel)
  ``x0``      [B, H, W] float   FBP init
  ``view``    [B] float         n_views / 120 (obs scaling, tasks/ct/dataset.py:66)
  ``sigma_n`` [B] float
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.radon import Radon

OB_BASE_DIM = 4  # reference tasks/ct/env.py:9
DEFAULT_VIEW = 30  # tasks/ct/main.py:27


def make_data(key: jax.Array, gt: jnp.ndarray, radon: Radon,
              sigma_ns: Sequence[float] = (0.05, 0.075, 0.10)):
    b = gt.shape[0]
    k1, k2 = jax.random.split(key)
    # one in-graph W shared by the three projections (matmul backend);
    # never closed over as a constant (ops/radon.py _W note)
    w = radon.w_traced() if radon.backend == "matmul" else None
    y = radon.forward_op(gt, w)
    sidx = jax.random.randint(k1, (b,), 0, len(sigma_ns))
    sigma_n = jnp.asarray(sigma_ns, jnp.float32)[sidx]
    # GaussianModelP: noise std = sigma_n * mean |signal| per sample
    # (utils/noise.py:46-51)
    y_mean = jnp.mean(jnp.abs(y.reshape(b, -1)), axis=-1)
    y0 = y + jax.random.normal(k2, y.shape) * (sigma_n * y_mean).reshape(b, 1, 1)
    at_y0 = radon.adjoint_op(y0, w) / (radon.opnorm ** 2)
    filtered = radon.filter_sinogram(y0)
    x0 = radon.adjoint_op(filtered, w) * (jnp.pi / (2.0 * radon.n_views))
    view = jnp.full((b,), radon.n_views / 120.0, jnp.float32)
    return {"gt": gt, "y0": y0, "ATy0": at_y0, "x0": x0,
            "view": view, "sigma_n": sigma_n}


def build(opt, denoiser):
    """Wire up the CT task (mirrors tasks/ct/main.py): 30 views, noise
    percentage in {5, 7.5, 10}% (tasks/ct/main.py:27-28)."""
    from ..data import gt_source
    from ..data.synthetic import random_images
    from ..env.base import PnPEnv
    from ..ops.radon import RadonGenerator
    from ..pnp.solvers import get_solver

    n = opt.image_size
    radon = RadonGenerator()(n, DEFAULT_VIEW)
    solver_name = f"ct_{opt.solver}"
    solver = get_solver(solver_name, denoiser, radon=radon)
    env = PnPEnv(solver, pack_obs, max_episode_step=opt.max_episode_step)
    sigma_ns = (0.05, 0.075, 0.10)

    sample_gt = gt_source(opt)

    # jitted synthesis (fuses sampler + Radon forward into one program)
    @jax.jit
    def sample_data(key):
        k1, k2 = jax.random.split(key)
        gt = sample_gt(k1, opt.env_batch)
        return make_data(k2, gt, radon, sigma_ns=sigma_ns)

    # ONE fixed eval corpus across the noise grid (see tasks/csmri.py:
    # per-config draws caused the round-1 CT_7.5 anomaly — the 7201 image
    # set contained several hard draws, faking a non-monotone noise
    # response; with shared images PSNR is monotone in sigma)
    k_img = jax.random.PRNGKey(7200)
    gt = random_images(k_img, 7, n)
    eval_sets = {}
    for i, s in enumerate(sigma_ns):
        eval_sets[f"CT_{s * 100:g}"] = jax.jit(
            lambda kk, g, s=s: make_data(kk, g, radon, sigma_ns=(s,)))(
                jax.random.fold_in(k_img, 1 + i), gt)

    if getattr(opt, "eval", False):
        # held-out natural anchor (see tasks/csmri.py); 7.5% noise
        from ..data.natural import available, natural_images
        if available():
            nat = jnp.asarray(natural_images(7, n))
            eval_sets["natural_7.5"] = jax.jit(
                lambda kk, g: make_data(kk, g, radon,
                                        sigma_ns=(sigma_ns[1],)))(
                    jax.random.fold_in(k_img, 999), nat)

    def lr_schedule(step):  # tasks/ct/main.py:75-79
        if step < 10000:
            return {"critic": 1e-4, "actor": 5e-5}
        return {"critic": 5e-5, "actor": 1e-5}

    return env, sample_data, eval_sets, solver_name, lr_schedule


def pack_obs(data, var_channels: jnp.ndarray, t_map: jnp.ndarray) -> jnp.ndarray:
    """Observation layout per reference tasks/ct/env.py:13-20:
    variables | ATy0 | view | T | sigma_n."""
    b, h, w, _ = var_channels.shape
    bc = lambda v: jnp.broadcast_to(v.reshape(b, 1, 1, 1), (b, h, w, 1))
    return jnp.concatenate([
        var_channels,
        data["ATy0"][..., None],
        bc(data["view"]),
        t_map,
        bc(data["sigma_n"]),
    ], axis=-1)
