"""Deblurring task: circular-convolution forward model, obs packing, data.

Beyond-reference fifth task family (the reference ships CS-MRI/PR/CT/SPI
only, SURVEY §2.2) and the worked example for docs/extending.md. Follows
the same extension contract as the reference tasks (a data synthesizer, a
``pack_obs`` observation layout, registered solvers, and a ``build()``
wiring function — reference tasks/*/{env,dataset,solver,main}.py).

Measurement synthesis runs jitted on device: a procedural bank of blur
kernels (isotropic / anisotropic Gaussians + motion lines, the standard
deconvolution benchmark families) is converted to OTFs inside the jitted
program, so complex values never exist eagerly (CLAUDE.md rule 3).

Data dict fields:
  ``gt``      [B, H, W] float
  ``y0``      [B, H, W] float    blurred + noisy measurement
  ``kf``      [B, H, W] complex  kernel OTF
  ``x0``      [B, H, W] float    init (= y0)
  ``sigma_n`` [B] float
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

OB_BASE_DIM = 4  # y0 | |kf| | T | sigma_n


def gaussian_kernel(sigma_x: float, sigma_y: float = None, theta: float = 0.0,
                    ksize: int = 15) -> np.ndarray:
    """[ksize, ksize] normalized (an)isotropic rotated Gaussian PSF."""
    if sigma_y is None:
        sigma_y = sigma_x
    half = (ksize - 1) / 2.0
    yy, xx = np.mgrid[:ksize, :ksize] - half
    c, s = np.cos(theta), np.sin(theta)
    xr, yr = c * xx + s * yy, -s * xx + c * yy
    k = np.exp(-0.5 * ((xr / sigma_x) ** 2 + (yr / sigma_y) ** 2))
    return (k / k.sum()).astype(np.float32)


def motion_kernel(theta: float, half_len: float = None,
                  ksize: int = 15) -> np.ndarray:
    """[ksize, ksize] normalized motion-blur line segment at angle
    ``theta`` with half-length ``half_len`` pixels (default the bank's
    0.45 * ksize). Single-sourced so the blind estimator
    (pnp/blind.py) searches the exact rasterized family the data
    synthesis uses."""
    half = (ksize - 1) / 2.0
    if half_len is None:
        half_len = 0.45 * ksize
    t = np.linspace(-1, 1, 65)
    px = half + t * half_len * np.cos(theta)
    py = half + t * half_len * np.sin(theta)
    k = np.zeros((ksize, ksize))
    np.add.at(k, (np.clip(np.round(py), 0, ksize - 1).astype(int),
                  np.clip(np.round(px), 0, ksize - 1).astype(int)), 1.0)
    return (k / k.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def kernel_bank(ksize: int = 15) -> np.ndarray:
    """[M, ksize, ksize] normalized blur kernels: isotropic and rotated
    anisotropic Gaussians plus motion-blur line segments."""
    kernels = []

    def gauss(sx, sy, theta):
        return gaussian_kernel(sx, sy, theta, ksize)

    for sig in (1.2, 1.8, 2.4):                      # isotropic
        kernels.append(gauss(sig, sig, 0.0))
    for th in (0.0, np.pi / 4, np.pi / 2):           # anisotropic
        kernels.append(gauss(3.0, 0.8, th))
    for th in (np.pi / 6, 2 * np.pi / 3):            # motion lines
        kernels.append(motion_kernel(th, ksize=ksize))
    return np.stack(kernels).astype(np.float32)


def psf2otf(kernels: jnp.ndarray, n: int) -> jnp.ndarray:
    """Pad [M, k, k] PSFs to [M, n, n], center them at the origin, and
    transform: the standard psf2otf so that ``F(k * x) = otf · F(x)``
    under circular boundary conditions. Call inside jit only."""
    m, ks, _ = kernels.shape
    pad = jnp.zeros((m, n, n), jnp.float32).at[:, :ks, :ks].set(kernels)
    pad = jnp.roll(pad, (-(ks // 2), -(ks // 2)), axis=(-2, -1))
    return jnp.fft.fft2(pad)


def blur_apply(kf: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Forward operator A x = k * x (circular). Call inside jit only."""
    return jnp.real(jnp.fft.ifft2(kf * jnp.fft.fft2(x))).astype(jnp.float32)


def make_data(key: jax.Array, gt: jnp.ndarray, kernels: jnp.ndarray,
              sigma_list: Sequence[float] = (2.55, 7.65, 12.75)):
    """Synthesize a deblurring batch on device: random kernel per sample,
    discrete noise level, Gaussian measurement noise.

    Args:
      gt:      [B, H, W] clean images in [0, 1].
      kernels: [M, k, k] PSF bank (e.g. ``kernel_bank()``).
    """
    b, h, w = gt.shape
    k1, k2, k3 = jax.random.split(key, 3)
    otfs = psf2otf(kernels, h)
    kf = otfs[jax.random.randint(k1, (b,), 0, otfs.shape[0])]
    sidx = jax.random.randint(k2, (b,), 0, len(sigma_list))
    sigma_n = jnp.asarray(sigma_list, jnp.float32)[sidx] / 255.0
    y0 = blur_apply(kf, gt) + sigma_n[:, None, None] * jax.random.normal(k3, gt.shape)
    return {"gt": gt, "y0": y0, "kf": kf, "x0": y0, "sigma_n": sigma_n}


def build(opt, denoiser):
    """Wire up the deblurring task for the CLI.

    Returns (env, sample_data, eval_sets, solver_name, lr_schedule).
    Eval sets: 7 fixed images x {gaussian, anisotropic, motion} kernel
    families at sigma_n = 7.65 during training validation, expanded to
    the full sigma grid under --eval (same protocol shape as CS-MRI).
    """
    from ..data import gt_source
    from ..data.synthetic import random_images
    from ..env.base import PnPEnv
    from ..pnp.solvers import get_solver

    n = opt.image_size
    solver_name = f"deblur_{opt.solver}"
    solver = get_solver(solver_name, denoiser)
    env = PnPEnv(solver, pack_obs, max_episode_step=opt.max_episode_step)

    kernels = jnp.asarray(kernel_bank())
    sample_gt = gt_source(opt)

    @jax.jit
    def sample_data(key):
        k1, k2 = jax.random.split(key)
        gt = sample_gt(k1, opt.env_batch)
        return make_data(k2, gt, kernels)

    sigmas = (2.55, 7.65, 12.75) if getattr(opt, "eval", False) else (7.65,)
    mk_eval = jax.jit(
        lambda k, g, ks, s: make_data(k, g, ks, sigma_list=(s,)),
        static_argnums=3)
    families = {"gaussian": kernels[0:3], "aniso": kernels[3:6],
                "motion": kernels[6:8]}
    # ONE fixed corpus across the kernel-family x sigma grid (see
    # tasks/csmri.py — per-config draws make cross-config numbers
    # incomparable)
    k_img = jax.random.PRNGKey(9000)
    gt = random_images(k_img, 7, n)
    eval_sets = {}
    for i, (fam, ks) in enumerate(families.items()):
        for s in sigmas:
            eval_sets[f"deblur_{fam}_{s:g}"] = mk_eval(
                jax.random.fold_in(k_img, 100 * i + int(s)), gt, ks, s)

    if getattr(opt, "eval", False):
        # held-out natural anchor (see tasks/csmri.py); gaussian s7.65
        from ..data.natural import available, natural_images
        if available():
            nat = jnp.asarray(natural_images(7, n))
            eval_sets["natural_gaussian_7.65"] = mk_eval(
                jax.random.fold_in(k_img, 999), nat,
                families["gaussian"], 7.65)

    def lr_schedule(step):  # same ladder as CS-MRI (tasks/csmri/main.py:53-57)
        if step < 10000:
            return {"critic": 3e-4, "actor": 1e-3}
        return {"critic": 1e-4, "actor": 3e-4}

    return env, sample_data, eval_sets, solver_name, lr_schedule


def pack_obs(data, var_channels: jnp.ndarray, t_map: jnp.ndarray) -> jnp.ndarray:
    """Policy observation: variables | y0 | |kf| | T | sigma_n.

    The OTF magnitude channel tells the policy *which* blur it is
    inverting (the analogue of the CS-MRI mask channel)."""
    b, h, w, _ = var_channels.shape
    sig = jnp.broadcast_to(data["sigma_n"].reshape(b, 1, 1, 1), (b, h, w, 1))
    return jnp.concatenate([
        var_channels,
        data["y0"][..., None],
        jnp.abs(data["kf"]).astype(jnp.float32)[..., None],
        t_map,
        sig,
    ], axis=-1)
