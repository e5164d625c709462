"""Phase-retrieval task: coded-diffraction-pattern model + observations.

Re-design of /root/reference/tasks/pr/{env.py,dataset.py}. The CDP masks
are random unit-modulus phase patterns at sampling rate S=4 (the
reference loads a stored pr_x4.mat mask, tasks/pr/main.py:40-42);
measurements carry the PoissonModel intensity noise with
alpha in {9, 27, 81} (tasks/pr/main.py:38).

Data dict fields:
  ``gt``      [B, H, W] float
  ``y0``      [B, S, H, W] float     noisy Fourier magnitudes
  ``mask``    [B, S, H, W] complex   CDP masks
  ``x0``      [B, H, W] float        all-ones init (tasks/pr/dataset.py:57)
  ``sigma_n`` [B] float              empirical residual noise std
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cdp import cdp_forward
from ..ops.fft import complex2channel, complex2real

OB_BASE_DIM = 14  # reference tasks/pr/env.py:10
SAMPLING_RATE = 4


@functools.lru_cache(maxsize=None)
def cdp_mask_phase(n: int, s: int = SAMPLING_RATE, seed: int = 0) -> np.ndarray:
    """Deterministic CDP mask phases, shape [S, H, W] float32.

    Kept real-valued so the tunneled TPU backend never sees an *eager*
    complex array (h2d transfer or jit closure constant-folding of
    complex64 is UNIMPLEMENTED there); the unit-modulus complex mask is
    materialized inside jitted programs via ``exp(1j*phase)``."""
    rng = np.random.RandomState(seed)
    return rng.uniform(0, 2 * np.pi, (s, n, n)).astype(np.float32)


def cdp_mask(n: int, s: int = SAMPLING_RATE, seed: int = 0) -> np.ndarray:
    """Host-side complex mask bank [S, H, W] (CPU tests/scripts only)."""
    return np.exp(1j * cdp_mask_phase(n, s, seed)).astype(np.complex64)


def make_data(key: jax.Array, gt: jnp.ndarray, mask: jnp.ndarray,
              alphas: Sequence[float] = (9.0, 27.0, 81.0)):
    """Synthesize a PR batch on device (mirrors PRDataset.__getitem__,
    tasks/pr/dataset.py:24-70): y0 = |A gt| with Poisson-like intensity
    noise at a randomly drawn alpha per sample."""
    b = gt.shape[0]
    k1, k2 = jax.random.split(key)
    mask_b = jnp.broadcast_to(mask[None], (b,) + mask.shape)
    z = jnp.abs(cdp_forward(gt, mask_b))
    aidx = jax.random.randint(k1, (b,), 0, len(alphas))
    alpha = jnp.asarray(alphas, jnp.float32)[aidx]
    # PoissonModel (utils/noise.py:56-76), vectorized per sample
    noise = jax.random.normal(k2, z.shape)
    y2 = jnp.clip(z ** 2 + (alpha.reshape(b, 1, 1, 1) / 255.0) * jnp.abs(z) * noise, 0.0, None)
    y0 = jnp.sqrt(y2)
    rr = (y0 - z).reshape(b, -1)
    sigma_n = jnp.std(rr, axis=-1)
    x0 = jnp.ones_like(gt)
    return {"gt": gt, "y0": y0, "mask": mask_b, "x0": x0, "sigma_n": sigma_n}


def build(opt, denoiser):
    """Wire up the PR task (mirrors tasks/pr/main.py). Eval sets: 12 fixed
    images per alpha in {9, 27, 81} (the PrDeep_12 protocol,
    tasks/pr/main.py:38-49)."""
    from ..data import gt_source
    from ..data.synthetic import random_images
    from ..env.base import PnPEnv
    from ..pnp.solvers import get_solver

    n = opt.image_size
    solver_name = f"pr_{opt.solver}"
    solver = get_solver(solver_name, denoiser)
    env = PnPEnv(solver, pack_obs, max_episode_step=opt.max_episode_step)
    # float32 phases only; the complex mask exists solely inside jit
    phase = jnp.asarray(cdp_mask_phase(n))

    sample_gt = gt_source(opt)

    # jitted synthesis: no eager complex ops (see rl/trainer.py)
    @jax.jit
    def sample_data(key):
        k1, k2 = jax.random.split(key)
        gt = sample_gt(k1, opt.env_batch)
        mask = jnp.exp(1j * phase.astype(jnp.complex64))
        return make_data(k2, gt, mask, alphas=(9.0, 27.0, 81.0))

    # ONE fixed 12-image corpus across the alpha grid (the reference's
    # PrDeep_12 images are shared by every alpha, tasks/pr/main.py;
    # per-config draws made cross-alpha numbers incomparable)
    k_img = jax.random.PRNGKey(7100)
    gt = random_images(k_img, 12, n)
    eval_sets = {}
    for i, alpha in enumerate((9.0, 27.0, 81.0)):
        # jitted synthesis: no eager complex ops (see rl/trainer.py)
        @partial(jax.jit, static_argnames="a")
        def _make(kk, g, a):
            mask = jnp.exp(1j * phase.astype(jnp.complex64))
            return make_data(kk, g, mask, alphas=(a,))

        eval_sets[f"alpha_{int(alpha)}"] = _make(
            jax.random.fold_in(k_img, 1 + i), gt, a=float(alpha))

    if getattr(opt, "eval", False):
        # held-out natural anchor (see tasks/csmri.py); alpha 27
        from ..data.natural import available, natural_images
        if available():
            nat = jnp.asarray(natural_images(12, n))

            @partial(jax.jit, static_argnames="a")
            def _make_nat(kk, g, a):
                mask = jnp.exp(1j * phase.astype(jnp.complex64))
                return make_data(kk, g, mask, alphas=(a,))

            eval_sets["natural_27"] = _make_nat(
                jax.random.fold_in(k_img, 999), nat, a=27.0)

    def lr_schedule(step):  # tasks/pr/main.py:75-79
        if step < 10000:
            return {"critic": 1e-4, "actor": 5e-5}
        return {"critic": 5e-5, "actor": 1e-5}

    return env, sample_data, eval_sets, solver_name, lr_schedule


def pack_obs(data, var_channels: jnp.ndarray, t_map: jnp.ndarray) -> jnp.ndarray:
    """Observation layout per reference tasks/pr/env.py:14-21:
    variables | y0 (S ch) | mask (2S ch) | T | sigma_n."""
    b, h, w, _ = var_channels.shape
    sig = jnp.broadcast_to(data["sigma_n"].reshape(b, 1, 1, 1), (b, h, w, 1))
    y0_ch = jnp.transpose(data["y0"], (0, 2, 3, 1))  # [B, H, W, S]
    return jnp.concatenate([
        var_channels,
        y0_ch,
        complex2channel(data["mask"]),
        t_map,
        sig,
    ], axis=-1)
