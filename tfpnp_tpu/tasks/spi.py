"""Single-photon imaging task: binary-photon model + observations.

Re-design of /root/reference/tasks/spi/{env.py,dataset.py}. Oversampling
K in {4, 6, 8} (tasks/spi/main.py:26); x0 is the block-average of the
binary observation (tasks/spi/dataset.py:50), which is the sufficient
statistic K1/K^2 — so the [H*K, W*K] binary field never has to leave the
device.

Data dict fields:
  ``gt`` [B, H, W] float
  ``x0`` [B, H, W] float   block-averaged binary observation
  ``K``  [B] float         oversampling factor
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.spi import spi_forward

OB_BASE_DIM = 3  # reference tasks/spi/env.py:9


def make_data(key: jax.Array, gt: jnp.ndarray, K: int):
    """Synthesize an SPI batch at a fixed (static) oversampling K.

    alpha = K^2, q = 1 (tasks/spi/dataset.py:49). K is static per call —
    jit caches one executable per K, mirroring the reference's per-K eval
    sets; draw K on the host per batch.
    """
    b, h, w = gt.shape
    ob = spi_forward(gt, K=K, alpha=float(K * K), q=1.0, key=key)
    x0 = ob.reshape(b, h, K, w, K).mean(axis=(2, 4))
    return {"gt": gt, "x0": x0, "K": jnp.full((b,), float(K), jnp.float32)}


def build(opt, denoiser):
    """Wire up the SPI task (mirrors tasks/spi/main.py): K in {4, 6, 8},
    13 eval images per K (the SPISet13_2020 protocol). K is drawn on the
    host per training batch; jit caches one executable per K."""
    import numpy as np

    from ..data import gt_source
    from ..data.synthetic import random_images
    from ..env.base import PnPEnv
    from ..pnp.solvers import get_solver

    n = opt.image_size
    Ks = (4, 6, 8)
    solver_name = "spi_admm"
    solver = get_solver(solver_name, denoiser)
    env = PnPEnv(solver, pack_obs, max_episode_step=opt.max_episode_step)
    host_rng = np.random.default_rng(opt.seed)

    sample_gt = gt_source(opt)

    # one jitted synthesis program per K (K shapes the kron upsampling, so
    # it must stay static; the draw itself is host-side randomness and
    # must NOT be traced — see rl/trainer.py)
    def _sample(key, K):
        k1, k2 = jax.random.split(key)
        gt = sample_gt(k1, opt.env_batch)
        return make_data(k2, gt, K=K)

    mk = {K: jax.jit(lambda key, K=K: _sample(key, K)) for K in Ks}

    def sample_data(key):
        K = int(host_rng.choice(Ks))
        return mk[K](key)

    # ONE fixed 13-image corpus across the K grid (see tasks/csmri.py;
    # the reference's 13 test images are shared by every K)
    k_img = jax.random.PRNGKey(7300)
    gt = random_images(k_img, 13, n)
    eval_sets = {}
    for i, K in enumerate(Ks):
        eval_sets[f"spi_x{K}"] = jax.jit(
            lambda kk, g, K=K: make_data(kk, g, K=K))(
                jax.random.fold_in(k_img, 1 + i), gt)

    if getattr(opt, "eval", False):
        # held-out natural anchor (see tasks/csmri.py); K = 8
        from ..data.natural import available, natural_images
        if available():
            nat = jnp.asarray(natural_images(13, n))
            eval_sets["natural_x8"] = jax.jit(
                lambda kk, g: make_data(kk, g, K=8))(
                    jax.random.fold_in(k_img, 999), nat)

    def lr_schedule(step):  # tasks/spi/main.py:71-75
        if step < 10000:
            return {"critic": 1e-4, "actor": 5e-5}
        return {"critic": 5e-5, "actor": 1e-5}

    return env, sample_data, eval_sets, solver_name, lr_schedule


def pack_obs(data, var_channels: jnp.ndarray, t_map: jnp.ndarray) -> jnp.ndarray:
    """Observation layout per reference tasks/spi/env.py:13-19:
    variables | x0 | K/10 | T."""
    b, h, w, _ = var_channels.shape
    k_ch = jnp.broadcast_to((data["K"] / 10.0).reshape(b, 1, 1, 1), (b, h, w, 1))
    return jnp.concatenate([
        var_channels,
        data["x0"][..., None],
        k_ch,
        t_map,
    ], axis=-1)
