"""RGB restoration (the reference's open TODO, docs/todo.md:23).

Channels fold into the solver batch (forward models are channel-
separable), so the grayscale solvers/policies drive RGB restoration
unchanged — per-channel hyperparameters included.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tfpnp_tpu.api import _fold_rgb, _unfold_rgb, restore, restore_rgb
from tfpnp_tpu.ops.metrics import psnr
from tfpnp_tpu.pnp.tv import TVDenoiser
from tfpnp_tpu.tasks import deblur

N = 64


def _rgb_deblur_data(key, b=2, kernel=0):
    """Synthesize an RGB deblur problem from the task's own kernel bank:
    per-channel circular blur + noise, shared OTF."""
    from tfpnp_tpu.data.synthetic import random_images

    k1, k2 = jax.random.split(key)
    # channel-correlated RGB: a gray base modulated per channel
    base = random_images(k1, b, N)
    chroma = jnp.stack([base, jnp.roll(base, 3, axis=-1),
                        0.5 * base + 0.25], axis=-1)
    gt = jnp.clip(chroma, 0.0, 1.0)  # [B, N, N, 3]

    kf = deblur.psf2otf(jnp.asarray(deblur.kernel_bank()[kernel:kernel + 1]),
                        N)[0]
    sigma = 7.65 / 255

    def blur_ch(x):  # [B, N, N] real
        return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(x) * kf))

    noise = sigma * jax.random.normal(k2, gt.shape)
    y0 = jnp.stack([blur_ch(gt[..., c]) for c in range(3)], -1) + noise
    return {"gt": gt, "y0": y0, "x0": y0,
            "kf": jnp.broadcast_to(kf, (b, N, N)),
            "sigma_n": jnp.full((b,), sigma, jnp.float32)}


class TestFoldUnfold:
    def test_roundtrip_and_ordering(self):
        data = {"gt": jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32)
                .reshape(2, 4, 4, 3),
                "kf": jnp.ones((2, 4, 4), jnp.complex64),
                "sigma_n": jnp.asarray([0.1, 0.2])}
        f = _fold_rgb(data)
        assert f["gt"].shape == (6, 4, 4)
        assert f["kf"].shape == (6, 4, 4)
        # channel-minor: rows (b*3 + c); shared fields repeat per channel
        np.testing.assert_allclose(np.asarray(f["sigma_n"]),
                                   [0.1, 0.1, 0.1, 0.2, 0.2, 0.2], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(f["gt"][1]),
                                      np.asarray(data["gt"][0, ..., 1]))
        back = _unfold_rgb(f["gt"])
        np.testing.assert_array_equal(np.asarray(back), np.asarray(data["gt"]))


class TestRGBRestore:
    def test_rgb_deblur_classic(self):
        data = _rgb_deblur_data(jax.random.PRNGKey(0))
        out = restore_rgb("deblur_admm", data, denoiser=TVDenoiser(),
                          iters=20, sigma_n=7.65 / 255)
        assert out.shape == data["gt"].shape
        flat = lambda a: a.reshape(a.shape[0], -1, 3).reshape(a.shape[0], -1)
        p0 = psnr(flat(data["y0"]), flat(data["gt"]))
        p1 = psnr(flat(out), flat(data["gt"]))
        assert float(p1.mean()) > float(p0.mean()) + 1.0

    def test_rgb_matches_per_channel_gray(self):
        """Folding must be exactly the per-channel grayscale solve."""
        data = _rgb_deblur_data(jax.random.PRNGKey(1))
        out_rgb = restore_rgb("deblur_admm", data, denoiser=TVDenoiser(),
                              iters=8, sigma_n=7.65 / 255)
        for c in range(3):
            gray = {"gt": data["gt"][..., c], "y0": data["y0"][..., c],
                    "x0": data["x0"][..., c], "kf": data["kf"],
                    "sigma_n": data["sigma_n"]}
            out_c = restore("deblur_admm", gray, denoiser=TVDenoiser(),
                            iters=8, sigma_n=7.65 / 255)
            np.testing.assert_allclose(np.asarray(out_rgb[..., c]),
                                       np.asarray(out_c), atol=1e-5)

    def test_rgb_policy_runs(self):
        from tfpnp_tpu.api import restore_policy_rgb
        from tfpnp_tpu.pnp.denoiser import load_denoiser

        # motion kernel (bank row 6): a blur strong enough that the
        # policy's gain is unambiguous at this off-distribution 64^2 size
        data = _rgb_deblur_data(jax.random.PRNGKey(2), b=1, kernel=6)
        out = restore_policy_rgb("deblur", "admm", data,
                                 denoiser=load_denoiser())
        assert out.shape == data["gt"].shape
        flat = lambda a: a.reshape(a.shape[0], -1)
        p0 = psnr(flat(jnp.clip(data["y0"], 0, 1).mean(-1)),
                  flat(data["gt"].mean(-1)))
        p1 = psnr(flat(out.mean(-1)), flat(data["gt"].mean(-1)))
        assert float(p1.mean()) > float(p0.mean()) + 1.0
