"""Denoiser architecture registry: reference UNet + TPU-shaped UNetS2D."""

import jax
import jax.numpy as jnp
import numpy as np

from tfpnp_tpu.models.unet import (UNetS2D, depth_to_space, space_to_depth)
from tfpnp_tpu.pnp.denoiser import (UNetDenoiser, load_denoiser,
                                    make_denoiser_module,
                                    save_denoiser_params)


class TestShuffles:
    def test_s2d_d2s_roundtrip_and_layout(self):
        x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
        z = space_to_depth(x, 2)
        assert z.shape == (2, 4, 4, 12)
        np.testing.assert_array_equal(np.asarray(depth_to_space(z, 2)),
                                      np.asarray(x))
        # block (0:2, 0:2) of channel 0 lands in the first pixel's channels
        np.testing.assert_array_equal(
            np.asarray(z[0, 0, 0, ::3]),
            np.asarray(x[0, :2, :2, 0]).reshape(-1))


class TestUNetS2D:
    def test_forward_shape_and_residual(self):
        m = UNetS2D(2, 1)
        x = jnp.zeros((2, 32, 32, 2))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        y = m.apply({"params": params}, x)
        assert y.shape == (2, 32, 32, 1)
        # residual structure: output equals input head + learned residual
        x2 = x.at[..., 0].set(0.7)
        y2 = m.apply({"params": params}, x2)
        assert np.abs(np.asarray(y2 - y) - 0.7).max() < 0.2

    def test_denoiser_wrapper_and_ckpt_roundtrip(self, tmp_path):
        m = make_denoiser_module("s2d")
        params = m.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 2)))["params"]
        p = tmp_path / "s2d.pkl"
        save_denoiser_params(params, p, arch="s2d")
        den = load_denoiser(p)
        assert isinstance(den.module, UNetS2D)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32))
        out = den(x, jnp.full((2,), 0.1))
        assert out.shape == x.shape and np.all(np.isfinite(np.asarray(out)))
        # bf16 compute path clones the module with the right dtype
        den16 = UNetDenoiser(params=params, module=m,
                             compute_dtype=jnp.bfloat16)
        out16 = den16(x, jnp.full((2,), 0.1))
        assert np.abs(np.asarray(out16 - out)).max() < 0.1

    def test_legacy_bare_params_load_as_unet(self, tmp_path):
        from tfpnp_tpu.models.unet import UNet
        m = UNet(2, 1)
        params = m.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 2)))["params"]
        p = tmp_path / "legacy.pkl"
        save_denoiser_params(params, p)  # bare tree, no arch tag
        den = load_denoiser(p)
        assert isinstance(den.module, UNet)


class TestUNetS2DOddSizes:
    def test_unaligned_sizes_pad_and_crop(self):
        """UNetS2D must accept sizes not divisible by factor*2^(levels-1)
        (the SR x3 ladder runs 126^2): reflect-pad in, crop the residual
        out, and leave aligned sizes bit-identical to the unpadded path."""
        from tfpnp_tpu.models.unet import UNetS2D

        net = UNetS2D(2, 1)
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 2)))["params"]
        for n in (126, 63, 30):
            x = jax.random.uniform(jax.random.PRNGKey(1), (2, n, n, 2))
            out = net.apply({"params": params}, x)
            assert out.shape == (2, n, n, 1)
            assert np.isfinite(np.asarray(out)).all()


class TestFastInferencePath:
    """models/unet_fast.py: the im2col + composed-upsample inference
    rewrite must be numerically EQUAL to module.apply (it is exact
    linear algebra — VERDICT r4 #3), on aligned and unaligned sizes,
    with fresh random params (no checkpoint dependence)."""

    def _params(self, key, size=32):
        m = UNetS2D(2, 1)
        return m.init(key, jnp.zeros((1, size, size, 2)))["params"]

    def test_matches_module_f32(self):
        from tfpnp_tpu.models.unet_fast import s2d_fast_apply
        params = self._params(jax.random.PRNGKey(0))
        m = UNetS2D(2, 1, dtype=jnp.float32)
        for shape in [(2, 32, 32, 2), (1, 33, 31, 2)]:
            x = jax.random.uniform(jax.random.PRNGKey(1), shape)
            ref = m.apply({"params": params}, x)
            out = s2d_fast_apply(params, x, compute_dtype=jnp.float32)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5)

    def test_gemm_grid_threshold_consistent(self):
        """Both grid policies (all-GEMM vs all-XLA convs) agree — the
        im2col rewrite itself is exact, independent of the dispatch
        threshold."""
        from tfpnp_tpu.models.unet_fast import s2d_fast_apply
        params = self._params(jax.random.PRNGKey(2))
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 2))
        a = s2d_fast_apply(params, x, compute_dtype=jnp.float32,
                           gemm_max_grid=0)
        b = s2d_fast_apply(params, x, compute_dtype=jnp.float32,
                           gemm_max_grid=1024)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_denoiser_wrapper_use_fused(self):
        from tfpnp_tpu.pnp.denoiser import UNetDenoiser
        params = self._params(jax.random.PRNGKey(4))
        m = UNetS2D(2, 1)
        d_ref = UNetDenoiser(params=params, module=m)
        d_fast = UNetDenoiser(params=params, module=m, use_fused=True)
        x = jax.random.uniform(jax.random.PRNGKey(5), (2, 32, 32))
        sigma = jnp.asarray([0.05, 0.1])
        np.testing.assert_allclose(np.asarray(d_fast(x, sigma)),
                                   np.asarray(d_ref(x, sigma)), atol=2e-5)
