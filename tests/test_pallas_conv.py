"""Fused Pallas conv-block kernel (ops/pallas_kernels.py, round 4).

CPU runs exercise the interpreter path; the real-TPU lowering is timed
and quality-gated by bench.py's pallas candidate and
scripts/roofline_s2d.py --pallas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpnp_tpu.models.unet import ConvBlock
from tfpnp_tpu.ops.pallas_kernels import fused_conv_block


class TestFusedConvBlock:
    @pytest.mark.parametrize("h,cin,c", [(16, 8, 64), (8, 192, 64),
                                         (4, 256, 128)])
    def test_matches_flax_convblock_bf16(self, h, cin, c):
        """The fused kernel must reproduce ConvBlock(dtype=bf16) —
        same params, same LeakyReLU(0.2), same SAME-padding border
        semantics (the intermediate halo is zeroed exactly as the
        unfused convs' zero padding does)."""
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, h, h, cin), jnp.float32)
        mod = ConvBlock(c, dtype=jnp.bfloat16)
        params = mod.init(key, x)["params"]
        ref = mod.apply({"params": params}, x).astype(jnp.float32)
        out = fused_conv_block(x, params, interpret=True)
        err = float(jnp.max(jnp.abs(out - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert err < 0.05, err

    def test_denoiser_interceptor_routes_and_matches(self):
        """use_pallas=True routes every bf16 ConvBlock through the fused
        kernel via the flax interceptor; the restored image must match
        the plain bf16 path within bf16 tolerance."""
        from tfpnp_tpu.pnp.denoiser import load_denoiser

        path = "tfpnp_tpu/pretrained/unet_s2d_denoiser.pkl"
        d_ref = load_denoiser(path, compute_dtype=jnp.bfloat16)
        d_pal = load_denoiser(path, compute_dtype=jnp.bfloat16,
                              use_pallas=True)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64))
        sig = jnp.full((2,), 15 / 255.0)
        a = np.asarray(d_ref(x, sig))
        b = np.asarray(d_pal(x, sig))
        assert np.max(np.abs(a - b)) < 0.02

    def test_f32_compute_falls_through(self):
        """The interceptor only fires for bf16 compute: f32 denoisers
        (training parity paths) are untouched and bit-identical."""
        from tfpnp_tpu.pnp.denoiser import load_denoiser

        path = "tfpnp_tpu/pretrained/unet_s2d_denoiser.pkl"
        d_ref = load_denoiser(path)
        d_pal = load_denoiser(path, use_pallas=True)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64))
        sig = jnp.full((1,), 15 / 255.0)
        np.testing.assert_array_equal(np.asarray(d_ref(x, sig)),
                                      np.asarray(d_pal(x, sig)))
