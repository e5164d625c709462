"""Single-image super-resolution PnP solvers: ADMM, HQS, PG.

Second beyond-reference task family (the reference ships CS-MRI/PR/CT/SPI
only, SURVEY §2.2). Forward model: blur then decimate,
``y = (k * x)↓s + n`` with circular convolution and integer stride ``s``.

The quadratic data subproblem ``argmin_z ||(k*z)↓s - y||² + mu||z - v||²``
has an exact closed form in frequency space despite the decimation: the
aliasing introduced by ↓s couples each frequency only to its s² aliases,
so a Woodbury identity over the s² aliased bands solves the normal
equations with pointwise arithmetic on s²-block-folded spectra (the
classical fast-SR data solution; locked by the normal-equations test in
tests/test_sr.py). One iteration is two batched FFTs plus elementwise
work — everything lands on the MXU/VPU with static shapes.

Data dict fields (built by ``tfpnp_tpu.tasks.sr``):
  ``y0``  [B, H/s, W/s] float    low-res noisy measurement
  ``kf``  [B, H, W]     complex  blur-kernel OTF on the high-res grid
  ``x0``  [B, H, W]     float    initialization (bicubic upsample of y0)
  ``scale`` static int (carried via aux, not a traced array)

Solver state is real ``[B, H, W]`` float32 on the high-res grid; complex
values appear only inside ``iterate`` (tunnel rules, CLAUDE.md 3-4).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.fft import fft2, ifft2  # MXU matmul-DFT on TPU
from .base import Solver, register_solver

__all__ = ["sr_prox", "upsample_zero", "block_mean"]


def upsample_zero(y: jnp.ndarray, s: int) -> jnp.ndarray:
    """Sᵀ: zero-fill upsample [B, h, w] -> [B, h*s, w*s] (adjoint of the
    stride-s decimation x[:, ::s, ::s])."""
    b, h, w = y.shape
    out = jnp.zeros((b, h, s, w, s), y.dtype).at[:, :, 0, :, 0].set(y)
    return out.reshape(b, h * s, w * s)


def block_mean(f: jnp.ndarray, s: int) -> jnp.ndarray:
    """Fold a [B, H, W] spectrum into its s² aliased bands and average:
    out[b, p, q] = mean_{i,j} f[b, i*(H/s)+p, j*(W/s)+q]."""
    b, hh, ww = f.shape
    h, w = hh // s, ww // s
    return f.reshape(b, s, h, s, w).mean(axis=(1, 3))


def sr_prox(v: jnp.ndarray, aux, mu: jnp.ndarray) -> jnp.ndarray:
    """argmin_z ||(k*z)↓s - y||² + mu||z - v||², with spatial ``v``.

    Decimation couples each base frequency p only to its s² aliases
    f_i = p + offsets: with c_i = F(k)[f_i] and b = AᵀY + mu·v, the
    normal equations per alias are conj(c_i)·m + mu·z_i = b_i with the
    shared coupling m = mean_i(c_i z_i), which solves to
      m = mean_s(F(k)·F(b)) / (mean_s|F(k)|² + mu)
      F(z) = (F(b) - conj(F(k))·tile(m)) / mu
    (the SᵀS fold-and-tile frequency representation is invariant to the
    DFT normalization, so this holds with the orthonormal ops.fft2 and
    the unnormalized-kernel OTF alike). For s = 1 this reduces to the
    deconvolution Wiener divide (tests lock both and the
    normal-equations residual). Takes spatial ``v`` so callers never mix
    FFT conventions.
    """
    kf, fbfy, s = aux["kf"], aux["fbfy"], aux["scale"]
    vf = fft2(v)
    mu = mu.reshape(-1, 1, 1)
    fr = fbfy + mu.astype(vf.dtype) * vf
    fbr = block_mean(kf * fr, s)
    invw = block_mean(jnp.abs(kf) ** 2, s)
    invwbr = fbr / (invw + mu).astype(fbr.dtype)
    fcb = jnp.conj(kf) * jnp.tile(invwbr, (1, s, s))
    z = jnp.real(ifft2((fr - fcb) / mu.astype(fr.dtype))).astype(jnp.float32)
    # Projected splitting (see deblur._wiener_step / ct.py:53-57): the
    # explicit 1/mu makes small policy-sampled mu catastrophic in f32;
    # the box keeps iterates and MDDPG gradients bounded, no-op otherwise.
    return jnp.clip(z, -1.0, 2.0)


def _make_aux(scale: int):
    def _aux(data):
        kf = data["kf"]
        # AᵀY = Kᵀ Sᵀ y, precomputed in frequency space once per bundle.
        fbfy = jnp.conj(kf) * fft2(upsample_zero(data["y0"], scale))
        return {"kf": kf, "fbfy": fbfy, "scale": scale}
    return _aux


def _out_x(state):
    return state["x"]


def _register_family(scale: int, suffix: str = ""):
    """Register sr_admm/sr_hqs/sr_pg for a static scale factor."""
    aux_fn = _make_aux(scale)

    @register_solver(f"sr{suffix}_admm")
    def make_admm(denoiser) -> Solver:
        """PnP-ADMM with the exact aliased-band data solution."""

        def init(data):
            x = data["x0"].astype(jnp.float32)
            return {"x": x, "z": x, "u": jnp.zeros_like(x)}

        def iterate(state, aux, hyper):
            x = denoiser(state["z"] - state["u"], hyper["sigma_d"])
            u = state["u"]
            z = sr_prox(x + u, aux, hyper["mu"])
            return {"x": x, "z": z, "u": u + x - z}

        return Solver(f"sr{suffix}_admm", ("x", "z", "u"), ("sigma_d", "mu"),
                      init, iterate, _out_x, aux_fn)

    @register_solver(f"sr{suffix}_hqs")
    def make_hqs(denoiser) -> Solver:
        """PnP-HQS: the deep-unfolding SR loop with an RL-driven schedule."""

        def init(data):
            x = data["x0"].astype(jnp.float32)
            return {"x": x, "z": x}

        def iterate(state, aux, hyper):
            x = denoiser(state["z"], hyper["sigma_d"])
            z = sr_prox(x, aux, hyper["mu"])
            return {"x": x, "z": z}

        return Solver(f"sr{suffix}_hqs", ("x", "z"), ("sigma_d", "mu"),
                      init, iterate, _out_x, aux_fn)

    @register_solver(f"sr{suffix}_pg")
    def make_pg(denoiser) -> Solver:
        """PnP proximal gradient: x -= tau·Aᵀ(Ax - y), then denoise."""

        def init(data):
            return {"x": data["x0"].astype(jnp.float32)}

        def iterate(state, aux, hyper):
            x = state["x"]
            kf, s = aux["kf"], aux["scale"]
            ax = jnp.real(ifft2(kf * fft2(x)))[:, ::s, ::s]
            grad = jnp.real(ifft2(jnp.conj(kf) * fft2(
                upsample_zero(ax, s)))).astype(jnp.float32) \
                - jnp.real(ifft2(aux["fbfy"])).astype(jnp.float32)
            tau = hyper["tau"].reshape(-1, 1, 1)
            x = denoiser(x - tau * grad, hyper["sigma_d"])
            return {"x": x}

        return Solver(f"sr{suffix}_pg", ("x",), ("sigma_d", "tau"),
                      init, iterate, _out_x, aux_fn)


# Default x2 family under the plain names; x3/x4 under suffixed names.
# The scale is a static compile-time constant (decimation stride shapes
# the program), so each factor is its own registry entry.
_register_family(2)
_register_family(3, "3")
_register_family(4, "4")
