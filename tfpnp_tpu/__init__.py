"""tfpnp_tpu — a TPU-native tuning-free Plug-and-Play proximal framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the TFPnP
reference (Vandermode/TFPnP: "Tuning-Free Plug-and-Play Proximal Algorithm
for Inverse Imaging Problems", ICML'20 / JMLR'22):

- inverse-imaging forward models (CS-MRI, phase retrieval, sparse-view CT,
  single-photon imaging) as pure XLA ops (``tfpnp_tpu.ops``),
- plug-and-play proximal solvers (ADMM / inexact-ADMM / HQS / PG / APG /
  RED-ADMM / AMP) as pure ``init``/``iterate`` functions scanned under jit
  (``tfpnp_tpu.pnp``),
- a residual-UNet Gaussian denoiser prior (``tfpnp_tpu.models.unet``),
- an RL environment with static-shape alive-masking instead of dynamic
  batch shrinking (``tfpnp_tpu.env``),
- the MDDPG hybrid A2C/DDPG trainer with a differentiable one-step world
  model (``tfpnp_tpu.rl``),
- data-parallel scaling over a ``jax.sharding.Mesh`` (``tfpnp_tpu.parallel``).

Everything in the compute path is jit-compiled; episodes and solver bundles
are ``lax.scan`` loops; batches shard over the mesh 'dp' axis so gradient
and metric reductions ride ICI collectives inserted by GSPMD.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even when a sitecustomize-registered PJRT plugin has
# already overwritten jax_platforms at interpreter start (the tunneled-TPU
# environment does this): if the env var names a different lead platform,
# re-apply it. Harmless elsewhere.
import os as _os


def _honor_jax_platforms_env():
    env = _os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    try:
        import jax as _jax
        cfg = (_jax.config.jax_platforms or "")
        if env.split(",")[0] != cfg.split(",")[0]:
            _jax.config.update("jax_platforms", env)
    except Exception:
        pass


_honor_jax_platforms_env()
