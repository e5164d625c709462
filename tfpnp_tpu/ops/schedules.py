"""Classic hand-tuned PnP hyperparameter schedules.

Re-design of /root/reference/tfpnp/utils/utils_pnp.py:21-55: log/linear
interpolated denoiser-sigma ladders with the matching penalty sequence.
Used by the non-RL baseline path (BASELINE.json config #1) and as sanity
anchors in tests.
"""

from __future__ import annotations

import numpy as np

__all__ = ["get_rho_sigma", "get_rho_sigma_admm"]


def get_rho_sigma(sigma=2.55 / 255, iter_num=15, model_sigma1=49.0, model_sigma2=2.55, w=1.0):
    """Blended log/linear sigma ladder and rho = 0.23 * sigma^2 / sigma_i^2
    (reference utils_pnp.py:21-33)."""
    s_log = np.logspace(np.log10(model_sigma1), np.log10(model_sigma2), iter_num).astype(np.float32)
    s_lin = np.linspace(model_sigma1, model_sigma2, iter_num).astype(np.float32)
    sigmas = (s_log * w + s_lin * (1 - w)) / 255.0
    rhos = 0.23 * (sigma ** 2) / (sigmas ** 2)
    return rhos.astype(np.float32), sigmas.astype(np.float32)


def get_rho_sigma_admm(sigma=2.55 / 255, iter_num=15, model_sigma1=49.0, model_sigma2=2.55,
                       w=1.0, lam=0.23):
    """ADMM variant with tunable fidelity weight ``lam``
    (reference utils_pnp.py:36-43)."""
    s_log = np.logspace(np.log10(model_sigma1), np.log10(model_sigma2), iter_num).astype(np.float32)
    s_lin = np.linspace(model_sigma1, model_sigma2, iter_num).astype(np.float32)
    sigmas = (s_log * w + s_lin * (1 - w)) / 255.0
    rhos = lam * (sigma ** 2) / (sigmas ** 2)
    return rhos.astype(np.float32), sigmas.astype(np.float32)
