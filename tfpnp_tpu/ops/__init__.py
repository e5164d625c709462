"""Physics operators, FFTs, noise models, metrics, schedules (layer L0).

TPU-native re-design of /root/reference/tfpnp/utils/transforms.py,
noise.py, metric.py, utils_pnp.py.
"""

from .fft import (
    fft2c, ifft2c, fft2, ifft2,
    real2complex, complex2real, complex_abs, complex2channel,
)
from .cdp import cdp_forward, cdp_backward, cpr_forward, cpr_backward
from .spi import spi_forward, spi_inverse
from .metrics import psnr, psnr_255
from .radon import Radon, RadonGenerator, power_method_opnorm
from .schedules import get_rho_sigma, get_rho_sigma_admm
from . import noise

__all__ = [
    "fft2c", "ifft2c", "fft2", "ifft2",
    "real2complex", "complex2real", "complex_abs", "complex2channel",
    "cdp_forward", "cdp_backward", "cpr_forward", "cpr_backward",
    "spi_forward", "spi_inverse",
    "psnr", "psnr_255",
    "Radon", "RadonGenerator", "power_method_opnorm",
    "get_rho_sigma", "get_rho_sigma_admm",
    "noise",
]
