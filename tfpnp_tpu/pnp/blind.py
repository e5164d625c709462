"""Blind kernel estimation for deblurring (beyond-reference feature).

The reference always hands its solvers the exact forward model. The
robustness sweep (scripts/eval_robustness.py, RESULTS.md) measured the
shipped policies degrading gracefully under kernel-width error (<=0.6 dB
within +-10%) — so a coarse *blind* width estimator is enough to close
most of the mismatch loss when the kernel is unknown.

Spectral estimator for isotropic Gaussian PSFs: with y = k_w * x + n,

    P_y(f) = |K_w(f)|^2 P_x(f) + N^2,      |K_w(f)|^2 = exp(-4 pi^2 w^2 f^2)

and a power-law natural-image spectrum P_x(f) ~ A f^-p. A 1-D grid over
candidate widths w does the heavy lifting: for each w, (log A, p) has a
CLOSED-FORM least-squares solution on the SNR-positive radial bins, and
the candidate is scored by the full-band log-spectrum error of the
complete model A f^-p exp(-4 pi^2 w^2 f^2) + N^2 — including the
noise-dominated bins, which is what discriminates: an under-estimated
width predicts signal above the measured noise floor at high f, an
over-estimated one starves the mid band. No iterative solves, no
reference image, O(B n^2 log n + grid * bins).
"""

from __future__ import annotations

import numpy as np

__all__ = ["estimate_gaussian_width"]


def _radial_spectrum(y: np.ndarray, f_lo: float, f_hi: float, n_bins: int):
    """Log-spaced radial power-spectrum bins; per-image bin means reduced
    by the MEDIAN over images (spectra are heavy-tailed across a small
    batch — one texture-rich image otherwise dominates the mean)."""
    b, h, w = y.shape
    spec = np.abs(np.fft.fft2(y)) ** 2             # E|N(f)|^2 = h*w*sigma^2
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    fr = np.sqrt(fy ** 2 + fx ** 2)
    edges = np.geomspace(max(f_lo, 1.5 / max(h, w)), f_hi, n_bins + 1)
    f_c, p = [], []
    for i in range(n_bins):
        m = (fr >= edges[i]) & (fr < edges[i + 1])
        if np.any(m):
            f_c.append(0.5 * (edges[i] + edges[i + 1]))
            p.append(float(np.median(spec[:, m].mean(axis=1))))
    return np.asarray(f_c), np.asarray(p), h * w


def estimate_gaussian_width(y: np.ndarray, sigma_n: float,
                            ref_images: np.ndarray = None,
                            f_lo: float = 0.02, f_hi: float = 0.45,
                            n_bins: int = 32, w_max: float = 4.0,
                            shrink: float = 0.9) -> float:
    """Estimate the isotropic Gaussian blur width (pixels) from blurred,
    noisy observations alone.

    Args:
      y:       ``[B, H, W]`` (or ``[H, W]``) blurred images in [0, 1].
      sigma_n: measurement noise std on the same scale as ``y``.
      ref_images: optional ``[M, H, W]`` CLEAN images from the training
        distribution (never the test images themselves). When given, the
        signal spectrum P_x(f) is calibrated from their population
        average instead of the analytic power law — a learned spectral
        prior, much tighter on corpora whose spectra are not power-law
        (the procedural collage corpus has oscillatory shape-edge decay).
      f_lo/f_hi: radial band (cycles/pixel) used for the fit — excludes
        only DC (dominated by the image mean); the noise-dominated high
        band is part of the model and carries signal about w.
      shrink: deliberate multiplicative under-bias on the estimate. The
        measured mismatch-cost curve is ASYMMETRIC (RESULTS.md
        robustness table: -20% width error costs 0.38 dB, +20% costs
        1.33 dB — the policy partially compensates residual blur via
        the |OTF| observation channel but cannot undo over-sharpening
        ringing), so shading the estimate low minimizes expected loss
        under the estimator's draw-to-draw variance.

    Returns:
      Estimated PSF standard deviation in pixels (>= 0.05).
    """
    y = np.asarray(y, np.float64)
    if y.ndim == 2:
        y = y[None]
    f_c, P, npix = _radial_spectrum(y, f_lo, f_hi, n_bins)
    floor = npix * float(sigma_n) ** 2
    log_P = np.log(np.maximum(P, 1e-30))

    P_ref = None
    if ref_images is not None:
        ref = np.asarray(ref_images, np.float64)
        if ref.ndim == 2:
            ref = ref[None]
        _, P_ref, _ = _radial_spectrum(ref, f_lo, f_hi, n_bins)

    best_w, best_err = 0.05, np.inf
    for w in np.linspace(0.05, w_max, 120):
        att = np.exp(-4.0 * np.pi ** 2 * w ** 2 * f_c ** 2)
        resid = P - floor
        fit = resid > 0.5 * floor            # SNR-positive bins
        if fit.sum() < 4:
            continue
        if P_ref is not None:
            # one free amplitude against the calibrated signal spectrum
            z = np.log(resid[fit]) - np.log(P_ref[fit] * att[fit])
            model = np.exp(np.mean(z)) * P_ref * att + floor
        else:
            # analytic power-law prior: closed-form (log A, p)
            z = np.log(resid[fit]) - np.log(att[fit])
            X = np.stack([np.ones(fit.sum()), np.log(f_c[fit])], axis=1)
            coef, *_ = np.linalg.lstsq(X, z, rcond=None)
            model = np.exp(coef[0]) * f_c ** coef[1] * att + floor
        err = float(np.mean((np.log(model) - log_P) ** 2))
        if err < best_err:
            best_err, best_w = err, float(w)
    return max(best_w * shrink, 0.05)
