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

__all__ = ["estimate_gaussian_width", "estimate_kernel"]


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


# --------------------------------------------------------------------------- #
# Generalized blind estimation over the full shipped kernel zoo               #
# (round-4; VERDICT r3 next #7): isotropic + ANISOTROPIC Gaussians and        #
# MOTION line segments — the three families the deblur/SR policies train     #
# and evaluate on (tasks/deblur.py kernel_bank). Same spectral principle as  #
# the isotropic estimator, lifted from radial to (radius x orientation)     #
# bins: an anisotropic PSF attenuates differently along its axes, a motion  #
# line imprints a sinc null pattern perpendicular to its direction — both   #
# invisible to a radial average, both dominant in 2-D sector bins.          #
#                                                                           #
# Candidates are GENERATED kernels (the exact parametric families the task  #
# synthesizes, including the motion rasterization), scored by full-band     #
# 2-D log-spectrum error with a closed-form amplitude fit — no solves, no   #
# reference image, family selection for free by comparing best scores.      #
# --------------------------------------------------------------------------- #


def _bin_map_2d(h: int, w: int, f_lo: float, f_hi: float,
                n_r: int, n_a: int):
    """Assign every FFT pixel to a (log-radius, orientation mod pi) sector
    bin; returns (flat bin index map [-1 = excluded], n_bins, counts)."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    fr = np.hypot(fy, fx)
    ang = np.mod(np.arctan2(fy, fx), np.pi)
    r_edges = np.geomspace(max(f_lo, 1.5 / max(h, w)), f_hi, n_r + 1)
    ri = np.searchsorted(r_edges, fr, side="right") - 1
    ai = np.minimum((ang / np.pi * n_a).astype(np.int64), n_a - 1)
    valid = (ri >= 0) & (ri < n_r)
    idx = np.where(valid, ri * n_a + ai, -1)
    counts = np.bincount(idx[idx >= 0].ravel(), minlength=n_r * n_a)
    return idx, n_r * n_a, counts


def _bin_spectrum(spec: np.ndarray, idx: np.ndarray, n_bins: int,
                  counts: np.ndarray) -> np.ndarray:
    """Per-image sector-bin means reduced by the median over images
    (heavy-tailed across a small batch); spec is [B, H, W] or [H, W]."""
    if spec.ndim == 2:
        spec = spec[None]
    flat = idx.ravel()
    m = flat >= 0
    means = np.stack([
        np.bincount(flat[m], weights=s.ravel()[m], minlength=n_bins)
        for s in spec]) / np.maximum(counts, 1)
    return np.median(means, axis=0)


def _otf_power(kernel: np.ndarray, h: int, w: int) -> np.ndarray:
    """|OTF|^2 of a [k, k] PSF on an [h, w] grid (numpy psf2otf)."""
    ks = kernel.shape[0]
    pad = np.zeros((h, w), np.float64)
    pad[:ks, :ks] = kernel
    pad = np.roll(pad, (-(ks // 2), -(ks // 2)), axis=(0, 1))
    return np.abs(np.fft.fft2(pad)) ** 2


def _score(P: np.ndarray, P_ref: np.ndarray, floor: float,
           att: np.ndarray, valid: np.ndarray) -> float:
    """Full-band log-spectrum error of the model a*P_ref*att + floor with
    the closed-form amplitude a (mean log-ratio over SNR-positive bins).
    Deep spectral nulls (att ~ 0, motion kernels) are kept in the model
    but excluded from the amplitude fit; empty sector bins (``valid``)
    are excluded entirely — their log(0) would add a large constant to
    every candidate and dilute the discrimination."""
    log_P = np.log(np.maximum(P, 1e-30))
    resid = P - floor
    fit = valid & (resid > 0.5 * floor) & (att > 1e-6) & (P_ref > 0)
    if fit.sum() < 6:
        return np.inf
    z = np.log(resid[fit]) - np.log(P_ref[fit] * att[fit])
    model = np.exp(np.mean(z)) * P_ref * att + floor
    return float(np.mean(
        (np.log(np.maximum(model, 1e-30)) - log_P)[valid] ** 2))


def _gaussian_candidates(refine=None):
    from ..tasks.deblur import gaussian_kernel
    if refine is None:
        ws = np.linspace(0.3, 4.0, 40)
    else:
        (w,) = refine
        ws = np.linspace(max(w - 0.25, 0.1), w + 0.25, 11)
    return [((float(w),), gaussian_kernel(float(w))) for w in ws]


def _aniso_candidates(refine=None):
    from ..tasks.deblur import gaussian_kernel
    if refine is None:
        grid = [(sx, sy, th)
                for sx in (1.5, 2.0, 2.5, 3.0, 3.5)
                for sy in (0.5, 0.8, 1.1, 1.4)
                for th in np.linspace(0, np.pi, 12, endpoint=False)]
    else:
        sx0, sy0, th0 = refine
        grid = [(sx, sy, th)
                for sx in np.linspace(max(sx0 - 0.4, 0.3), sx0 + 0.4, 5)
                for sy in np.linspace(max(sy0 - 0.25, 0.2), sy0 + 0.25, 5)
                for th in th0 + np.linspace(-0.15, 0.15, 5)]
    return [((float(sx), float(sy), float(th)),
             gaussian_kernel(float(sx), float(sy), float(th)))
            for sx, sy, th in grid]


def _motion_candidates(refine=None, ksize: int = 15):
    from ..tasks.deblur import motion_kernel
    if refine is None:
        grid = [(l, th)
                for l in np.linspace(0.15, 0.60, 10) * ksize
                for th in np.linspace(0, np.pi, 18, endpoint=False)]
    else:
        l0, th0 = refine
        grid = [(l, th)
                for l in np.linspace(max(l0 - 1.2, 1.0), l0 + 1.2, 7)
                for th in th0 + np.linspace(-0.1, 0.1, 7)]
    return [((float(l), float(th)),
             motion_kernel(float(th), half_len=float(l), ksize=ksize))
            for l, th in grid]


_FAMILIES = {"gaussian": _gaussian_candidates,
             "aniso": _aniso_candidates,
             "motion": _motion_candidates}


def estimate_kernel(y: np.ndarray, sigma_n: float,
                    family: str = "auto",
                    ref_images: np.ndarray = None,
                    f_lo: float = 0.02, f_hi: float = 0.45,
                    n_r: int = 12, n_a: int = 16,
                    shrink: float = 0.9):
    """Blind PSF estimation over the shipped kernel families.

    Args:
      y:       ``[B, H, W]`` (or ``[H, W]``) blurred noisy images in [0, 1].
      sigma_n: measurement noise std on the same scale.
      family:  'gaussian' | 'aniso' | 'motion' | 'auto'. 'auto' searches
        all three and returns the family with the best spectral fit —
        fully blind: neither parameters nor family assumed.
      ref_images: CLEAN corpus images (never the test set) calibrating
        the 2-D signal spectrum; strongly recommended (the procedural
        corpus is not power-law and mildly anisotropic).
      shrink: multiplicative under-bias applied to Gaussian widths (the
        measured mismatch cost is asymmetric — over-sharpening rings;
        RESULTS.md robustness table). Motion length is NOT shrunk: its
        spectral nulls pin the length, and a shortened line moves the
        nulls instead of softening them.

    Returns:
      (kernel ``[15, 15]`` float32, info dict with 'family', 'params',
      'score', and per-family best scores under 'scores').
    """
    y = np.asarray(y, np.float64)
    if y.ndim == 2:
        y = y[None]
    b, h, w = y.shape
    idx, n_bins, counts = _bin_map_2d(h, w, f_lo, f_hi, n_r, n_a)
    P = _bin_spectrum(np.abs(np.fft.fft2(y)) ** 2, idx, n_bins, counts)
    floor = h * w * float(sigma_n) ** 2

    if ref_images is not None:
        ref = np.asarray(ref_images, np.float64)
        P_ref = _bin_spectrum(np.abs(np.fft.fft2(ref)) ** 2,
                              idx, n_bins, counts)
    else:
        # analytic fallback: radially power-law, orientation-flat
        fy = np.fft.fftfreq(h)[:, None]
        fx = np.fft.fftfreq(w)[None, :]
        fr = np.maximum(np.hypot(fy, fx), 1e-6)
        P_ref = _bin_spectrum(fr ** -2.0, idx, n_bins, counts)

    valid = counts > 0
    families = list(_FAMILIES) if family == "auto" else [family]
    results = {}
    for fam in families:
        gen = _FAMILIES[fam]
        best = (np.inf, None)
        for params, k in gen():
            s = _score(P, P_ref, floor, _bin_spectrum(
                _otf_power(k, h, w), idx, n_bins, counts), valid)
            if s < best[0]:
                best = (s, params)
        if best[1] is not None:  # skip refine when the coarse grid never
            # produced a finite score (tiny images / extreme noise leave
            # <6 SNR-positive bins, _score -> inf; advisor r4)
            for params, k in gen(refine=best[1]):
                s = _score(P, P_ref, floor, _bin_spectrum(
                    _otf_power(k, h, w), idx, n_bins, counts), valid)
                if s < best[0]:
                    best = (s, params)
        results[fam] = best
    fam = min(results, key=lambda f: results[f][0])
    score, params = results[fam]

    from ..tasks.deblur import gaussian_kernel, motion_kernel
    if params is None:
        # no family produced a finite spectral fit — degrade gracefully
        # to the task's default isotropic prior rather than crashing on a
        # params unpack (advisor r4); 'fallback' tells the caller the
        # estimate carries no information
        kernel = gaussian_kernel(1.0)
        return kernel, {
            "family": "fallback", "params": (1.0,), "score": float("inf"),
            "scores": {f: results[f][0] for f in results}}
    if fam == "gaussian":
        params = (max(params[0] * shrink, 0.05),)
        kernel = gaussian_kernel(*params)
    elif fam == "aniso":
        sx, sy, th = params
        params = (max(sx * shrink, 0.05), max(sy * shrink, 0.05), th)
        kernel = gaussian_kernel(*params)
    else:
        l, th = params
        kernel = motion_kernel(th, half_len=l)
    return kernel, {"family": fam, "params": tuple(params), "score": score,
                    "scores": {f: results[f][0] for f in results}}
