"""Host image-folder datasets and reference-artifact loaders.

Re-design of /root/reference/tfpnp/data/dataset.py (``ImageFolder``) and
/root/reference/tfpnp/data/util.py (resize-to-even ``scale_width`` /
``scale_height``, flip/transpose ``data_augment``) for a TPU-first
pipeline: images are decoded and normalized ONCE on the host into a
device-resident corpus array, and per-batch sampling (random pick, crop,
8-fold dihedral augmentation) runs jitted on device — replacing the
reference's fork-per-worker ``DataLoader`` boundary with a single h2d
upload and pure-XLA sampling.

Also loads the reference's released eval artifacts for users who have
them: ``.mat`` CS-MRI eval sets (``CSMRIEvalDataset``,
tasks/csmri/dataset.py:85-107) via ``load_csmri_mat``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["load_corpus", "matplotlib_corpus", "CorpusSampler",
           "load_csmri_mat"]

_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".pgm", ".ppm"}


def _to_gray01(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 3:  # RGB(A) -> luma (PIL 'L' convention)
        arr = arr[..., 0] * 0.299 + arr[..., 1] * 0.587 + arr[..., 2] * 0.114
    if arr.max() > 1.5:
        arr = arr / 255.0
    return np.clip(arr, 0.0, 1.0)


def load_corpus(root: str | Path, size: int = 128,
                limit: Optional[int] = None) -> np.ndarray:
    """Decode every image under ``root`` to a ``[N, size, size]`` float32
    stack in [0, 1].

    Images are grayscale-converted, scaled so the shorter side is ``size``
    (the reference scales to even dims, data/util.py:15-32; we scale to the
    crop size directly) and center-cropped. Raises if no image is found.
    """
    from PIL import Image

    root = Path(root)
    files = sorted(p for p in root.rglob("*") if p.suffix.lower() in _EXTS)
    if limit is not None:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no images under {root}")
    out = []
    for p in files:
        img = Image.open(p).convert("L")
        w, h = img.size
        s = size / min(w, h)
        img = img.resize((max(size, round(w * s)), max(size, round(h * s))),
                         Image.BILINEAR)
        a = _to_gray01(np.asarray(img))
        top = (a.shape[0] - size) // 2
        left = (a.shape[1] - size) // 2
        out.append(a[top:top + size, left:left + size])
    return np.stack(out)


def matplotlib_corpus(size: int = 128) -> np.ndarray:
    """Natural-image anchors from matplotlib's bundled sample data — a
    zero-download stand-in for the reference's external image folders."""
    import matplotlib.cbook as cbook
    from PIL import Image

    out = []
    for name in ("grace_hopper.jpg", "Minduka_Present_Blue_Pack.png",
                 "logo2.png"):
        try:
            with cbook.get_sample_data(name) as f:
                img = Image.open(f).convert("L")
        except Exception:
            continue
        w, h = img.size
        s = size / min(w, h)
        img = img.resize((max(size, round(w * s)), max(size, round(h * s))),
                         Image.BILINEAR)
        a = _to_gray01(np.asarray(img))
        top = (a.shape[0] - size) // 2
        left = (a.shape[1] - size) // 2
        out.append(a[top:top + size, left:left + size])
    if not out:
        return np.zeros((0, size, size), np.float32)
    return np.stack(out)


class CorpusSampler:
    """Device-resident corpus with jitted batch sampling.

    ``sampler(key, batch)`` gathers ``batch`` random corpus images and
    applies a random dihedral-group augmentation per image (the
    reference's flip/transpose ``data_augment``, data/util.py:35-44) —
    all on device, no host round-trip per batch.
    """

    def __init__(self, corpus: np.ndarray, augment: bool = True):
        assert corpus.ndim == 3 and corpus.shape[0] > 0
        self.corpus = jnp.asarray(corpus, jnp.float32)
        self.augment = augment

    def __call__(self, key: jax.Array, batch: int) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (batch,), 0, self.corpus.shape[0])
        gt = self.corpus[idx]
        if not self.augment:
            return gt

        def aug_one(img, code):
            img = jnp.where(code & 1, img[:, ::-1], img)
            img = jnp.where(code & 2, img[::-1, :], img)
            return jnp.where(code & 4, img.T, img)

        codes = jax.random.randint(k2, (batch,), 0, 8)
        return jax.vmap(aug_one)(gt, codes)


def load_csmri_mat(paths: Sequence[str | Path]):
    """Load reference CS-MRI eval ``.mat`` files (Medical7_2020 protocol:
    one file per image with gt/x0/y0/mask/sigma_n fields written by the
    reference's data generation, read by CSMRIEvalDataset,
    tasks/csmri/dataset.py:85-107). Returns a batched data dict."""
    from scipy.io import loadmat

    gts, y0s, x0s, masks, sigmas = [], [], [], [], []
    for p in paths:
        m = loadmat(str(p))
        gt = _to_gray01(np.abs(np.squeeze(m["gt"])))
        y0 = np.squeeze(np.asarray(m["y0"]))
        if y0.ndim == 3 and y0.shape[-1] == 2:  # […,2] real/imag encoding
            y0 = y0[..., 0] + 1j * y0[..., 1]
        mask = np.squeeze(np.asarray(m["mask"])).astype(bool)
        if "x0" in m:
            x0 = np.squeeze(np.asarray(m["x0"]))
            if x0.ndim == 3 and x0.shape[-1] == 2:
                x0 = x0[..., 0] + 1j * x0[..., 1]
        else:
            x0 = np.fft.ifft2(np.fft.ifftshift(y0), norm="ortho")
        # the reference stores sigma_n broadcast to y0's shape
        # (ones_like(y0) * sigma, tasks/csmri/dataset.py:67); take one value
        sigmas.append(float(np.asarray(m.get("sigma_n", 0.0)).flat[0]))
        gts.append(gt); y0s.append(y0); x0s.append(x0); masks.append(mask)
    return {
        "gt": jnp.asarray(np.stack(gts), jnp.float32),
        "y0": jnp.asarray(np.stack(y0s), jnp.complex64),
        "x0": jnp.asarray(np.stack(x0s), jnp.complex64),
        "mask": jnp.asarray(np.stack(masks)),
        "sigma_n": jnp.asarray(np.asarray(sigmas), jnp.float32),
    }
