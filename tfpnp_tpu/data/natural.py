"""Natural-image eval anchors from locally bundled sample data.

The reference trains and evaluates on natural/medical images
(Medical7_2020 .mat sets, 'Images_128' folders — external downloads,
/root/reference/tasks/csmri/main.py:22-44) that are not distributed.
The procedural corpus (data/synthetic.py) covers the training
distribution, but it is piecewise-smooth and flatters prior-driven
tasks (round-2 VERDICT weak: inpainting +24-27 dB).

This module builds a small deterministic held-out NATURAL anchor set
from images that ship inside the installed libraries (no network):

  - matplotlib's ``grace_hopper.jpg`` (a photographic portrait),
  - matplotlib's ``s1045.ima.gz`` (a real 256x256 MRI head slice — the
    closest in-distribution analogue of the reference's Medical7 data),
  - matplotlib's ``jacksboro_fault_dem.npz`` / ``topobathy.npz``
    elevation fields (natural continuous textures).

Each task mixes ``natural_images(n, size)`` into its --eval grid as an
extra named set, reported alongside the procedural sets in RESULTS.md.
"""

from __future__ import annotations

import functools
import gzip
from pathlib import Path

import numpy as np

__all__ = ["natural_images", "available"]


def _sample_dir() -> Path:
    import matplotlib
    return Path(matplotlib.get_data_path()) / "sample_data"


def available() -> bool:
    try:
        return _sample_dir().is_dir()
    except Exception:
        return False


def _norm01(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, np.float32)
    lo, hi = float(np.min(a)), float(np.max(a))
    return (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)


@functools.lru_cache(maxsize=None)
def _source_images() -> tuple:
    """Grayscale source planes, each normalized to [0, 1]."""
    sd = _sample_dir()
    out = []
    try:  # photographic portrait (600 x 512 RGB)
        from PIL import Image
        img = np.asarray(Image.open(sd / "grace_hopper.jpg").convert("L"))
        out.append(_norm01(img))
    except Exception:
        pass
    try:  # MRI head slice: 256x256 uint16 big-endian raw
        raw = gzip.open(sd / "s1045.ima.gz", "rb").read()
        mri = np.frombuffer(raw, np.uint16).astype(np.float32).reshape(256, 256)
        out.append(_norm01(mri))
    except Exception:
        pass
    for name, key in (("jacksboro_fault_dem.npz", "elevation"),
                      ("topobathy.npz", "topo")):
        try:
            with np.load(sd / name) as z:
                out.append(_norm01(z[key]))
        except Exception:
            pass
    return tuple(out)


def _crops(img: np.ndarray, size: int, n: int, seed: int):
    """Deterministic well-spread crops resized to ``size`` x ``size``."""
    h, w = img.shape
    c = min(h, w)
    # crop scales between full-frame and 40%: mixes global structure
    # and texture detail
    rng = np.random.RandomState(seed)
    crops = []
    for i in range(n):
        s = int(c * (1.0 - 0.6 * i / max(n - 1, 1)))
        y = int(rng.uniform(0, h - s + 1))
        x = int(rng.uniform(0, w - s + 1))
        patch = img[y:y + s, x:x + s]
        # area-style resize via local mean then bilinear remainder
        import jax
        import jax.numpy as jnp
        patch = np.asarray(jax.image.resize(jnp.asarray(patch),
                                            (size, size), "linear"))
        crops.append(np.clip(patch, 0.0, 1.0))
    return crops


@functools.lru_cache(maxsize=None)
def natural_images(n: int, size: int) -> np.ndarray:
    """``[n, size, size]`` float32 natural anchor batch in [0, 1].

    Deterministic: round-robin over the bundled sources with fixed crop
    seeds, so every eval run scores the identical set.
    """
    srcs = _source_images()
    if not srcs:
        raise RuntimeError("no bundled natural sample images found")
    per = -(-n // len(srcs))
    imgs = []
    for j, img in enumerate(srcs):
        imgs.extend(_crops(img, size, per, seed=101 + j))
    out = np.stack(imgs[:n]).astype(np.float32)
    # the batch is lru_cached and shared across every eval set built in
    # this process — freeze it so a mutating caller fails loudly instead
    # of corrupting later sets (advisor r3)
    out.setflags(write=False)
    return out
