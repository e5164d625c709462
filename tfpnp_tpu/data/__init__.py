"""Data sources: procedural on-device generator, host folder corpora,
and reference-artifact loaders."""

from __future__ import annotations

from .synthetic import random_image, random_images  # noqa: F401

__all__ = ["random_image", "random_images", "gt_source"]


def gt_source(opt, size=None):
    """Training ground-truth sampler ``(key, batch) -> [batch, n, n]``.

    With ``--data_root`` set, images come from a device-resident folder
    corpus (the reference's ImageFolder + DataLoader pipeline,
    data/dataset.py:9, re-designed as one h2d upload + jitted gather);
    otherwise from the procedural generator. ``size`` overrides
    ``opt.image_size`` (the SR task rounds it to a multiple of the scale).
    """
    size = size or opt.image_size
    root = getattr(opt, "data_root", None)
    if root:
        from .folder import CorpusSampler, load_corpus
        return CorpusSampler(load_corpus(root, size))
    return lambda key, batch: random_images(key, batch, size)
