"""Artifact plotting/saving (reference tfpnp/utils/visualize.py)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["save_img", "seq_plot"]


def save_img(img: np.ndarray, path) -> None:
    """Save a [H, W] float image in [0, 1] as 8-bit PNG
    (reference visualize.py:24-33)."""
    from PIL import Image
    arr = np.clip(np.asarray(img), 0.0, 1.0)
    Image.fromarray((arr * 255).astype(np.uint8)).save(str(path))


def seq_plot(seq, xlabel: str, ylabel: str, save_path) -> None:
    """Step plot of a per-iteration sequence (reference visualize.py:5-21)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    ax.plot(np.arange(1, len(seq) + 1), np.asarray(seq), marker="o")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.savefig(str(save_path), bbox_inches="tight", dpi=80)
    plt.close(fig)
