"""Spatial (image-row) sharding over the 'mp' mesh axis.

The reference caps everything at 128x128 because its DataParallel runtime
can only split the *batch* (SURVEY.md section 5: "long-context" analogue =
image resolution). On a TPU mesh the natural second axis is the image
itself: rows are sharded over 'mp', and GSPMD inserts the halo exchanges
for the denoiser's convolutions and the all-to-alls for the FFT/data-
consistency steps automatically — the solver code does not change.

Use for large-image (512^2+) inference where one chip's HBM or latency
budget is exceeded:

    mesh = make_mesh(n_dp=2, n_mp=4)          # 8 chips: 2-way batch x 4-way rows
    data = spatial_sharder(mesh)(data)        # [B, H, W] leaves -> P('dp','mp')
    out = jax.jit(restore)(data)              # same program, now sharded

Placement rule (see ``spatial_spec``): the leading axis is the batch
('dp'); the second-to-last axis is the image-row axis H ('mp') — matching
every data layout in this package ([B,H,W], [B,S,H,W], [B,K*H,K*W]).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["spatial_spec", "spatial_sharder"]


def spatial_spec(x: Any, n_dp: int, n_mp: int) -> P:
    """PartitionSpec for one array: batch over 'dp', rows over 'mp'.

    Axes that do not divide evenly stay unsharded (correctness first);
    rank<3 leaves get batch sharding only."""
    x = jax.numpy.asarray(x)
    if x.ndim == 0:
        return P()
    axes: list = [None] * x.ndim
    if x.shape[0] % n_dp == 0:
        axes[0] = "dp"
    if x.ndim >= 3 and x.shape[-2] % n_mp == 0:
        axes[-2] = "mp"
    return P(*axes)


def spatial_sharder(mesh: Mesh):
    """Returns ``f(pytree) -> pytree`` placing leaves per ``spatial_spec``.

    Complements ``batch_sharder`` (dp-only): use this when a single image
    is large enough to split across chips."""
    n_dp, n_mp = mesh.shape["dp"], mesh.shape["mp"]

    def place(x):
        x = jax.numpy.asarray(x)
        if mesh.size == 1:
            return x
        return jax.device_put(
            x, NamedSharding(mesh, spatial_spec(x, n_dp, n_mp)))

    return lambda tree: jax.tree.map(place, tree)
