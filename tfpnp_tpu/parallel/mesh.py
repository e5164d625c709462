"""Device mesh + sharding helpers (the distributed backend).

Replaces the reference's single-process multi-GPU runtime — DataParallel
scatter/gather plus thread-queue sync-BN (tfpnp/policy/sync_batchnorm/,
736 LoC; see SURVEY.md section 2.3) — with JAX GSPMD:

- a named ``Mesh`` with a data axis ``dp`` (scenario batch) and a spare
  model axis ``mp`` (unused at reference model sizes, reserved for larger
  priors),
- batches placed with ``NamedSharding(P('dp'))``; under ``jit`` every
  batch-mean (losses, rewards, BN statistics) lowers to ICI collectives —
  cross-replica BN sync is the default behavior,
- gradients are averaged across ``dp`` implicitly because the loss is a
  global batch mean.

Multi-host: the same code runs under ``jax.distributed.initialize`` — the
mesh spans all processes' devices and GSPMD routes inter-host reductions
over DCN. Nothing in the trainer changes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharder", "replicate"]


def make_mesh(n_dp: Optional[int] = None, n_mp: int = 1,
              devices=None) -> Mesh:
    """Build a ('dp', 'mp') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_mp
    assert n_dp * n_mp <= len(devices), (n_dp, n_mp, len(devices))
    arr = np.array(devices[: n_dp * n_mp]).reshape(n_dp, n_mp)
    return Mesh(arr, ("dp", "mp"))


def batch_sharder(mesh: Mesh):
    """Returns ``f(pytree) -> pytree`` placing every leaf with its leading
    (batch) axis split over 'dp'. Scalars/rank-0 leaves are replicated."""
    n_dp = mesh.shape["dp"]

    def place(x):
        x = jax.numpy.asarray(x)
        if mesh.size == 1:
            # single-device mesh: placement is the identity; skipping the
            # device_put also avoids the tunneled runtime's unimplemented
            # complex64 transfer path
            return x
        if x.ndim == 0 or x.shape[0] % n_dp != 0:
            # indivisible batches (e.g. a 7-image eval set on 8 chips) are
            # replicated rather than padded — correctness over speed there
            spec = P()
        else:
            spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return lambda tree: jax.tree.map(place, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (parameters) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
