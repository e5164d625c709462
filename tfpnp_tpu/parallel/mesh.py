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

__all__ = ["make_mesh", "batch_sharder", "local_assembler", "replicate"]


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
    (batch) axis split over 'dp'. Scalars/rank-0 leaves are replicated.

    Input contract: every process holds the FULL global batch (identical
    across processes — e.g. same-keyed procedural synthesis). Single
    process places with ``device_put``; multi-host keeps only this host's
    ``local_batch_slice`` rows and assembles the global array with
    ``jax.make_array_from_process_local_data`` — the device-boundary
    wiring the reference does with DataParallel scatter
    (trainer.py:274-282), at the multi-host scale it never reached."""
    n_dp = mesh.shape["dp"]
    multi = jax.process_count() > 1

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
        sharding = NamedSharding(mesh, spec)
        if not multi:
            return jax.device_put(x, sharding)
        from .distributed import local_batch_slice
        host = np.asarray(jax.device_get(x))
        if spec == P():
            return jax.make_array_from_process_local_data(
                sharding, host, host.shape)
        return jax.make_array_from_process_local_data(
            sharding, host[local_batch_slice(host.shape[0])], host.shape)

    return lambda tree: jax.tree.map(place, tree)


def local_assembler(mesh: Mesh):
    """Returns ``f(pytree) -> pytree`` assembling per-host row blocks into
    a global dp-sharded batch: each process passes ONLY its own rows
    (global batch = rows x process_count, in process order). This is the
    multi-host replay-sampling path: every host samples from its local
    ring and contributes its block. Single-process it degenerates to
    ``batch_sharder``."""
    if jax.process_count() == 1:
        return batch_sharder(mesh)
    n_dp = mesh.shape["dp"]
    nproc = jax.process_count()

    def place(x):
        host = np.asarray(jax.device_get(x))
        gshape = (host.shape[0] * nproc,) + host.shape[1:]
        if gshape[0] % n_dp != 0:
            raise ValueError(f"global rows {gshape[0]} not divisible by dp={n_dp}")
        spec = P("dp", *([None] * (host.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), host, gshape)

    return lambda tree: jax.tree.map(place, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (parameters) across the mesh — including a
    multi-host mesh, where plain ``device_put`` of a process-local array
    cannot target unaddressable devices."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def place(x):
        host = np.asarray(jax.device_get(x))
        return jax.make_array_from_process_local_data(sharding, host,
                                                      host.shape)

    return jax.tree.map(place, tree)
