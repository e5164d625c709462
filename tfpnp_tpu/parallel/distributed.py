"""Multi-host bring-up helpers.

The reference is strictly single-process (SURVEY §2.3). Here multi-host
is the same program: call ``init_distributed()`` once per host before
building the mesh and every ``jax.devices()``-wide mesh spans the slice;
GSPMD routes cross-host reductions over DCN and intra-slice ones over ICI.

Coordinator discovery follows the standard JAX environment contract
(``jax.distributed.initialize`` reads the TPU metadata / env vars), with
explicit overrides for manual launches.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["init_distributed", "is_multi_host", "local_batch_slice",
           "local_rows"]


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX if the environment asks for it.

    Returns True when running multi-process. No-op (False) for
    single-host runs, so the CLI can call it unconditionally.
    """
    coordinator = coordinator or os.environ.get("TFPNP_COORDINATOR")
    num_processes = num_processes or _int_env("TFPNP_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("TFPNP_PROCESS_ID")
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_multi_host() -> bool:
    return jax.process_count() > 1


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a globally-sharded batch this host should produce
    (per-host data loading: each host synthesizes/loads only its shard).
    Production call sites: ``parallel.mesh.batch_sharder`` (global-batch
    assembly) and the trainer's multi-host replay path."""
    per = global_batch // jax.process_count()
    lo = per * jax.process_index()
    return slice(lo, lo + per)


def local_rows(tree: Any, axis: int = 0) -> Any:
    """Host-side view of the rows of a (possibly) globally-sharded pytree
    that THIS process can address, concatenated in global order along
    ``axis``. ``jax.device_get`` of a multi-host array raises (shards on
    other hosts are unreachable); this is the per-host replacement used by
    the trainer to pull its replay shard and logging stats out of a
    dp-sharded rollout. Single-process arrays pass through whole."""

    def one(a):
        if not hasattr(a, "addressable_shards"):
            return np.asarray(a)
        # dedupe replicas (replicated arrays carry one shard per device)
        seen = {}
        for s in a.addressable_shards:
            key = tuple((sl.start, sl.stop) for sl in s.index)
            seen.setdefault(key, s)
        shards = sorted(seen.values(),
                        key=lambda s: s.index[axis].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards],
                              axis=axis)

    return jax.tree.map(one, tree)
