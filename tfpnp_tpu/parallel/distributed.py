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
from typing import Optional

import jax

__all__ = ["init_distributed", "is_multi_host", "local_batch_slice"]


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
    (per-host data loading: each host synthesizes/loads only its shard)."""
    per = global_batch // jax.process_count()
    lo = per * jax.process_index()
    return slice(lo, lo + per)
