"""Host-side experience replay over observation pytrees.

Re-design of /root/reference/tfpnp/utils/rpm.py + the trainer's
``save_experience``/``convert2batch`` (trainer.py:224-241). The reference
keeps a Python list of per-sample ``Batch`` objects and stacks a random
subset per update; here storage is preallocated numpy arrays per pytree
leaf (fixed shapes — the device side never sees a dynamic batch), inserts
are vectorized ring writes of only the alive rows, and sampling gathers one
stacked tree ready for a single host->device transfer.

The reference's ``GroupReplayMemory`` (rpm.py:39-86) is keyed by sample
shape to support mixed-size batches; with static shapes per task that
degenerates to this buffer, so it is intentionally not rebuilt (its trim
branch is also broken, rpm.py:56).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

__all__ = ["ReplayBuffer"]


class ReplayBuffer:
    """Uniform-sampling ring buffer of observation pytrees.

    Capacity semantics match the reference: ``rmsize * max_episode_step``
    entries (trainer.py:46), one entry per (sample, step).
    """

    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        self._storage: Optional[Any] = None  # pytree of [capacity, ...] numpy
        self._idx = 0
        self._size = 0

    def __len__(self) -> int:
        return self._size

    @property
    def size(self) -> int:
        return self._size

    def store_batch(self, tree: Any, keep: np.ndarray) -> int:
        """Insert rows ``i`` of a ``[B, ...]`` pytree where ``keep[i]``.

        Returns the number of rows stored.
        """
        tree = jax.device_get(tree)
        keep = np.asarray(keep, bool)
        k = int(keep.sum())
        if k == 0:
            return 0
        if self._storage is None:
            self._storage = jax.tree.map(
                lambda a: np.empty((self.capacity,) + a.shape[1:], a.dtype), tree)
        pos = (self._idx + np.arange(k)) % self.capacity

        def insert(buf, batch):
            buf[pos] = batch[keep]
            return buf

        jax.tree.map(insert, self._storage, tree)
        self._idx = int((self._idx + k) % self.capacity)
        self._size = int(min(self._size + k, self.capacity))
        return k

    def sample(self, batch_size: int, rng: np.random.Generator) -> Any:
        """Uniformly sample a stacked ``[batch_size, ...]`` pytree
        (reference rpm.py:24-30 samples with replacement only when short;
        we sample with replacement iff size < batch_size)."""
        assert self._size > 0, "empty replay buffer"
        replace = self._size < batch_size
        idx = rng.choice(self._size, size=batch_size, replace=replace)
        return jax.tree.map(lambda buf: buf[idx], self._storage)
