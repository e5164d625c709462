"""Portable eval-batch storage: data dicts <-> ``.npz`` files.

The reference evaluates against pregenerated per-image ``.mat`` files
(``CSMRIEvalDataset``, tasks/csmri/dataset.py:85-107). Here a whole eval
batch is one ``.npz``: written by ``scripts/convert_reference_data.py``
from the reference's artifacts, consumed by the CLI via
``--eval_data name=path.npz`` — enabling direct PSNR-table comparison on
the reference's own test sets.

Complex leaves are stored as ``{key}__re``/``{key}__im`` float32 pairs
and recombined *inside a jitted program*: the tunneled TPU backend
rejects eager complex64 ops and transfers (CLAUDE.md rules 3-4).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_data_npz", "load_data_npz"]


def save_data_npz(path, data: Dict[str, jnp.ndarray]) -> None:
    flat = {}
    for k, v in data.items():
        a = np.asarray(jax.device_get(v)) if isinstance(v, jax.Array) else np.asarray(v)
        if np.iscomplexobj(a):
            flat[f"{k}__re"] = a.real.astype(np.float32)
            flat[f"{k}__im"] = a.imag.astype(np.float32)
        else:
            flat[k] = a
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


@jax.jit
def _combine(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return (re + 1j * im).astype(jnp.complex64)


def load_data_npz(path) -> Dict[str, jnp.ndarray]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    data: Dict[str, jnp.ndarray] = {}
    for k, v in flat.items():
        if k.endswith("__re"):
            base = k[:-4]
            data[base] = _combine(jnp.asarray(v), jnp.asarray(flat[base + "__im"]))
        elif not k.endswith("__im"):
            data[k] = jnp.asarray(v)
    return data
