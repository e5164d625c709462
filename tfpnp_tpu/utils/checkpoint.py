"""Checkpoint backends: pickle files and orbax directories.

The reference checkpoints only actor/critic ``state_dict`` pickles
(``tfpnp/trainer/mddpg/trainer.py:243-263``) and acknowledges the resume
gaps (optimizers, RNG, buffer) in ``docs/todo.md:9``. Here the FULL train
state round-trips through either backend:

- **pickle** (``*.pkl``): single host file, zero deps — the default, and
  the format of the shipped policy registry.
- **orbax** (any other path; written as a directory): per-array
  tensorstore storage via ``orbax.checkpoint.StandardCheckpointer``.
  Arrays are saved/restored with their shardings, so a multi-host mesh
  writes its own shards and restores without gathering to one host —
  the scaling story pickle cannot offer.

Non-array metadata (``step``, numpy bit-generator state — arbitrary-
precision ints) rides in a ``meta.json`` sidecar inside the directory.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["save_state", "load_state"]

# keys that are not array pytrees and go to meta.json under orbax
_META_KEYS = ("step", "np_rng", "episode", "best_eval")
# keys whose tree structure is only known at save time (the replay ring's
# leaf set depends on the task); restored without a template
_UNTEMPLATED_KEYS = ("replay",)


def save_state(path, state: Dict[str, Any]) -> None:
    """Write ``state`` to ``path``; ``.pkl`` → pickle, else orbax dir."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.suffix == ".pkl":
        host = jax.tree.map(lambda a: np.asarray(a), state)
        with open(path, "wb") as f:
            pickle.dump(host, f)
        return

    import orbax.checkpoint as ocp

    meta = {k: state[k] for k in _META_KEYS if k in state}
    arrays = {k: v for k, v in state.items()
              if k not in _META_KEYS and k not in _UNTEMPLATED_KEYS}
    ck = ocp.StandardCheckpointer()
    ck.save(str((path / "arrays").resolve()), arrays, force=True)
    for k in _UNTEMPLATED_KEYS:
        if state.get(k) is not None:
            # drop None leaves (e.g. an empty ring's storage) — orbax
            # cannot serialize None; load_state restores what was saved
            sub = {kk: vv for kk, vv in state[k].items() if vv is not None}
            ck.save(str((path / k).resolve()), sub, force=True)
    if hasattr(ck, "wait_until_finished"):
        ck.wait_until_finished()
    if jax.process_index() == 0:  # one writer on a shared filesystem
        (path / "meta.json").write_text(json.dumps(meta))


def load_state(path, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Read a checkpoint written by :func:`save_state`.

    ``template`` (a live state dict of the same structure) lets orbax
    restore optax namedtuple states and honor current array shardings;
    without it the arrays come back as plain nested dicts/lists — enough
    for eval-time ``actor_params``/``actor_stats`` access.
    """
    path = Path(path)
    if not path.is_dir():
        with open(path, "rb") as f:
            return pickle.load(f)

    import orbax.checkpoint as ocp

    meta = json.loads((path / "meta.json").read_text())
    tmpl = None
    if template is not None:
        arrays_t = {k: v for k, v in template.items()
                    if k not in _META_KEYS and k not in _UNTEMPLATED_KEYS}
        tmpl = jax.tree.map(ocp.utils.to_shape_dtype_struct, arrays_t)
    ck = ocp.StandardCheckpointer()
    arrays = ck.restore(str((path / "arrays").resolve()), tmpl)
    extra = {}
    for k in _UNTEMPLATED_KEYS:
        if (path / k).exists():
            extra[k] = dict(ck.restore(str((path / k).resolve())))
    return {**dict(arrays), **extra, **meta}
