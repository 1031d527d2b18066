"""Checkpoint/resume for long simulations (SURVEY §5).

The reference has no restart story — cancelling a filter restores a backup
texture (ProgressFilter abort -> restoreBackup, src/filter/Filter.cpp:105-108)
and `file_write` exports lossy 8-bit PNG (src/Project.cpp:56-67).  Long pod
runs need real fault tolerance: periodically persist the full prognostic
state, atomically, and resume from the latest complete checkpoint after a
crash or preemption.

Format: one ``.npz`` per checkpoint holding every array leaf of the state
pytree plus the step counter and grid metadata; written to a temp file and
``os.replace``d so a kill mid-write never corrupts the resume point.
Sharded arrays are gathered via ``np.asarray`` (fine up to the single-host
sizes we bench; multi-host would switch to per-shard files keyed by
``jax.process_index()``).
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
from typing import Optional, Tuple

import numpy as np

_MAGIC = "demiurge_tpu-ckpt-v1"


def save(path: str, state, step: int, grid=None) -> None:
    """Atomically write `state` (a dataclass pytree of arrays) at `step`."""
    payload = {"__magic__": np.array(_MAGIC),
               "__step__": np.int64(step),
               "__fields__": np.array(
                   [f.name for f in dataclasses.fields(state)])}
    for f in dataclasses.fields(state):
        payload["f_" + f.name] = np.asarray(getattr(state, f.name))
    if grid is not None:
        payload["__coords__"] = np.asarray(grid.coords, np.float64)
        payload["__circumference__"] = np.float64(grid.circumference)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez_compressed(fh, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str, state_cls) -> Tuple[object, int]:
    """Load a checkpoint into `state_cls`; returns (state, step)."""
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as z:
        if str(z["__magic__"]) != _MAGIC:
            raise ValueError(f"{path}: not a demiurge_tpu checkpoint")
        step = int(z["__step__"])
        kw = {name: jnp.asarray(z["f_" + name])
              for name in [str(s) for s in z["__fields__"]]}
    return state_cls(**kw), step


def latest(path: str) -> Optional[str]:
    """Return `path` if a complete checkpoint exists there, else None."""
    return path if os.path.exists(path) else None
