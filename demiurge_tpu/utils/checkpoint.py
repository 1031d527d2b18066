"""Checkpoint/resume for long simulations (SURVEY §5).

The reference has no restart story — cancelling a filter restores a backup
texture (ProgressFilter abort -> restoreBackup, src/filter/Filter.cpp:105-108)
and `file_write` exports lossy 8-bit PNG (src/Project.cpp:56-67).  Long pod
runs need real fault tolerance: periodically persist the full prognostic
state, atomically, and resume from the latest complete checkpoint after a
crash or preemption.

Two formats:

- ``save``/``load`` — one ``.npz`` holding every array leaf of the state
  pytree plus the step counter and grid metadata; written to a temp file
  and ``os.replace``d so a kill mid-write never corrupts the resume point.
  Sharded arrays are gathered to the host — fine at single-host sizes.
- ``save_sharded``/``load_sharded`` — a checkpoint DIRECTORY with one
  ``shard_{process_index}.npz`` per process holding only that process's
  addressable shards (device-local slices, no global materialization) plus
  a ``manifest.npz`` written last by process 0 (its presence marks the
  checkpoint complete).  Resume on the same mesh topology reads back each
  process's own file and rebuilds the ``jax.Array``s with
  ``make_array_from_single_device_arrays``; a single-host reader can also
  assemble the global state from all shard files (``load_sharded`` with
  ``sharding=None``).  This is the multi-host path for the 8192x4096
  config-5 runs where a gather would not fit one host.
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
    saved = [f.name for f in dataclasses.fields(state)
             if getattr(state, f.name) is not None]
    payload = {"__magic__": np.array(_MAGIC),
               "__step__": np.int64(step),
               "__fields__": np.array(saved)}
    for name in saved:   # None leaves (optional fields) default on load
        payload["f_" + name] = np.asarray(getattr(state, name))
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
    """Return `path` if a complete checkpoint exists there, else None.

    Accepts both single-file and sharded-directory checkpoints."""
    if os.path.isdir(path):
        return path if os.path.exists(os.path.join(path, "manifest.npz")) \
            else None
    return path if os.path.exists(path) else None


# ---------------------------------------------------------------------------
# sharded (per-process) checkpoints
# ---------------------------------------------------------------------------


def save_sharded(dir_path: str, state, step: int, grid=None) -> None:
    """Write each process's addressable shards to its own file; no global
    gather.  Process 0 writes the manifest last (completeness marker)."""
    import jax

    pidx = jax.process_index()
    os.makedirs(dir_path, exist_ok=True)

    payload = {}
    meta_fields = []
    for f in dataclasses.fields(state):
        arr = getattr(state, f.name)
        if arr is None:   # optional field: defaults on load
            continue
        meta_fields.append(f.name)
        if hasattr(arr, "addressable_shards") and getattr(
                arr, "ndim", 0) > 0 and hasattr(arr, "sharding"):
            for i, sh in enumerate(arr.addressable_shards):
                payload[f"f_{f.name}__{i}"] = np.asarray(sh.data)
                idx = [(sl.start or 0,
                        sl.stop if sl.stop is not None else dim)
                       for sl, dim in zip(sh.index, arr.shape)]
                payload[f"i_{f.name}__{i}"] = np.asarray(idx, np.int64)
        else:  # scalar / replicated-small leaf: store plainly
            payload[f"s_{f.name}"] = np.asarray(arr)

    fd, tmp = tempfile.mkstemp(dir=dir_path, suffix=".tmp")
    shard_file = os.path.join(dir_path, f"shard_{pidx:05d}.npz")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez_compressed(fh, **payload)
        os.replace(tmp, shard_file)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise

    if jax.process_count() > 1:  # all shard files before the manifest
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("demiurge_tpu-ckpt")

    if pidx == 0:
        manifest = {"__magic__": np.array(_MAGIC),
                    "__step__": np.int64(step),
                    "__nproc__": np.int64(jax.process_count()),
                    "__fields__": np.array(meta_fields)}
        for f in dataclasses.fields(state):
            arr = getattr(state, f.name)
            if arr is None:
                continue
            manifest[f"shape_{f.name}"] = np.asarray(
                getattr(arr, "shape", ()), np.int64)
            manifest[f"dtype_{f.name}"] = np.array(
                str(np.dtype(getattr(arr, "dtype", np.float32))))
        if grid is not None:
            manifest["__coords__"] = np.asarray(grid.coords, np.float64)
            manifest["__circumference__"] = np.float64(grid.circumference)
        fd, tmp = tempfile.mkstemp(dir=dir_path, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as fh:
                np.savez_compressed(fh, **manifest)
            os.replace(tmp, os.path.join(dir_path, "manifest.npz"))
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    if jax.process_count() > 1:
        # do not return before the manifest is durable: a process that
        # immediately re-opens the checkpoint (resume-after-save) must
        # never race process 0's manifest write (found by
        # tools/multiprocess_test.py in the round-5 two-process run)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("demiurge_tpu-ckpt-manifest")


def load_sharded(dir_path: str, state_cls, sharding=None):
    """Load a sharded checkpoint; returns (state, step).

    With ``sharding`` (a NamedSharding on the resume mesh), each process
    reads only its own shard file and the global arrays are assembled
    device-side with ``make_array_from_single_device_arrays`` — the
    same-topology multi-host resume path.  Without it, all shard files are
    read and assembled into host arrays (single-host convenience)."""
    import jax
    import jax.numpy as jnp

    with np.load(os.path.join(dir_path, "manifest.npz"),
                 allow_pickle=False) as m:
        if str(m["__magic__"]) != _MAGIC:
            raise ValueError(f"{dir_path}: not a demiurge_tpu checkpoint")
        step = int(m["__step__"])
        nproc = int(m["__nproc__"])
        fields = [str(s) for s in m["__fields__"]]
        shapes = {n: tuple(int(x) for x in m[f"shape_{n}"]) for n in fields}
        dtypes = {n: np.dtype(str(m[f"dtype_{n}"])) for n in fields}

    kw = {}
    if sharding is not None:
        pidx = jax.process_index()
        with np.load(os.path.join(dir_path, f"shard_{pidx:05d}.npz"),
                     allow_pickle=False) as z:
            files = set(z.files)
            for name in fields:
                if f"s_{name}" in files:
                    kw[name] = jnp.asarray(z[f"s_{name}"])
                    continue
                # device -> global index map of the target sharding
                dmap = sharding.addressable_devices_indices_map(shapes[name])
                # saved shards keyed by their global start offsets
                saved = {}
                i = 0
                while f"f_{name}__{i}" in files:
                    idx = z[f"i_{name}__{i}"]
                    saved[tuple(int(r[0]) for r in idx)] = z[f"f_{name}__{i}"]
                    i += 1
                bufs = []
                for dev, idx in dmap.items():
                    key = tuple((sl.start or 0) for sl in idx)
                    bufs.append(jax.device_put(saved[key], dev))
                kw[name] = jax.make_array_from_single_device_arrays(
                    shapes[name], sharding, bufs)
    else:
        for name in fields:
            kw[name] = None
        for p in range(nproc):
            with np.load(os.path.join(dir_path, f"shard_{p:05d}.npz"),
                         allow_pickle=False) as z:
                files = set(z.files)
                for name in fields:
                    if f"s_{name}" in files:
                        kw[name] = jnp.asarray(z[f"s_{name}"])
                        continue
                    i = 0
                    while f"f_{name}__{i}" in files:
                        if kw[name] is None:
                            kw[name] = np.zeros(shapes[name], dtypes[name])
                        idx = z[f"i_{name}__{i}"]
                        sl = tuple(slice(int(a), int(b)) for a, b in idx)
                        kw[name][sl] = z[f"f_{name}__{i}"]
                        i += 1
        kw = {n: jnp.asarray(v) if isinstance(v, np.ndarray) else v
              for n, v in kw.items()}
    return state_cls(**kw), step
