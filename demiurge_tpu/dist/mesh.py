"""Device-mesh setup and sharded execution of the simulation.

The reference is strictly single-GPU (SURVEY §2.8); distribution is this
framework's core addition.  The lat-lon grid is spatially decomposed over a
2D device mesh ('y' = latitude bands, 'x' = longitude sectors); all fields
are (H, W) arrays sharded as P('y', 'x').

Two execution paths:

- **GSPMD path** (this module): jit the unmodified single-chip operators
  with NamedSharding annotations and let XLA insert halo exchanges
  (collective-permutes) for the stencil shifts/rolls automatically.  This is
  the robust path that keeps every op — including irregular ones like
  pointer-doubling flow accumulation — correct under sharding.
- **Explicit halo path** (:mod:`demiurge_tpu.dist.halo`): shard_map kernels
  with hand-placed `jax.lax.ppermute` halo exchanges (E/W dateline-periodic
  ring, N/S bands, antipodal polar-cap permute), overlapped with interior
  compute for the perf-critical iterative solvers.

Multi-host: `initialize()` wraps jax.distributed.initialize; the same mesh
code spans hosts (devices = jax.devices() across the pod slice); DCN-crossing
axes should be the 'y' axis (fewer, wider messages).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(**kwargs):
    """Multi-host init (no-op if single-process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def choose_mesh_shape(n_devices: int) -> Tuple[int, int]:
    """Factor n into (ny, nx), preferring near-square with nx >= ny.

    nx (longitude sectors) rides the fastest ICI ring for the E/W exchanges
    which dominate (dateline periodicity makes 'x' a true ring).
    """
    best = (1, n_devices)
    for ny in range(1, int(math.isqrt(n_devices)) + 1):
        if n_devices % ny == 0:
            best = (ny, n_devices // ny)
    return best


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Tuple[int, int]] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if shape is None:
        shape = choose_mesh_shape(n_devices)
    ny, nx = shape
    assert ny * nx == n_devices
    arr = np.array(devs[:n_devices]).reshape(ny, nx)
    return Mesh(arr, ("y", "x"))


def field_sharding(mesh: Mesh) -> NamedSharding:
    """(H, W) fields: rows over 'y', columns over 'x'."""
    return NamedSharding(mesh, P("y", "x"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_field(x, mesh: Mesh):
    return jax.device_put(x, field_sharding(mesh))


def sharded_jit(fn, mesh: Mesh, *, static_argnames=()):
    """jit `fn` with all (H, W) array args/outputs sharded P('y','x').

    The single-chip operators in demiurge_tpu.ops are pure jnp programs;
    under these shardings GSPMD partitions the stencils with halo
    collective-permutes and keeps elementwise work fully local.
    """
    s = field_sharding(mesh)

    def spec_like(tree):
        return jax.tree_util.tree_map(lambda _: s, tree)

    @partial(jax.jit, static_argnames=static_argnames)
    def wrapper(*args, **kwargs):
        args = jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(a, s)
            if hasattr(a, "ndim") and getattr(a, "ndim", 0) == 2 else a,
            args,
        )
        out = fn(*args, **kwargs)
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(a, s)
            if hasattr(a, "ndim") and getattr(a, "ndim", 0) == 2 else a,
            out,
        )

    return wrapper
