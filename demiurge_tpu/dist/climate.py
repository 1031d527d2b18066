"""Amortized distributed climate step: K substeps per ONE halo exchange.

Under GSPMD, each of the K substeps of ops.temperature.temperature_step
emits its own collectives (the 1/cos(phi)-stretched Laplacian taps shift
across shard boundaries every substep).  This module restructures the
step the way pallas_kernels.climate does on one chip:

- all_to_all along 'x' into the FLATTENED row-group layout (full-width
  rows per device, dist.halo.exchange_rows_halo): the stretched x taps
  reach up to 1/cos(phi) ~ W/6 columns near the poles, far beyond any
  fixed x halo — with whole rows they are local, and the pole-cap halo
  is a local flip+half-roll instead of an antipodal-shard permute.
- ONE K-deep row halo exchange of T (+ the static dt/C field and per-row
  tables, padded once); then K substeps run locally, validity shrinking
  one ring per substep — the same argument as the single-chip kernel:
  the corner-tap sum 2*(a+c+g+i) - 8*e is symmetric in +-dy, so
  pole-reflected halo rows evolve as exact antipodal mirrors.
- all_to_all back.

Numerics match pallas_kernels.climate exactly (summed-Laplacian form; an
f32 reassociation-level difference from the per-component XLA path).
Collectives per step: 4 all_to_all + a handful of k-row ppermutes,
independent of K.  (Reference: src/filter/Temperature.cpp:52-150.)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.grid import Grid
from ..pallas_kernels.climate import _row_shifts, climate_supported
from .halo import exchange_rows_halo

PI = math.pi
_SPEC = P("y", "x")


def climate_sharded_supported(grid: Grid, mesh: Mesh,
                              substeps: int) -> bool:
    ny, nx = mesh.shape["y"], mesh.shape["x"]
    H, W = grid.shape
    if not climate_supported(grid, band=1):
        return False
    if H % (ny * nx) != 0 or W % nx != 0:
        return False
    return H // (ny * nx) >= substeps  # halo depth <= local rows


@partial(jax.jit, static_argnames=("grid", "mesh", "substeps", "albedo",
                                   "diffusivity"))
def climate_step_sharded(T, terrain, i0, grid: Grid, mesh: Mesh,
                         substeps: int = 10, albedo: float = 0.30,
                         diffusivity: float = 0.55e6):
    """Drop-in for ops.temperature.temperature_step under a mesh.
    Returns (T_new, i0 + substeps)."""
    from ..ops.temperature import SUBSTEPS_PER_YEAR, YEAR_SECONDS, qday

    H, W = grid.shape
    ny, nx = mesh.shape["y"], mesh.shape["x"]
    D = ny * nx
    rows_loc = H // D
    K = substeps
    assert climate_sharded_supported(grid, mesh, K), (grid.shape,
                                                      mesh.shape, K)
    nstages = max(1, int(math.ceil(math.log2(W))))

    # static per-row tables, sharded P('y', None): each y-shard holds all
    # of its x-subgroups' rows — sliced locally, no redistribution needed
    kneg_np, kpos_np = _row_shifts(grid)
    shifts_g = jnp.stack([jnp.asarray(kneg_np, jnp.int32),
                          jnp.asarray(kpos_np, jnp.int32)], axis=1)  # (H,2)
    r = np.arange(H, dtype=np.float32)
    t = (r + np.float32(0.5)) / np.float32(H)
    phi_g = jnp.asarray(
        t * np.float32(grid.phi1 - grid.phi0) + np.float32(grid.phi0)
    ).reshape(H, 1)

    atmosphere = 1e7
    C = atmosphere + jnp.where(terrain > 0, atmosphere * 0.5,
                               4 * 1.5 * atmosphere)
    cinv_g = YEAR_SECONDS / SUBSTEPS_PER_YEAR / C
    _, dy = grid.pixelsize_rows()
    diff_scale = diffusivity / (4.0 * dy * dy)
    i0 = jnp.asarray(i0, jnp.float32)
    M = (2.0 * PI / SUBSTEPS_PER_YEAR) * (i0 + jnp.arange(K,
                                                          dtype=jnp.float32))

    def body(T_b, cinv_b, shifts_b, phi_b):
        def to_rows(x):
            if nx == 1:
                return x
            return jax.lax.all_to_all(x, "x", split_axis=0, concat_axis=1,
                                      tiled=True)

        def to_blocks(x):
            if nx == 1:
                return x
            return jax.lax.all_to_all(x, "x", split_axis=1, concat_axis=0,
                                      tiled=True)

        xi = jax.lax.axis_index("x")
        r0 = xi * rows_loc  # row offset within this y-shard's table block

        def slice_rows(tab):
            return jax.lax.dynamic_slice_in_dim(tab, r0, rows_loc, 0)

        Tp = exchange_rows_halo(to_rows(T_b), K, mesh, grid, "reflect")
        cinvp = exchange_rows_halo(to_rows(cinv_b), K, mesh, grid,
                                   "reflect")
        # per-row tables: same reflect+neighbor padding; shifts ride as
        # int32 through the same ppermutes (W=2 columns, no x roll issues
        # since exchange_rows_halo's reflect roll is -(ncols//2) — use a
        # 2-col roll-free variant by padding the (rows,2) arrays manually
        shp = _pad_table(slice_rows(shifts_b), K, mesh)
        php = _pad_table(slice_rows(phi_b), K, mesh)

        kneg = shp[:, 0:1]
        kpos = shp[:, 1:2]
        asr = (1.0 - albedo) * qday(php, M.reshape(1, -1))  # (rows+2K, K)

        T_ = Tp
        for s in range(K):
            S = jnp.roll(T_, 1, 0) + jnp.roll(T_, -1, 0)
            left = S
            right = S
            for j in range(nstages):
                step = (1 << j) % W
                if step:
                    lr = jnp.roll(left, -step, 1)   # col c reads c+step
                    rr = jnp.roll(right, -step, 1)
                    left = jnp.where(((kneg >> j) & 1) != 0, lr, left)
                    right = jnp.where(((kpos >> j) & 1) != 0, rr, right)
            lap = 2.0 * (left + right) - 8.0 * T_
            Tk = T_ + 273.15
            T2 = Tk * Tk
            olr = (210.0 * 0.93 / 273.4**4) * (T2 * T2)
            T_ = T_ + (asr[:, s:s + 1] - olr + diff_scale * lap) * cinvp
        return to_blocks(T_[K:-K, :])

    def _pad_table(tab, k, mesh_):
        # row tables pad like fields except the pole reflect has no
        # half-world roll (they are per-row scalars, longitude-invariant)
        ny_ = mesh_.shape["y"]
        nx_ = mesh_.shape["x"]
        yi = jax.lax.axis_index("y")
        xi = jax.lax.axis_index("x")
        from .halo import _perm_ring

        def from_prev(tail):
            v = jax.lax.ppermute(tail, "x", _perm_ring(nx_, 1)) \
                if nx_ > 1 else tail
            if ny_ > 1:
                vy = jax.lax.ppermute(v, "y",
                                      [(i, i + 1) for i in range(ny_ - 1)])
                v = jnp.where(xi == 0, vy, v)
            elif nx_ == 1:
                v = jnp.zeros_like(v)
            else:
                v = jnp.where(xi == 0, jnp.zeros_like(v), v)
            return v

        def from_next(head):
            v = jax.lax.ppermute(head, "x", _perm_ring(nx_, -1)) \
                if nx_ > 1 else head
            if ny_ > 1:
                vy = jax.lax.ppermute(v, "y",
                                      [(i + 1, i) for i in range(ny_ - 1)])
                v = jnp.where(xi == nx_ - 1, vy, v)
            elif nx_ == 1:
                v = jnp.zeros_like(v)
            else:
                v = jnp.where(xi == nx_ - 1, jnp.zeros_like(v), v)
            return v

        south = from_prev(tab[-k:])
        north = from_next(tab[:k])
        south = jnp.where((yi == 0) & (xi == 0), jnp.flip(tab[:k], 0),
                          south)
        north = jnp.where((yi == ny_ - 1) & (xi == nx_ - 1),
                          jnp.flip(tab[-k:], 0), north)
        return jnp.concatenate([south, tab, north], axis=0)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(_SPEC, _SPEC, P("y", None), P("y", None)),
                   out_specs=_SPEC)
    return fn(T, cinv_g, shifts_g, phi_g), i0 + K
