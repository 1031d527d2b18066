"""Grayscale morphology (erode/dilate) with spherical metric.

Reproduces the reference Morphological filter (src/filter/Morphological.cpp:
28-131): radius decomposed into doubling steps (1, 2, 4, ..., remainder,
sorted ascending — Morphological.cpp:31-43); each step takes min/max over 64
samples on a circle of that radius, with the x-offsets stretched by
1/cos(phi) (Morphological.cpp:48-60).  Samples land on fractional pixels and
the reference textures here are GL_NEAREST (Project scratch textures), so we
sample nearest through the wrap-aware sampler.

``morphological_gradient`` = dilate((r+1)/2) - erode(r/2)
(Morphological.cpp:87-131), used for selection borders.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core.topology import grid_st, offset_coords, sample_nearest

PI = math.pi
_N_SAMPLES = 64


def radius_list(radius: float) -> list:
    """Doubling-step decomposition — Morphological.cpp:31-43."""
    r = []
    x = 1
    while radius >= 0:
        if x < radius:
            radius -= x
            r.append(float(x))
            x *= 2
        else:
            r.append(float(radius))
            break
    r.sort()
    return r


def _circle_pass(field, grid: Grid, radius: float, op: str):
    phi = grid.row_phi()
    factor = 1.0 / jnp.cos(jnp.abs(phi))  # (H,1)

    acc = field
    reduce = jnp.minimum if op == "min" else jnp.maximum

    if grid.wrap_x:
        # fast path: NEAREST at (per-row x stretch, constant y) = row shift
        # + per-row STATIC roll (the offsets depend only on grid and radius;
        # core/fastroll.row_roll_static banding makes near-equator rows pay
        # one roll per sample instead of log2(W) barrel stages)
        import numpy as np

        from ..core.topology import shift
        from ..core.fastroll import row_sample_nearest_x_static

        H = grid.height
        r_np = np.arange(H, dtype=np.float32)
        t_np = (r_np + np.float32(0.5)) / np.float32(H)
        phi_np = t_np * np.float32(grid.phi1 - grid.phi0) + np.float32(grid.phi0)
        factor_np = np.float32(1.0) / np.cos(np.abs(phi_np))

        for i in range(_N_SAMPLES):
            ang = 2 * PI * i / _N_SAMPLES
            dy = math.sin(ang) * radius
            ky = math.floor(0.5 + dy)
            dx = np.float32(math.cos(ang) * radius) * factor_np
            tap = shift(field, 0, ky, grid)
            tap = row_sample_nearest_x_static(tap, dx)
            acc = reduce(acc, tap)
        return acc

    s, t = grid_st(grid)
    for i in range(_N_SAMPLES):
        ang = 2 * PI * i / _N_SAMPLES
        dx = math.cos(ang) * radius * factor
        dy = math.sin(ang) * radius
        s2, t2 = offset_coords(s, t, dx, dy, grid)
        s2 = jnp.broadcast_to(s2, grid.shape)
        t2 = jnp.broadcast_to(t2, grid.shape)
        acc = reduce(acc, sample_nearest(field, s2, t2))
    return acc


@partial(jax.jit, static_argnames=("grid", "radius", "op"))
def morphology(field, grid: Grid, radius: float, op: str):
    """erode (op='min') / dilate (op='max') by the given pixel radius."""
    assert op in ("min", "max")
    for r in radius_list(radius):
        field = _circle_pass(field, grid, r, op)
    return field


def erode(field, grid: Grid, radius: float):
    return morphology(field, grid, radius, "min")


def dilate(field, grid: Grid, radius: float):
    return morphology(field, grid, radius, "max")


def morphological_gradient(field, grid: Grid, radius: float):
    """dilate - erode (Morphological.cpp:87-131)."""
    d = dilate(field, grid, (radius + 1) / 2)
    e = erode(field, grid, radius / 2)
    return d - e
