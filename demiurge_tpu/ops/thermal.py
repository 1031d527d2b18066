"""Thermal erosion (slope-limited talus redistribution).

Reproduces the reference ThermalErosion filter (src/filter/ThermalErosion.cpp:
25-142) exactly.  Each step = 10 substeps; each substep is two passes:

- pass 1 (ThermalErosion.cpp:32-72): where slope > 30 deg and h > 0, the cell
  sheds ``(h - minh)/count * 0.3`` where minh is the minimum over the 3x3
  neighborhood and count = 1 + number of strictly lower neighbors.
- pass 2 (ThermalErosion.cpp:84-127): each cell gains the pass-1 shed amount
  of every strictly *higher* neighbor; cells steeper than 3 deg (pi/6/10)
  with h > 0 keep their height unchanged instead.

Note (faithful to the reference): pass 2 adds gains but never subtracts the
donor's loss — the filter deposits without eroding.  We reproduce this
verbatim for oracle parity; ``conservative=True`` enables the evident-intent
variant that also subtracts the shed material from donors (approximately
mass-conserving; exact except where a steep receiver discards its gain).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core.stencils import get_slope
from ..core.topology import NEIGHBORS_FLOW_ORDER, shift

PI = math.pi


def _substep(h, grid: Grid, conservative: bool):
    slope = get_slope(h, grid, 1.0)

    # pass 1: material shed by each cell
    neigh = [shift(h, dx, dy, grid) for (dx, dy) in NEIGHBORS_FLOW_ORDER]
    minh = h
    count = jnp.ones_like(h)
    for h2 in neigh:
        minh = jnp.minimum(minh, h2)
        count = count + (h2 < h).astype(h.dtype)
    shed = jnp.where((slope > PI / 6) & (h > 0), (h - minh) / count * 0.3, 0.0)

    # pass 2: gather shed amounts from strictly higher neighbors
    gain = jnp.zeros_like(h)
    for (dx, dy) in NEIGHBORS_FLOW_ORDER:
        h2 = shift(h, dx, dy, grid)
        s2 = shift(shed, dx, dy, grid)
        gain = gain + jnp.where(h2 > h, s2, 0.0)

    keep = (slope > PI / 6 / 10) & (h > 0)
    out = jnp.where(keep, h, h + gain)
    if conservative:
        # evident-intent variant: donors lose what lower neighbors received.
        nlower = count - 1.0
        out = out - jnp.where(shed > 0, shed * nlower, 0.0)
    return out


@partial(jax.jit, static_argnames=("grid", "substeps", "conservative"))
def thermal_erosion_step(h, grid: Grid, substeps: int = 10,
                         conservative: bool = False):
    """One ThermalErosion::step — ``substeps`` two-pass substeps
    (ThermalErosion.cpp:26)."""
    def body(h, _):
        return _substep(h, grid, conservative), None

    h, _ = jax.lax.scan(body, h, None, length=substeps)
    return h
