"""Selection subsystem.

The selection is an (H, W) float field in [0,1] sampled by every filter
(reference 'sel' texture, SURVEY §2.4).  Combination modes are in
ops.blend.selection_mode (selection.cpp:52-77).

Tools (each returns the new candidate mask; combine with
``apply_selection``):

- all / inverse            (AllSelect.cpp:8-25, InverseSelection.cpp:9-36)
- by height range          (HeightSelection.cpp:39-66)
- spherical-triangle lasso (FreeSelection.cpp:40-188): each mouse-move
  triangle (first, prev, cur) toggles parity of pixels inside the spherical
  triangle; a final 4-neighbor vote despeckles.
- grow / shrink / border   (GrowShringSelection.cpp:14-24,
  BorderSelection.cpp:9-20 — morphology on sel)
- blur                     (BlurSelection.cpp:9-22)
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

from ..core.grid import Grid
from ..core.topology import shift
from ..ops.blend import selection_mode
from ..ops.blur import blur
from ..ops.morphological import dilate, erode, morphological_gradient

PI = math.pi


def select_all(grid: Grid):
    """AllSelect: sel = 1."""
    return jnp.ones(grid.shape, jnp.float32)


def select_none(grid: Grid):
    return jnp.zeros(grid.shape, jnp.float32)


def invert(sel):
    """InverseSelection: 1 - sel."""
    return 1.0 - sel


def by_height(height, lower: float, upper: float):
    """HeightSelectFilter: 1 where lower <= h <= upper."""
    return jnp.where((height >= lower) & (height <= upper), 1.0, 0.0)


def apply_selection(sel, candidate, mode: str = "replace"):
    """Combine candidate mask into the selection (selection_mode)."""
    return selection_mode(sel, candidate, mode)


# ---------------------------------------------------------------------------
# lasso (FreeSelection)
# ---------------------------------------------------------------------------


def _to_cartesian(grid: Grid, st):
    lam = st[0] * (grid.lam1 - grid.lam0) + grid.lam0
    phi = st[1] * (grid.phi1 - grid.phi0) + grid.phi0
    return (
        math.cos(phi) * math.cos(lam),
        math.cos(phi) * math.sin(lam),
        math.sin(phi),
    )


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def lasso_triangle(parity, grid: Grid, first, prev, cur):
    """Toggle parity inside the spherical triangle (first, prev, cur)
    (FreeSelection.cpp:74-133).  Points are (s, t) tex coords; ``parity`` is
    the accumulating 0/1 field (scratch2 in the reference)."""
    A = _to_cartesian(grid, cur)
    B = _to_cartesian(grid, prev)
    C = _to_cartesian(grid, first)
    a = _cross(A, B)
    b = _cross(B, C)
    c = _cross(C, A)
    avg = tuple(A[i] + B[i] + C[i] for i in range(3))
    s = math.copysign(1.0, sum(a[i] * avg[i] for i in range(3)))

    lam, phi = grid.lam_phi()
    Px = jnp.cos(phi) * jnp.cos(lam)
    Py = jnp.cos(phi) * jnp.sin(lam)
    Pz = jnp.sin(phi) * jnp.ones_like(lam)

    def halfplane(n):
        return s * (n[0] * Px + n[1] * Py + n[2] * Pz) > 0

    inside = halfplane(a) & halfplane(b) & halfplane(c)
    inside = jnp.broadcast_to(inside, grid.shape)
    return jnp.where(inside, 1.0 - parity, parity)


def lasso_finalize(parity, sel, grid: Grid, mode: str = "replace"):
    """Despeckle by 4-neighbor vote then combine (FreeSelection.cpp:146-180)."""
    a = (shift(parity, 1, 0, grid) + shift(parity, -1, 0, grid)
         + shift(parity, 0, 1, grid) + shift(parity, 0, -1, grid))
    val = jnp.where(a == 0, 0.0, parity)
    val = jnp.where(a == 4, 1.0, val)
    return apply_selection(sel, val, mode)


def lasso(sel, grid: Grid, path: Sequence[Tuple[float, float]],
          mode: str = "replace"):
    """Full lasso stroke: fan triangles from path[0] over consecutive pairs."""
    parity = jnp.zeros(grid.shape, jnp.float32)
    if len(path) >= 3:
        first = path[0]
        for prev, cur in zip(path[1:-1], path[2:]):
            if cur == prev or cur == first or prev == first:
                continue
            parity = lasso_triangle(parity, grid, first, prev, cur)
    return lasso_finalize(parity, sel, grid, mode)


# ---------------------------------------------------------------------------
# morphology-based tools
# ---------------------------------------------------------------------------


def grow(sel, grid: Grid, radius: float):
    """GrowShrinkSelection (grow) = dilate on sel."""
    return dilate(sel, grid, radius)


def shrink(sel, grid: Grid, radius: float):
    """GrowShrinkSelection (shrink) = erode on sel."""
    return erode(sel, grid, radius)


def border(sel, grid: Grid, radius: float):
    """BorderSelection = morphological gradient on sel."""
    return morphological_gradient(sel, grid, radius)


def blur_selection(sel, grid: Grid, radius: float):
    """BlurSelection = gaussian blur on sel."""
    return blur(sel, grid, radius)
