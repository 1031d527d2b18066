"""Interactive spherical brush painting.

Reproduces the reference BrushWindow (src/menus/BrushWindow.cpp):

- ``brush_profile``: the 512x512 *integrated* brush profile LUT — row d
  holds the running line integral of the radial falloff (cos^2 beyond the
  hardness radius) across a chord at normalized distance d from the stroke
  line (set_hardness, BrushWindow.cpp:232-272; including the reference's
  initial-value quirk ``current + i*step`` with the row index).
- ``segment``: one stroke segment: rotate the sphere so the segment lies on
  the equator (rotation setup BrushWindow.cpp:185-211), then add the LUT
  line-integral difference (brush_calc, BrushWindow.cpp:116-155) into the
  stroke accumulator; terrain = backup + value*min(accum, limit)
  (BrushWindow.cpp:214-230).

A full stroke = init (backup terrain, zero accumulator) + one segment per
mouse move + finalize (diff vs backup -> undo history in the api layer).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid

PI = math.pi

BRUSH_TEX_SIZE = 512


def brush_profile(hardness: float, n: int = BRUSH_TEX_SIZE) -> np.ndarray:
    """Integrated brush profile LUT (set_hardness, BrushWindow.cpp:232-272).

    Returns (n, n) float32: row i = chord at distance d=i/(n-1), column j =
    running trapezoidal integral of the falloff along the chord.
    """
    def brush_val(r):
        phi = r  # R = 1
        c = PI * phi / (2 * (1 - hardness)) + PI / 2 * (1 - 1 / (1 - hardness))
        val = np.where(phi <= hardness, 1.0, np.cos(c) ** 2)
        return val

    i = np.arange(n, dtype=np.float64).reshape(-1, 1)
    j = np.arange(n, dtype=np.float64).reshape(1, -1)
    d = i / (n - 1)
    width = np.sqrt(np.maximum(1 - d * d, 0.0))
    step = 2 * width / (n - 1)

    # reference quirk: the initial 'current_val' uses current + i*step with
    # the *row* index i (BrushWindow.cpp:261)
    init_r = np.sqrt(d * d + (-width + i * step) ** 2)
    init_val = brush_val(init_r)

    current = -width + (j + 1) * step  # after the j-th 'current += step'
    r = np.sqrt(d * d + current ** 2)
    vals = brush_val(r)
    prev_vals = np.concatenate([init_val, vals[:, :-1]], axis=1)
    contrib = (prev_vals + vals) / 2 * step
    return np.cumsum(contrib, axis=1).astype(np.float32)


def _rotz(a):
    c, s = math.cos(a), math.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def _roty(a):
    c, s = math.cos(a), math.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def _rotx(a):
    c, s = math.cos(a), math.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


def stroke_rotation(grid: Grid, pos, prev) -> np.ndarray:
    """Rotation that puts the segment on the equator through lon 0
    (BrushWindow.cpp:185-211)."""
    v = grid.coords
    dtheta = pos[0] * (v[3] - v[2]) + v[2]
    R = _rotz(-dtheta)
    dphi = pos[1] * (v[1] - v[0]) + v[0]
    R = _roty(dphi) @ R

    phi = prev[1] * (v[1] - v[0]) + v[0]
    theta = prev[0] * (v[3] - v[2]) + v[2]
    p = np.array([
        math.sin(PI / 2 - phi) * math.cos(theta),
        math.sin(PI / 2 - phi) * math.sin(theta),
        math.cos(PI / 2 - phi),
    ])
    pr = R @ p
    dtheta2 = -math.atan2(pr[2], pr[1])
    return (_rotx(dtheta2) @ R).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class BrushParams:
    size: float = 30.0       # pixels (brush_size)
    value: float = 1.0
    flow: float = 1.0
    hardness: float = 0.5
    limit: float = float("inf")


def _sample_lut_bilinear(lut, x, y):
    """Bilinear LUT fetch with clamp (brush_tex, GL texture semantics)."""
    n = lut.shape[0]
    xi = jnp.clip(x * n - 0.5, 0.0, n - 1.0)
    yi = jnp.clip(y * n - 0.5, 0.0, n - 1.0)
    x0 = jnp.floor(xi).astype(jnp.int32)
    y0 = jnp.floor(yi).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, n - 1)
    y1 = jnp.minimum(y0 + 1, n - 1)
    fx = xi - x0
    fy = yi - y0
    v00 = lut[y0, x0]
    v01 = lut[y0, x1]
    v10 = lut[y1, x0]
    v11 = lut[y1, x1]
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy


@partial(jax.jit, static_argnames=("grid",))
def segment_accumulate(accum, sel, lut, rotation, mouse_prev, grid: Grid,
                       size, flow):
    """Add one segment's line-integral contribution to the accumulator
    (brush_calc + brush_shader, BrushWindow.cpp:116-178)."""
    lam, phi = grid.lam_phi()
    px = jnp.cos(phi) * jnp.cos(lam)
    py = jnp.cos(phi) * jnp.sin(lam)
    pz = jnp.sin(phi) * jnp.ones_like(lam)
    R = rotation
    rx = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz
    ry = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz
    rz = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz
    p_x = jnp.arctan2(ry, rx)
    p_y = jnp.arcsin(jnp.clip(rz, -1.0, 1.0))
    p_x = jnp.broadcast_to(p_x, grid.shape)
    p_y = jnp.broadcast_to(p_y, grid.shape)

    mlam = mouse_prev[0] * (grid.lam1 - grid.lam0) + grid.lam0
    mphi = mouse_prev[1] * (grid.phi1 - grid.phi0) + grid.phi0
    m = jnp.stack([jnp.cos(mphi) * jnp.cos(mlam),
                   jnp.cos(mphi) * jnp.sin(mlam),
                   jnp.sin(mphi)])
    m = R @ m
    m_x = jnp.arctan2(m[1], m[0])

    factor = grid.width / (grid.lam1 - grid.lam0)
    d = jnp.abs(p_y) * factor
    inside = d < size
    width = jnp.sqrt(jnp.maximum(size * size - d * d, 1e-12))

    rightstart = jnp.minimum(p_x, width)
    rightstart = jnp.maximum(-width, rightstart)

    leftend = jnp.maximum(p_x, m_x - width)
    leftend = jnp.minimum(m_x + width, leftend) - m_x

    stop = rightstart * factor
    start = leftend * factor
    vstop_x = stop / width / 2 + 0.5
    vstart_x = start / width / 2 + 0.5
    vy = d / size

    contrib = _sample_lut_bilinear(lut, vstop_x, vy) - _sample_lut_bilinear(
        lut, vstart_x, vy)
    contrib = jnp.where(inside, contrib, 0.0)
    return accum + flow * sel * contrib


def composite(backup, accum, value, limit):
    """terrain = backup + value*min(accum, limit) (BrushWindow.cpp:214-230)."""
    return backup + value * jnp.minimum(accum, limit)


class BrushStroke:
    """Stateful helper for a stroke: init -> segment(...) -> finish()."""

    def __init__(self, height, sel, grid: Grid, params: BrushParams):
        self.grid = grid
        self.params = params
        self.backup = height
        self.sel = sel
        self.accum = jnp.zeros(grid.shape, jnp.float32)
        self.lut = jnp.asarray(brush_profile(params.hardness))
        self.height = height

    def segment(self, pos, prev):
        R = jnp.asarray(stroke_rotation(self.grid, pos, prev))
        self.accum = segment_accumulate(
            self.accum, self.sel, self.lut, R,
            jnp.asarray(prev, jnp.float32), self.grid,
            self.params.size, self.params.flow)
        self.height = composite(self.backup, self.accum, self.params.value,
                                self.params.limit)
        return self.height

    def finish(self):
        """Returns (height, diff-vs-backup) for undo history."""
        return self.height, self.backup - self.height
