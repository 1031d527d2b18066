"""Neighbor topology of the spherical lat-lon grid.

Reproduces the reference's texture-sampling semantics exactly:

- ``offset(p, dp, resolution)`` (reference src/Shader.h:81-98): shift a tex
  coordinate by ``dp`` pixels, with dateline-periodic x wrap and pole
  reflection (crossing a pole maps t -> -t (or 2-t) and shifts longitude by
  pi).
- GL texture fetches with ``GL_NEAREST`` / ``GL_LINEAR`` filtering and
  ``GL_CLAMP_TO_EDGE`` wrap (reference src/Texture.cpp:19-36).

Two code paths:

- ``shift(field, dx, dy, grid)`` — fast path for integer pixel offsets (the
  vast majority of stencils).  Pure rolls/slices; XLA fuses these into the
  surrounding elementwise work, so 9-point stencils compile to a single fused
  loop over VMEM tiles on TPU.
- ``sample_nearest`` / ``sample_bilinear`` — general gather path for
  fractional coordinates (separable blur taps, the 1/cos(phi)-stretched
  Laplacian, semi-Lagrangian advection, projection resampling).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .grid import Grid

PI = math.pi


# ---------------------------------------------------------------------------
# Integer-offset neighbor access (fast path)
# ---------------------------------------------------------------------------


def shift(field, dx: int, dy: int, grid: Grid, *, pole_wrap: bool = True):
    """Neighbor value at integer pixel offset (dx, dy) for every pixel.

    ``out[r, c] = field[wrap(r + dy), wrap(c + dx)]`` with the wrap rules of
    reference src/Shader.h:81-98:

    - x: periodic if the grid spans the full dateline, else clamp-to-edge.
    - y: rows past a pole reflect back (r -> -r-1 / 2H-1-r) with a
      half-world longitude shift; if the grid does not touch the pole (or
      ``pole_wrap=False`` — the ``offset_no_globe_wrap`` uniform), rows clamp.

    dy=+1 is the row to the north (t+1 pixel); dx=+1 is east.
    Matches a GL_NEAREST fetch since integer offsets stay on pixel centers.
    """
    H, W = grid.height, grid.width
    touches_pole = grid.wrap_south or grid.wrap_north

    if touches_pole and pole_wrap and not grid.wrap_x and dy != 0:
        # Pole reflection on a grid that is not x-periodic goes through the
        # spheric mod formula and may clamp — rare config, use the exact
        # general sampler rather than silently diverging.
        return sample_offset_nearest(field, float(dx), float(dy), grid,
                                     pole_wrap=pole_wrap)

    out = field
    # x shift first (periodic roll or clamped slice)
    if dx != 0:
        if grid.wrap_x:
            out = jnp.roll(out, -dx, axis=1)
        else:
            out = _clamped_shift(out, dx, axis=1)

    if dy == 0:
        return out

    # y shift: rows that stay in range take field[r+dy]; rows that cross a
    # pole reflect (and get an extra half-world x shift).
    if grid.wrap_x and pole_wrap and touches_pole:
        return _pole_wrapped_row_shift(out, dy, grid)
    return _clamped_shift(out, dy, axis=0)


def _clamped_shift(field, d: int, axis: int):
    """Shift by d pixels along axis with clamp-to-edge (GL_CLAMP_TO_EDGE).

    Implemented with static slices + edge replication (no gather) so XLA
    fuses it into surrounding elementwise work on TPU.
    """
    n = field.shape[axis]
    d = max(-n + 1, min(n - 1, d))
    if d == 0:
        return field

    def sl(a, start, stop):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(start, stop)
        return a[tuple(idx)]

    if d > 0:
        body = sl(field, d, n)
        edge = sl(field, n - 1, n)
        pads = [edge] * d
        return jnp.concatenate([body] + pads, axis=axis)
    else:
        body = sl(field, 0, n + d)
        edge = sl(field, 0, 1)
        pads = [edge] * (-d)
        return jnp.concatenate(pads + [body], axis=axis)


def _pole_wrapped_row_shift(field, dy: int, grid: Grid):
    """Row shift with pole reflection.

    A target row r' = r + dy outside [0, H) reflects to -r'-1 (south) or
    2H-1-r' (north), with columns rotated by the pole x-shift.  The reflected
    region is only |dy| rows at each edge, so implement as: clamped interior
    shift + overwrite of the edge rows with reflected/rotated data.
    """
    H, W = field.shape[-2], field.shape[-1]
    shift_cols = _pole_col_shift(grid)
    if dy < 0 and grid.wrap_south and -dy < H:
        k = -dy
        # r in [0, k) reflects to row -(r+dy)-1 = k-1-r (flipped head block),
        # with the antipodal column shift
        head = jnp.roll(jnp.flip(field[..., :k, :], axis=-2), -shift_cols, axis=-1)
        return jnp.concatenate([head, field[..., : H - k, :]], axis=-2)
    if dy > 0 and grid.wrap_north and dy < H:
        k = dy
        tail = jnp.roll(jnp.flip(field[..., H - k :, :], axis=-2), -shift_cols, axis=-1)
        return jnp.concatenate([field[..., k:, :], tail], axis=-2)
    return _clamped_shift(field, dy, axis=field.ndim - 2)


def _pole_col_shift(grid: Grid) -> int:
    """Column shift (in pixels) of the pole reflection.

    The reference maps lambda -> mod(lambda + 2pi, 2pi) - pi (src/Shader.h:88)
    which for a full-globe grid is a half-world shift: s -> s + 0.5.  In
    pixels that is W/2 (exact for even W; odd W rounds via GL_NEAREST — we
    round to nearest integer and document the half-pixel deviation).
    """
    return int(round(grid.width / 2))


# ---------------------------------------------------------------------------
# General coordinate wrap + samplers (gather path)
# ---------------------------------------------------------------------------


def offset_coords(s, t, ds_pix, dt_pix, grid: Grid, *, pole_wrap: bool = True):
    """The GLSL ``offset()`` function (src/Shader.h:81-98) on tex coords.

    Inputs/outputs are tex coords in [0,1]-ish space; ds_pix/dt_pix are pixel
    offsets (can be fractional).  Returns wrapped (s', t').  Note the exact
    reference quirks: x is mod-wrapped both before and after the pole
    reflection; the pole reflection goes through spheric coordinates.
    """
    W, H = grid.width, grid.height
    s = s + ds_pix / W
    t = t + dt_pix / H

    if grid.wrap_x:
        s = jnp.mod(s + 1.0, 1.0)

    if pole_wrap and grid.wrap_south:
        cross = t < 0
        lam = s * (grid.lam1 - grid.lam0) + grid.lam0
        lam = jnp.mod(lam + 2 * PI, 2 * PI) - PI
        s_ref = (lam - grid.lam0) / (grid.lam1 - grid.lam0)
        t = jnp.where(cross, -t, t)
        s = jnp.where(cross, s_ref, s)
    if pole_wrap and grid.wrap_north:
        cross = t > 1
        lam = s * (grid.lam1 - grid.lam0) + grid.lam0
        lam = jnp.mod(lam + 2 * PI, 2 * PI) - PI
        s_ref = (lam - grid.lam0) / (grid.lam1 - grid.lam0)
        t = jnp.where(cross, 2.0 - t, t)
        s = jnp.where(cross, s_ref, s)

    if grid.wrap_x:
        s = jnp.mod(s + 1.0, 1.0)
    return s, t


def sample_nearest(field, s, t):
    """GL_NEAREST + GL_CLAMP_TO_EDGE fetch at tex coords (s, t)."""
    H, W = field.shape[-2], field.shape[-1]
    c = jnp.clip(jnp.floor(s * W).astype(jnp.int32), 0, W - 1)
    r = jnp.clip(jnp.floor(t * H).astype(jnp.int32), 0, H - 1)
    return field[..., r, c]


def sample_bilinear(field, s, t):
    """GL_LINEAR + GL_CLAMP_TO_EDGE fetch at tex coords (s, t).

    Pixel centers at ((c+0.5)/W, (r+0.5)/H); interpolation weights from the
    fractional position between centers; out-of-range taps clamp to the edge
    texel (GL_CLAMP_TO_EDGE), including across the dateline seam — callers
    wanting seamless x must pre-wrap via ``offset_coords`` (as the reference
    shaders do).
    """
    H, W = field.shape[-2], field.shape[-1]
    x = s * W - 0.5
    y = t * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def fetch(r, c):
        r = jnp.clip(r, 0, H - 1)
        c = jnp.clip(c, 0, W - 1)
        return field[..., r, c]

    v00 = fetch(y0, x0)
    v01 = fetch(y0, x0 + 1)
    v10 = fetch(y0 + 1, x0)
    v11 = fetch(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def grid_st(grid: Grid):
    """Pixel-center tex coords of the whole grid: (s (1,W), t (H,1))."""
    s = (jnp.arange(grid.width, dtype=jnp.float32) + 0.5) / grid.width
    t = (jnp.arange(grid.height, dtype=jnp.float32) + 0.5) / grid.height
    return s.reshape(1, -1), t.reshape(-1, 1)


def sample_offset_nearest(field, dx, dy, grid: Grid, *, pole_wrap: bool = True):
    """GL_NEAREST fetch at ``offset(st, (dx,dy))`` for every pixel.

    dx/dy may be fractional and may be per-row arrays (broadcast against
    (H,1)); this is the general form used by the 1/cos(phi)-stretched
    stencils (e.g. the spherical Laplacian, src/Shader.h:299-320).
    For integer dx/dy prefer ``shift`` (no gather).
    """
    s, t = grid_st(grid)
    s2, t2 = offset_coords(s, t, dx, dy, grid, pole_wrap=pole_wrap)
    s2 = jnp.broadcast_to(s2, grid.shape)
    t2 = jnp.broadcast_to(t2, grid.shape)
    return sample_nearest(field, s2, t2)


def sample_offset_bilinear(field, dx, dy, grid: Grid, *, pole_wrap: bool = True):
    """GL_LINEAR fetch at ``offset(st, (dx,dy))`` for every pixel."""
    s, t = grid_st(grid)
    s2, t2 = offset_coords(s, t, dx, dy, grid, pole_wrap=pole_wrap)
    s2 = jnp.broadcast_to(s2, grid.shape)
    t2 = jnp.broadcast_to(t2, grid.shape)
    return sample_bilinear(field, s2, t2)


# ---------------------------------------------------------------------------
# Stencil helpers built on shift()
# ---------------------------------------------------------------------------

#: The 8 neighbor offsets in the reference's scan order for steepest-descent
#: style loops (FlowFilter.cpp:181-236 order: (1,1),(0,1),(-1,1),(1,0),(-1,0),
#: (1,-1),(0,-1),(-1,-1)).
NEIGHBORS_FLOW_ORDER = (
    (1, 1),
    (0, 1),
    (-1, 1),
    (1, 0),
    (-1, 0),
    (1, -1),
    (0, -1),
    (-1, -1),
)

#: Keypad code for each direction offset (FlowFilter.cpp:159-166):
#: dir (dx,dy) -> code; code 5 = sink/self.
DIR_CODE = {
    (1, 1): 9,
    (0, 1): 8,
    (-1, 1): 7,
    (1, 0): 6,
    (0, 0): 5,
    (-1, 0): 4,
    (1, -1): 3,
    (0, -1): 2,
    (-1, -1): 1,
}

#: code -> offset (inverse of DIR_CODE)
CODE_DIR = {v: k for k, v in DIR_CODE.items()}


def neighborhood(field, grid: Grid, *, pole_wrap: bool = True):
    """dict {(dx,dy): shifted field} over the 3x3 neighborhood (excl. center)."""
    return {
        (dx, dy): shift(field, dx, dy, grid, pole_wrap=pole_wrap)
        for (dx, dy) in NEIGHBORS_FLOW_ORDER
    }
