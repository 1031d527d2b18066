"""Shared stencils of the reference's GLSL stdlib, as fused jnp operators.

Each function transliterates the cited reference shader exactly (same tap
positions, same weights, same sign conventions — including the reference's
negated-x Sobel) so that op-level oracle tests can assert parity.  All taps
go through :mod:`demiurge_tpu.core.topology`, so dateline/pole wrap semantics
match ``offset()`` (src/Shader.h:81-98).

XLA fuses the 8 shifted reads + arithmetic into a single VMEM-tiled loop on
TPU, so these are already bandwidth-bound; a hand-written Pallas variant of
the 9-point kernels lives in :mod:`demiurge_tpu.pallas_kernels.stencil` for
the multi-pass solvers where inter-pass fusion matters.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .grid import Grid
from .topology import sample_offset_nearest, shift

PI = math.pi


def texture_gradient(field, grid: Grid, *, pole_wrap: bool = True):
    """Sobel gradient — reference src/Shader.h:281-297.

    Returns (delta_x, delta_y) in field-units per physical length.
    NOTE the reference's sign convention: delta_x is the *negated* eastward
    derivative ((west - east)/8dx); delta_y is the northward derivative.
    """
    a = shift(field, -1, -1, grid, pole_wrap=pole_wrap)
    b = shift(field, 0, -1, grid, pole_wrap=pole_wrap)
    c = shift(field, 1, -1, grid, pole_wrap=pole_wrap)
    d = shift(field, -1, 0, grid, pole_wrap=pole_wrap)
    f = shift(field, 1, 0, grid, pole_wrap=pole_wrap)
    g = shift(field, -1, 1, grid, pole_wrap=pole_wrap)
    h = shift(field, 0, 1, grid, pole_wrap=pole_wrap)
    i = shift(field, 1, 1, grid, pole_wrap=pole_wrap)

    dx, dy = grid.pixelsize_rows()  # dx (H,1), dy scalar
    delta_x = (-(c + 2 * f + i) + (a + 2 * d + g)) / (8 * dx)
    delta_y = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * dy)
    return delta_x, delta_y


def texture_laplacian(field, grid: Grid, *, pole_wrap: bool = True):
    """Spherical 9-point second derivatives — reference src/Shader.h:299-320.

    The x taps are stretched by 1/cos(phi) pixels (then snapped by the
    GL_NEAREST fetch of the reference's non-filtered textures).  Returns
    (delta_x, delta_y); both are normalized by 4*dy^2 exactly as the
    reference does (including its use of pixelwidth.y for both axes).
    """
    phi = grid.row_phi()
    inv_cos = 1.0 / jnp.cos(phi)  # (H,1) pixel stretch for x taps

    if grid.wrap_x:
        # fast path: the NEAREST fetch at a per-row x offset is a per-row
        # integer roll whose shift depends only on the grid, so it is STATIC:
        # rows are processed in blocks grouped by shift magnitude (see
        # core/fastroll.row_roll_static) — the equatorial 2/3 of the grid
        # costs one roll per tap instead of log2(W) barrel stages.
        import numpy as np

        from .fastroll import row_roll_static

        H = grid.height
        r_np = np.arange(H, dtype=np.float32)
        t_np = (r_np + np.float32(0.5)) / np.float32(H)
        phi_np = t_np * np.float32(grid.phi1 - grid.phi0) + np.float32(grid.phi0)
        ic_np = np.float32(1.0) / np.cos(phi_np)

        def tap(dx_sign, dy_int):
            row = shift(field, 0, dy_int, grid, pole_wrap=pole_wrap)
            if dx_sign is None:
                return row
            k = np.floor(np.float32(0.5) + dx_sign * ic_np).astype(np.int64)
            return row_roll_static(row, k)

    else:

        def tap(dx_sign, dy_int):
            if dx_sign is None:  # pure integer offset
                return shift(field, 0, dy_int, grid, pole_wrap=pole_wrap)
            return sample_offset_nearest(
                field, dx_sign * inv_cos, float(dy_int), grid,
                pole_wrap=pole_wrap
            )

    # reference taps: offset(st, -vec2(sx, sy)) with sx in {±1/factor, 0}
    a = tap(-1.0, -1)
    b = tap(None, -1)
    c = tap(1.0, -1)
    d = tap(-1.0, 0)
    e = field
    f = tap(1.0, 0)
    g = tap(-1.0, 1)
    h = tap(None, 1)
    i = tap(1.0, 1)

    _, dy = grid.pixelsize_rows()
    denom = 4 * dy * dy
    delta_x = (a - 2 * b + c + 2 * d - 4 * e + 2 * f + g - 2 * h + i) / denom
    delta_y = (a + 2 * b + c - 2 * d - 4 * e - 2 * f + g + 2 * h + i) / denom
    delta_x = jnp.nan_to_num(delta_x, nan=0.0)
    delta_y = jnp.nan_to_num(delta_y, nan=0.0)
    return delta_x, delta_y


def get_slope(field, grid: Grid, z_factor: float = 1.0, *, pole_wrap: bool = True):
    """Slope angle — reference src/Shader.h:334-342."""
    gx, gy = texture_gradient(field, grid, pole_wrap=pole_wrap)
    return jnp.arctan(z_factor * jnp.sqrt(gx * gx + gy * gy))


def get_aspect(field, grid: Grid, *, pole_wrap: bool = True):
    """Aspect angle — reference src/Shader.h:323-331: pi - atan2(gy, -gx)."""
    gx, gy = texture_gradient(field, grid, pole_wrap=pole_wrap)
    return PI - jnp.arctan2(gy, -gx)
