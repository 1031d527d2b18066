"""Per-row column rolls without gathers.

Many reference stencils stretch their x taps by 1/cos(phi) pixels
(spherical metric: Laplacian src/Shader.h:299-320, blur BlurMenu.cpp:48-52,
morphology Morphological.cpp:52-57).  On an x-periodic grid a NEAREST fetch
at such a tap is exactly ``field[r, (c + k_r) mod W]`` with a per-row
integer shift k_r — a gather in the naive formulation, which TPUs execute
orders of magnitude below memory speed.

This module implements the per-row roll by binary decomposition of the
shift: ceil(log2 W) rounds of (global roll by 2^j, per-row select on bit j).
Rolls and selects are slice/elementwise ops that XLA fuses and runs at HBM
bandwidth, so a per-row roll costs ~2*log2(W) fused array ops instead of a
gather.

Only valid for x-periodic (wrap_x) grids; regional grids keep the exact
clamp-semantics gather path.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def row_roll(field, k):
    """out[..., r, c] = field[..., r, (c + k_r) mod W].

    k: per-row integer shifts, shape (H,) or (H,1), any int dtype (may be
    negative; reduced mod W).
    """
    W = field.shape[-1]
    nbits = max(1, int(math.ceil(math.log2(W))) + (0 if (W & (W - 1)) == 0 else 1))
    k = jnp.mod(jnp.asarray(k, jnp.int32).reshape(-1, 1), W)
    out = field
    for j in range(nbits):
        step = 1 << j
        if step >= W:
            break
        bit = ((k >> j) & 1).astype(bool)
        out = jnp.where(bit, jnp.roll(out, -step, axis=-1), out)
    return out


def row_sample_nearest_x(field, dx):
    """Nearest fetch at per-row fractional x offset (periodic x).

    Equivalent to sampling at tex coord s + dx_r/W with GL_NEAREST on a
    wrap_x grid: column (c + floor(0.5 + dx_r)) mod W.
    dx: (H,) or (H,1) float.
    """
    k = jnp.floor(0.5 + jnp.asarray(dx, jnp.float32)).astype(jnp.int32)
    return row_roll(field, k)


def row_sample_bilinear_x(field, dx):
    """GL_LINEAR fetch at per-row fractional x offset (periodic x).

    Samples at pixel position c + dx_r: lerp of columns floor/ceil.
    Note: periodic across the dateline (the GL reference clamps the last
    subpixel at the seam; documented deviation of the fast path).
    """
    dx = jnp.asarray(dx, jnp.float32).reshape(-1, 1)
    k = jnp.floor(dx)
    f = dx - k
    r0 = row_roll(field, k.astype(jnp.int32))
    r1 = jnp.roll(r0, -1, axis=-1)
    return r0 * (1.0 - f) + r1 * f


def const_sample_bilinear_y(field, dy, grid):
    """GL_LINEAR fetch at a constant fractional y offset via row slices.

    Samples every pixel at row position r + dy (dy scalar): lerp of the two
    bracketing rows fetched through the wrap-aware integer shift.
    """
    from .topology import shift

    k = math.floor(dy)
    f = dy - k
    r0 = shift(field, 0, k, grid)
    if f == 0.0:
        return r0
    r1 = shift(field, 0, k + 1, grid)
    return r0 * (1.0 - f) + r1 * f
