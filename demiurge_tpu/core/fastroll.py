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


def row_roll_static(field, k_np):
    """Per-row column roll by STATIC integer shifts (numpy (H,) int).

    out[..., r, c] = field[..., r, (c + k_r) mod W].  Rows are processed in
    contiguous blocks grouped by barrel depth (bit length of |k|), so rows
    with small shifts — the vast majority on a lat-lon grid, where shifts
    grow as 1/cos(phi) only near the poles — pay only their own depth: the
    equatorial block costs a single static roll instead of log2(W) barrel
    stages.  ~6x less work than :func:`row_roll` for the spherical stencils.
    """
    import numpy as np

    H, W = field.shape[-2], field.shape[-1]
    k_np = np.asarray(k_np).reshape(-1).astype(np.int64)
    assert k_np.shape[0] == H, (k_np.shape, H)

    depth = np.array([int(abs(int(k))).bit_length() for k in k_np])
    sgn = np.sign(k_np)
    # contiguous runs of equal (depth, sign)
    bounds = [0] + [i for i in range(1, H)
                    if depth[i] != depth[i - 1] or sgn[i] != sgn[i - 1]] + [H]

    pieces = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        blk = field[..., a:b, :]
        kb = k_np[a:b]
        d = int(depth[a])
        if d == 0:
            pieces.append(blk)
            continue
        if np.all(kb == kb[0]):
            # constant shift in the run: one static roll
            pieces.append(jnp.roll(blk, -int(kb[0]), axis=-1))
            continue
        sign = 1 if kb[kb != 0][0] > 0 else -1
        mag = np.abs(kb)
        out = blk
        for j in range(d):
            step = sign * (1 << j)
            bit = jnp.asarray(((mag >> j) & 1).astype(bool).reshape(-1, 1))
            out = jnp.where(bit, jnp.roll(out, -step, axis=-1), out)
        pieces.append(out)
    return jnp.concatenate(pieces, axis=-2)


def row_sample_nearest_x_static(field, dx_np):
    """NEAREST fetch at per-row STATIC fractional x offsets (periodic x).

    dx_np: numpy (H,) float.  Column (c + floor(0.5 + dx_r)) mod W via
    :func:`row_roll_static`.
    """
    import numpy as np

    k = np.floor(np.float32(0.5) + np.asarray(dx_np, np.float32)).astype(np.int64)
    return row_roll_static(field, k)


def row_sample_bilinear_x_static(field, dx_np):
    """GL_LINEAR fetch at per-row STATIC fractional x offsets (periodic x).

    Integer part via :func:`row_roll_static`; the lerp weights are trace-time
    constants.  Periodic across the dateline (same documented deviation as
    :func:`row_sample_bilinear_x`).
    """
    import numpy as np

    dx_np = np.asarray(dx_np, np.float32).reshape(-1)
    k = np.floor(dx_np).astype(np.int64)
    f = jnp.asarray((dx_np - k).astype(np.float32).reshape(-1, 1))
    r0 = row_roll_static(field, k)
    r1 = jnp.roll(r0, -1, axis=-1)
    return r0 * (1.0 - f) + r1 * f


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
