"""Separable spherical Gaussian blur.

Reproduces the reference Blur filter (src/filter/BlurMenu.cpp:24-117):

- radius is halved ("radius vs diameter", BlurMenu.cpp:27), then the total
  variance R = (radius/2)^2/2 is decomposed into a list of per-iteration
  sigmas whose squares sum to R (BlurMenu.cpp:78-94).
- each iteration runs a 13-tap linearly-sampled Gaussian vertically then
  horizontally (blur13, BlurMenu.cpp:41-62) on GL_LINEAR textures, with the
  horizontal tap offsets stretched by 1/cos(phi) (BlurMenu.cpp:49-52).

The TPU implementation keeps the exact tap positions/weights (bilinear
sampling through the wrap-aware sampler) so results match the reference;
iterations run under a Python loop over the statically-known sigma list
(the list depends only on the radius parameter, so it stays jit-static).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core.topology import grid_st, offset_coords, sample_bilinear

# 13-tap Gaussian with linear-sampling optimization (BlurMenu.cpp:45-60)
_OFFSETS = (1.411764705882353, 3.2941176470588234, 5.176470588235294)
_W0 = 0.1964825501511404
_WEIGHTS = (0.2969069646728344, 0.09447039785044732, 0.010381362401148057)


def sigma_list(radius: float) -> list:
    """Decompose blur radius into per-iteration radii (BlurMenu.cpp:78-94)."""
    radius = radius / 2.0
    R = radius * radius / 2.0
    rlist = []
    i = 1.0
    incrementer = 0.5
    if R < 3:
        k = 1.0 / math.sqrt(55.0 / R) if R > 0 else 0.0
        if k == 0.0:
            return []
        incrementer = k
        i = k
    while R >= i * i:
        R -= i * i
        rlist.append(i)
        i += incrementer
    if R > 0.0:
        rlist.append(math.sqrt(R))
    rlist.sort()
    return rlist


def blur13_pass(field, grid: Grid, direction, *, stretch_x: bool = True):
    """One blur13 pass. ``direction`` = (dx, dy) pixel step (BlurMenu.cpp:41-62).

    Fast paths (x-periodic grids): vertical taps are constant fractional row
    offsets -> row-slice lerps; horizontal taps are per-row fractional
    column offsets (1/cos(phi) stretch) -> binary-decomposed per-row rolls
    (core/fastroll.py).  The fast paths interpolate periodically across the
    dateline and through the poles where the GL reference clamps the final
    subpixel at the texture seam — a seam-quality improvement, documented.
    Regional (non-periodic) grids use the exact GL-clamp gather path.
    """
    phi = grid.row_phi()
    phifactor = jnp.cos(jnp.abs(phi))  # (H,1)

    if grid.wrap_x:
        from ..core.fastroll import (const_sample_bilinear_y,
                                     row_sample_bilinear_x_static)

        if direction[0] != 0.0:
            # horizontal: the per-row offsets depend only on the grid and
            # radius, so they are STATIC — each tap is a depth-banded static
            # roll (row_roll_static): near-equator rows pay one roll, not
            # log2(W) barrel stages.
            import numpy as np

            H = grid.height
            r_np = np.arange(H, dtype=np.float32)
            t_np = (r_np + np.float32(0.5)) / np.float32(H)
            phi_np = t_np * np.float32(grid.phi1 - grid.phi0) + np.float32(grid.phi0)
            pf_np = np.cos(np.abs(phi_np))

            out = field * _W0
            for off_mag, w in zip(_OFFSETS, _WEIGHTS):
                for sign in (1.0, -1.0):
                    ox = np.float32(sign * off_mag * direction[0])
                    dx = ox / pf_np if stretch_x else np.full_like(pf_np, ox)
                    out = out + row_sample_bilinear_x_static(field, dx) * w
            return out

        out = field * _W0
        for off_mag, w in zip(_OFFSETS, _WEIGHTS):
            for sign in (1.0, -1.0):
                oy = sign * off_mag * direction[1]
                tap = const_sample_bilinear_y(field, oy, grid)
                out = out + tap * w
        return out

    s, t = grid_st(grid)
    out = field * _W0
    for off_mag, w in zip(_OFFSETS, _WEIGHTS):
        ox = off_mag * direction[0]
        oy = off_mag * direction[1]
        if stretch_x:
            ox = ox / phifactor  # (H,1) broadcast
        for sign in (1.0, -1.0):
            s2, t2 = offset_coords(s, t, sign * ox, sign * oy, grid)
            s2 = jnp.broadcast_to(s2, grid.shape)
            t2 = jnp.broadcast_to(t2, grid.shape)
            out = out + sample_bilinear(field, s2, t2) * w
    return out


@partial(jax.jit, static_argnames=("grid", "radius"))
def blur(field, grid: Grid, radius: float):
    """Full separable spherical Gaussian blur of the given radius (pixels)."""
    from ..core.platform import single_core_pallas

    if single_core_pallas():
        from ..pallas_kernels.blur import (blur_pallas,
                                           blur_resident_supported)

        if blur_resident_supported(grid, radius):
            # all iterations fused on VMEM-resident bands (the radius-0.5
            # flow pre-blur regime); same taps/weights, f32 reassociation
            # only (~3e-7 relative)
            return blur_pallas(field, grid, radius)

    rlist = sigma_list(radius)
    for r in rlist:
        field = blur13_pass(field, grid, (0.0, r))   # vertical first
        field = blur13_pass(field, grid, (r, 0.0))   # then horizontal
    return field
