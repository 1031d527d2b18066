"""Fused D8 direction pass (Pallas TPU).

ops.flow.flow_directions materializes ~24 shifted reads of the blurred
height and selection plus the Sobel/aspect trig — ~0.5 ms of HBM traffic
at 2048x1024.  This kernel runs the whole pass (Sobel gradient, aspect
quantization with the value-noise tie break, aspect-neighbor check, and
the steepest-descent fallback scan) on VMEM-resident row bands: 2 field
reads + 1 int32 write of HBM total.

Topology matches the reference's coordsMod hack exactly (pole wrap OFF
during direction finding, FlowFilter.cpp:253-256): y clamps at the grid
edge — the bands carry edge-replicated halo rows — and x is periodic
(lane rolls).  Formulas transliterate FlowFilter.cpp:109-259 like the
XLA path; Mosaic's transcendental approximations differ from XLA's by
ulps, so aspect-quantization knife-edge ties can resolve differently at
isolated pixels (both drainage resolutions are valid; same class as the
documented seam deviations).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.grid import Grid

PI = math.pi
_HALO = 8
#: must match ops.flow._SCAN_ORDER
_SCAN_ORDER = ((1, 1), (0, 1), (-1, 1), (1, 0), (-1, 0), (1, -1), (0, -1), (-1, -1))


def _atan2(y, x):
    """Polynomial atan2 (Mosaic has no atan2/atan primitive).

    Range-reduced minimax atan on [0, 1] (Cephes-style 4-term, max error
    ~1e-4 rad < the aspect-octant quantum pi/4) with quadrant fixes.
    Signed-zero behavior differs from libm at exactly-flat pixels — those
    take the steepest-descent fallback path anyway."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.maximum(jnp.where(swap, ay, ax), 1e-30)
    z = num / den
    z2 = z * z
    p = ((((0.0208351 * z2 - 0.085133) * z2 + 0.180141) * z2
          - 0.3302995) * z2 + 0.999866) * z
    r = jnp.where(swap, PI / 2 - p, p)
    r = jnp.where(x < 0, PI - r, r)
    return jnp.where(y < 0, -r, r)


def _kernel(band, W, dy8, row0_tab, a_ref, s_ref, dxtab_ref, code_ref):
    ap = a_ref[0]      # (band+16, W)
    sp = s_ref[0]
    dx8 = dxtab_ref[0][:, 0:1]             # (band, 1): 8*dx_row
    rows0 = row0_tab

    def nbrs(slab):
        """value at (r+dy, c+dx) for all 9 offsets, interior rows."""
        out = {}
        for dy in (-1, 0, 1):
            row = jax.lax.slice_in_dim(slab, _HALO + dy,
                                       _HALO + dy + band, axis=0)
            out[(0, dy)] = row
            out[(1, dy)] = pltpu.roll(row, W - 1, 1)   # reads col c+1
            out[(-1, dy)] = pltpu.roll(row, 1, 1)      # reads col c-1
        return out

    an = nbrs(ap)
    sn = nbrs(sp)
    a = an[(0, 0)]
    sel = sn[(0, 0)]

    # Sobel (reference sign convention, Shader.h:281-297)
    # divisions, not reciprocal multiplies: bit-matches the XLA path's
    # rounding so aspect-quantization ties resolve identically
    gx = (-(an[(1, -1)] + 2 * an[(1, 0)] + an[(1, 1)])
          + (an[(-1, -1)] + 2 * an[(-1, 0)] + an[(-1, 1)])) / dx8
    gy = ((an[(-1, 1)] + 2 * an[(0, 1)] + an[(1, 1)])
          - (an[(-1, -1)] + 2 * an[(0, -1)] + an[(1, -1)])) / dy8

    aspect = PI - _atan2(gy, -gx)
    lower = jnp.floor(aspect / (2 * PI) * 8) / 8 * (2 * PI)
    upper = jnp.ceil(aspect / (2 * PI) * 8) / 8 * (2 * PI)
    prob = jnp.abs(aspect - lower) / PI * 4

    # tie-break value noise at lattice points (2c+1, 2r0+2i+1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (band, W), 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (band, W), 0) + rows0
    px = (2 * ci + 1).astype(jnp.float32)
    py = (2 * ri + 1).astype(jnp.float32)

    def fract(x):
        return x - jnp.floor(x)

    hx = 50.0 * fract(px * 0.3183099 + 0.71)
    hy = 50.0 * fract(py * 0.3183099 + 0.113)
    q = (-1.0 + 2.0 * fract(hx * hy * (hx + hy))) * 0.5 + 0.5

    # octant index instead of trig: asp is an exact multiple of pi/4, so
    # round(cos)/round(sin) reduce to a table on n = round(asp * 4/pi) mod 8
    asp = jnp.where(q < prob, upper, lower)
    n = jnp.round(asp * (4.0 / PI)).astype(jnp.int32) % 8
    # n: 0:E 1:NE 2:N 3:NW 4:W 5:SW 6:S 7:SE with dirx=round(cos),
    # diry=-round(sin) (screen-y south-positive like the reference)
    dirx = jnp.where((n == 1) | (n == 0) | (n == 7), 1,
                     jnp.where((n == 3) | (n == 4) | (n == 5), -1, 0))
    diry = jnp.where((n >= 1) & (n <= 3), -1,
                     jnp.where((n >= 5) & (n <= 7), 1, 0))
    code = 5 + dirx + 3 * diry       # keypad encoding

    # aspect-chosen neighbor
    a2 = jnp.full_like(a, jnp.inf)
    s2 = jnp.ones_like(a)
    for (dx, dy) in _SCAN_ORDER:
        m = (dirx == dx) & (diry == dy)
        a2 = jnp.where(m, an[(dx, dy)], a2)
        s2 = jnp.where(m, sn[(dx, dy)], s2)
    aspect_code = jnp.where((a2 <= 0.0) | (s2 == 0.0), 5, code)
    take_aspect = a2 < a

    # steepest-descent fallback (FlowFilter.cpp:178-242)
    best_code = jnp.full_like(code, 5)
    best_a = a
    best_s = jnp.ones_like(a)
    for (dx, dy) in _SCAN_ORDER:
        nh = an[(dx, dy)]
        better = nh < best_a
        best_code = jnp.where(better, 5 + dx + 3 * dy, best_code)
        best_s = jnp.where(better, sn[(dx, dy)], best_s)
        best_a = jnp.where(better, nh, best_a)
    scan_code = jnp.where((best_a <= 0.0) | (best_s == 0.0), 5, best_code)

    out = jnp.where(take_aspect, aspect_code, scan_code)
    interesting = (a > 0.0) & (sel != 0.0)
    code_ref[0] = jnp.where(interesting, out, 0)


def directions_supported(grid: Grid, band: int = 128) -> bool:
    return bool(grid.wrap_x and grid.height % band == 0
                and grid.width % 128 == 0)


@functools.partial(jax.jit, static_argnames=("grid", "band", "interpret"))
def flow_directions_pallas(hb, sel, grid: Grid, band: int = 128,
                           interpret: bool = False):
    """Drop-in for ops.flow.flow_directions (modulo transcendental-ulp
    ties; see module docstring)."""
    H, W = grid.shape
    assert directions_supported(grid, band), (grid.shape, band)
    nbands = H // band
    rows = band + 2 * _HALO

    def clamp_pad(x):
        top = jnp.broadcast_to(x[:1, :], (_HALO, W))
        bot = jnp.broadcast_to(x[-1:, :], (_HALO, W))
        return jnp.concatenate([top, x, bot], 0)

    def windows(x):
        xp = clamp_pad(x)
        return jnp.stack([xp[i * band:i * band + rows]
                          for i in range(nbands)])

    # metric terms come from the coordsMod grid (pole wrap disabled by
    # shrinking coords 1e-3, FlowFilter.cpp:253-256) — its slightly
    # different row latitudes are what the XLA path divides by
    import dataclasses

    import numpy as np

    y0, y1, x0, x1 = grid.coords
    gmod = dataclasses.replace(grid, coords=(y0 + 1e-3, y1 - 1e-3, x0, x1))
    dxr, _ = gmod.pixelsize_rows()
    dx8 = 8.0 * dxr                             # (H, 1), traced
    dxtab = jnp.concatenate(
        [dx8, jnp.zeros((H, 7), jnp.float32)], axis=1)
    dxw = jnp.stack([dxtab[i * band:(i + 1) * band] for i in range(nbands)])
    # dy is constant per grid — compute statically (pixelsize_rows returns
    # traced values under jit)
    scale = gmod.circumference / (2 * PI)
    dy_static = np.float32((gmod.phi1 - gmod.phi0) * scale / gmod.height)
    dy8 = float(np.float32(8.0) * dy_static)

    spec = pl.BlockSpec((1, rows, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    code = pl.pallas_call(
        lambda a_ref, s_ref, t_ref, o_ref: _kernel(
            band, W, dy8,
            pl.program_id(0) * band, a_ref, s_ref, t_ref, o_ref),
        grid=(nbands,),
        in_specs=[spec, spec,
                  pl.BlockSpec((1, band, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, band, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbands, band, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(windows(hb), windows(sel), dxw)
    return code.reshape(H, W)
