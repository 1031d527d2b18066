"""Landscape evolution: tectonic uplift + stream-power fluvial erosion.

Reproduces the reference 'cpufilter' (src/filter/cpufilter.cpp):

- uplift field U = max(h0, 0)/50 from the initial heights
  (cpufilter.cpp:47-64); initial h = h/50 on land, unchanged in the ocean
  (cpufilter.cpp:66-84).
- 150 iterations (N*3, cpufilter.cpp:93), each:
    1. full FlowFilter (preblur 0.5, configured exponent/lakes) -> discharge
       map A (cpufilter.cpp:95-102)
    2. erosion pass (cpufilter.cpp:110-199):
         maxslope  = max over 8 neighbors of (h - h_n)/dist_n  (metric dists)
         dist      = dist of the steepest neighbor (init |pixelsize|)
         hdiff     = tan(30 deg)*dist - maxslope*dist       (critical slope)
         eros      = factor*4*A*maxslope^sexp / 0.1^sexp * 0.1
         h        += min(hdiff, max(0, U - eros))            (land only)

This is stream-power incision (E ~ A * S^m) against uplift forcing with a
30-degree critical-slope cap.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core.topology import NEIGHBORS_FLOW_ORDER, shift
from .flow import FlowConfig, flow_filter

PI = math.pi


@dataclasses.dataclass(frozen=True)
class ErosionConfig:
    exponent: float = 0.5        # cpufilter.h:20 (flow accumulation exponent)
    slope_exponent: float = 1.0  # cpufilter.h:22
    factor: float = 1.0          # cpufilter.h:21
    lakes: bool = False          # 'dolakes' toggle
    n: int = 50                  # uplift divisor N (cpufilter.cpp:42)
    iterations: int = 150        # N*3 (cpufilter.cpp:93)


def init_uplift(height, cfg: ErosionConfig = ErosionConfig()):
    """(U, h_init) — cpufilter.cpp:47-84."""
    U = jnp.maximum(height, 0.0) / cfg.n
    h = jnp.where(height <= 0, height, height / cfg.n)
    return U, h


@partial(jax.jit, static_argnames=("grid",))
def erosion_pass(h, flow_map, uplift, grid: Grid, factor, slope_exponent):
    """One erosion update (cpufilter.cpp:110-199)."""
    dxr, dyr = grid.pixelsize_rows()

    maxslope = jnp.zeros_like(h)
    dist = jnp.sqrt(dxr * dxr + dyr * dyr) * jnp.ones_like(h)
    for (dx, dy) in NEIGHBORS_FLOW_ORDER:
        hn = shift(h, dx, dy, grid)
        ndist = jnp.sqrt((dxr * dx) ** 2 + (dyr * dy) ** 2) * jnp.ones_like(h)
        s = (h - hn) / ndist
        better = s > maxslope
        maxslope = jnp.where(better, s, maxslope)
        dist = jnp.where(better, ndist, dist)

    SLOPE = math.tan(PI / 2 / 3)  # 30 degrees (cpufilter.cpp:191)
    hdiff = SLOPE * dist - maxslope * dist
    eros = factor * 4.0 * flow_map * jnp.power(maxslope, slope_exponent) \
        / (0.1 ** slope_exponent) * 0.1
    hnew = h + jnp.minimum(hdiff, jnp.maximum(0.0, uplift - eros))
    return jnp.where(h <= 0, h, hnew)


def coupled_tectonic_erosion(height, sel, grid: Grid,
                             cfg: "ErosionConfig" = None,
                             tcfg=None,
                             iterations: int = None,
                             tectonic_every: int = 5,
                             callback=None,
                             progress=None):
    """Config-2 coupling: tectonic uplift forcing LIVE during landscape
    evolution — every ``tectonic_every`` erosion iterations the plate
    system advances one step and the collision-driven orogeny field
    replaces the static uplift forcing (added to the stream-power base
    uplift U = max(h,0)/50, cpufilter.cpp:42-64).  This is the intent of
    "coupled tectonic uplift + erosion" rather than the reference's
    sequential 70-steps-then-erode chain.

    Returns the evolved heightfield.
    """
    from . import tectonics

    if cfg is None:
        cfg = ErosionConfig()
    if tcfg is None:
        tcfg = tectonics.TectonicsConfig()
    if iterations is None:
        iterations = cfg.iterations

    stack = tectonics.init_plate_stack(height, grid)
    uplift0, h = init_uplift(height, cfg)
    uplift = uplift0
    fcfg = FlowConfig(preblur=0.5, exponent=cfg.exponent, lakes=cfg.lakes)
    for i in range(iterations):
        if i % tectonic_every == 0:
            stack, tup = tectonics.tectonic_uplift(stack, grid, tcfg)
            uplift = uplift0 + tup
        flow_map = flow_filter(h, sel, grid, fcfg)
        h = erosion_pass(h, flow_map, uplift, grid,
                         cfg.factor, cfg.slope_exponent)
        if callback is not None:
            callback(i, h)
        if progress is not None and not progress(i, iterations):
            break  # cancelled: return the last completed state
    return h


def landscape_evolution(height, sel, grid: Grid,
                        cfg: ErosionConfig = ErosionConfig(),
                        iterations: int = None,
                        callback=None,
                        progress=None):
    """Full cpufilter loop (cpufilter.cpp:41-222).

    The flow solve has a host stage (lake graph), so the outer loop is a
    Python loop: flow_filter -> erosion_pass per iteration.
    Returns the evolved heightfield.
    """
    if iterations is None:
        iterations = cfg.iterations
    uplift, h = init_uplift(height, cfg)
    fcfg = FlowConfig(preblur=0.5, exponent=cfg.exponent, lakes=cfg.lakes)
    for i in range(iterations):
        flow_map = flow_filter(h, sel, grid, fcfg)
        h = erosion_pass(h, flow_map, uplift, grid,
                         cfg.factor, cfg.slope_exponent)
        if callback is not None:
            callback(i, h)
        if progress is not None and not progress(i, iterations):
            break  # cancelled: return the last completed state
    return h
