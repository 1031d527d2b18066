"""The flagship coupled model: erosion + ocean + climate on the sphere.

This is BASELINE config 5 ("fully coupled erosion+ocean+climate pipeline"):
one step advances

  1. the seasonal climate model by ``climate_substeps`` substeps
     (ops.temperature — insolation, energy balance, diffusive transport),
  2. the ocean-current solver by one outer step (ops.ocean — advection,
     viscosity, pressure projection with Coriolis),
  3. the landscape by one uplift+stream-power iteration using the
     device-only flow accumulation (ops.flow.flow_filter_device +
     ops.erosion.erosion_pass).

Everything is one jittable, shardable function over a State pytree; the
reference runs these as three separate interactive filters on one GPU
(SURVEY §2.3) — the coupling (and the distribution) is this framework's
addition, at the parameters of the reference's individual filters.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from .core.grid import Grid
from .ops import erosion, flow, ocean, temperature


@dataclasses.dataclass(frozen=True)
class CoupledConfig:
    climate_substeps: int = 10
    ocean: ocean.OceanConfig = ocean.OceanConfig(
        jacobi_iters=200, diffusion_iters=50
    )
    flow_exponent: float = 0.5
    flow_preblur: float = 0.5
    erosion_factor: float = 1.0
    erosion_slope_exponent: float = 1.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CoupledState:
    height: jax.Array       # terrain (km)
    uplift: jax.Array       # uplift forcing field
    sel: jax.Array          # selection mask (1 everywhere by default)
    u: jax.Array            # ocean velocity east
    v: jax.Array            # ocean velocity north
    temperature: jax.Array  # surface temperature (C)
    t_index: jax.Array      # climate substep counter (scalar f32)
    # previous step's flow-accumulation fixpoint, carried as a warm start
    # for the relaxation (unique fixpoint -> identical results, faster
    # convergence: only changed cells' downstream traces stay active).
    # zeros = cold start (one extra sweep vs seeding with cell areas).
    flow_acc: jax.Array = None


def init_coupled(height, grid: Grid, cfg: CoupledConfig = CoupledConfig()):
    uplift, h = erosion.init_uplift(height)
    u, v = ocean.init_ocean(grid)
    T = temperature.init_temperature(grid)
    return CoupledState(
        height=h,
        uplift=uplift,
        sel=jnp.ones(grid.shape, jnp.float32),
        u=u,
        v=v,
        temperature=T,
        t_index=jnp.float32(0.0),
        flow_acc=jnp.zeros(grid.shape, jnp.float32),
    )


@partial(jax.jit, static_argnames=("grid", "cfg", "mesh"))
def coupled_step(state: CoupledState, grid: Grid,
                 cfg: CoupledConfig = CoupledConfig(),
                 mesh=None) -> CoupledState:
    """``mesh``: optional Mesh('y','x') — routes the iterative solvers
    (viscosity, pressure, flow accumulation) through the amortized
    explicit-halo shard_map path (dist.halo) instead of one GSPMD
    collective per sweep."""
    h = state.height

    # climate
    T, ti = temperature.temperature_step(
        state.temperature, h, state.t_index, grid,
        substeps=cfg.climate_substeps, mesh=mesh,
    )

    # ocean
    u, v, _, _ = ocean.ocean_step(state.u, state.v, h, grid, cfg.ocean,
                                  mesh=mesh)

    # erosion (device-only flow path), warm-started from the previous
    # step's accumulation fixpoint
    fm, acc = flow.flow_filter_device(h, state.sel, grid,
                                      exponent=cfg.flow_exponent,
                                      preblur=cfg.flow_preblur, mesh=mesh,
                                      acc0=state.flow_acc, return_acc=True)
    h = erosion.erosion_pass(h, fm, state.uplift, grid,
                             cfg.erosion_factor, cfg.erosion_slope_exponent)

    return CoupledState(
        height=h, uplift=state.uplift, sel=state.sel,
        u=u, v=v, temperature=T, t_index=ti, flow_acc=acc,
    )
