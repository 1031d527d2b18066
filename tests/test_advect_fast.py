import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.ops import ocean
from demiurge_tpu.ops.noise import NoiseParams, fbm


def _row_mask_within_cap(g, speed_max, Rx, margin=1.0):
    """Rows whose worst-case longitude backtrace stays within the tap cap."""
    phi = np.asarray(g.row_phi()).ravel()
    # pixels of x displacement for a given speed (see ocean.advect arclength)
    px = speed_max * 24.0 * g.width / g.circumference / np.maximum(
        np.cos(phi), 1e-9)
    return px + margin < Rx


def test_fast_advect_matches_exact_off_seam():
    """The tap sampler must equal the gather path everywhere except the
    dateline seam subpixels (where the fast path is seamlessly periodic and
    the GL-parity path clamps) and the rows where the displacement exceeds
    the tap cap (polar 1/cos blowup)."""
    g = Grid(256, 160)
    h = fbm(g, NoiseParams(octaves=4, scale=2.0, min=-2.0, max=3.0, seed=7))
    rng = np.random.default_rng(1)
    u = jnp.asarray((rng.standard_normal(g.shape) * 0.5).astype(np.float32))
    v = jnp.asarray((rng.standard_normal(g.shape) * 0.5).astype(np.float32))

    ce = ocean.OceanConfig(advect_method="exact")
    cf = ocean.OceanConfig(advect_method="fast", tap_radius_x=8,
                           tap_radius_y=4)
    eu, ev = ocean.advect(u, v, h, g, ce)
    fu, fv = ocean.advect(u, v, h, g, cf)

    smax = float(jnp.max(jnp.sqrt(u * u + v * v)))
    rows = _row_mask_within_cap(g, smax, 8)
    assert rows.sum() > 0.6 * g.height  # the cap only excludes polar rows

    # seam columns: taps up to Rx pixels reach across the dateline, where
    # the GL-parity path clamps and the fast path wraps
    seam = 9
    d = np.abs(np.asarray(eu) - np.asarray(fu))[rows][:, seam:-seam]
    assert d.max() < 1e-4, d.max()
    dv = np.abs(np.asarray(ev) - np.asarray(fv))[rows][:, seam:-seam]
    assert dv.max() < 1e-4


def test_fast_advect_small_grid():
    """Small grids use the tap path too; uniform zonal flow matches the
    exact path away from the seam, within the cap."""
    g = Grid(48, 24)
    h = jnp.full(g.shape, -1.0)
    u = jnp.ones(g.shape)
    v = jnp.zeros(g.shape)
    ce = ocean.OceanConfig(advect_method="exact")
    cf = ocean.OceanConfig(advect_method="fast")
    eu, _ = ocean.advect(u, v, h, g, ce)
    fu, _ = ocean.advect(u, v, h, g, cf)
    rows = _row_mask_within_cap(g, 1.0, 8)
    d = np.abs(np.asarray(eu) - np.asarray(fu))[rows][:, 2:-2]
    assert d.max() < 1e-5, d.max()


def test_advect_cap_zero_clamped_at_evolved_equilibrium():
    """Round-5 brief #7: drive the ocean to its wind/drag equilibrium at
    512x256 under the reference forcing (|w| = 10) and assert the tiered
    sampler's cap never binds — with the DERIVED vmax bound (default) and
    with the old constant hint."""
    import dataclasses

    from demiurge_tpu.ops import ocean as oc

    g = Grid(512, 256)
    h = fbm(g, NoiseParams(mode="default", octaves=5, scale=2.0,
                           min=-2.0, max=3.0, seed=7))
    cfg = oc.OceanConfig(jacobi_iters=20, diffusion_iters=5)
    u, v = oc.init_ocean(g)
    step = jax.jit(lambda u_, v_: oc.ocean_step(u_, v_, h, g, cfg)[:2])
    for _ in range(35):   # drag equilibrates in ~27 steps
        u, v = step(u, v)
    vmax = float(jnp.max(jnp.sqrt(u * u + v * v)))
    assert vmax < oc.vmax_from_wind(), vmax   # the derived bound holds
    for hint in (None, 1.0):
        c = dataclasses.replace(cfg, vmax_hint=hint)
        frac = float(oc.advect_clamped_fraction(u, v, h, g, c))
        assert frac == 0.0, (hint, frac)


def test_vmax_from_wind_value():
    """The derived bound must dominate the measured equilibrium (~0.19)
    with real margin but stay below the old untested hint's cost."""
    from demiurge_tpu.ops.ocean import vmax_from_wind

    v = vmax_from_wind()
    assert 0.4 < v <= 1.0, v
