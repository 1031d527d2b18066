import numpy as np
import pytest

import jax.numpy as jnp

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.ops import ocean
from demiurge_tpu.ops.noise import NoiseParams, fbm


def test_fast_advect_matches_exact_off_seam():
    """The bounded-displacement tap sampler must equal the gather path
    everywhere except the dateline seam subpixels (where the fast path is
    seamlessly periodic and the GL-parity path clamps) and beyond the
    displacement cap."""
    g = Grid(256, 160)
    h = fbm(g, NoiseParams(octaves=4, scale=2.0, min=-2.0, max=3.0, seed=7))
    rng = np.random.default_rng(1)
    u = jnp.asarray((rng.standard_normal(g.shape) * 0.5).astype(np.float32))
    v = jnp.asarray((rng.standard_normal(g.shape) * 0.5).astype(np.float32))

    ce = ocean.OceanConfig(advect_method="exact")
    cf = ocean.OceanConfig(advect_method="fast", fast_radius=4,
                           polar_rows=16)
    eu, ev = ocean.advect(u, v, h, g, ce)
    fu, fv = ocean.advect(u, v, h, g, cf)

    d = np.abs(np.asarray(eu) - np.asarray(fu))
    # exclude the two dateline-adjacent columns
    interior = d[:, 2:-2]
    assert interior.max() < 1e-4, interior.max()
    dv = np.abs(np.asarray(ev) - np.asarray(fv))[:, 2:-2]
    assert dv.max() < 1e-4


def test_fast_advect_small_grid_falls_back():
    """Grids too small for the polar band use the exact path."""
    g = Grid(48, 24)
    h = jnp.full(g.shape, -1.0)
    u = jnp.ones(g.shape)
    v = jnp.zeros(g.shape)
    ce = ocean.OceanConfig(advect_method="exact")
    cf = ocean.OceanConfig(advect_method="fast")  # H=24 < 2*64 -> exact
    eu, _ = ocean.advect(u, v, h, g, ce)
    fu, _ = ocean.advect(u, v, h, g, cf)
    np.testing.assert_array_equal(np.asarray(eu), np.asarray(fu))
