import math

import numpy as np
import pytest

import jax.numpy as jnp

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.core import topology, stencils

from oracles import (
    gradient_oracle,
    laplacian_oracle,
    shift_oracle,
    fetch_bilinear,
    offset_oracle,
)

PI = math.pi

GLOBAL = Grid(width=16, height=8)
REGIONAL = Grid(width=16, height=8, coords=(-1.0, 0.5, -2.0, 1.0))


def rand_field(grid, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(grid.shape).astype(np.float32)


@pytest.mark.parametrize("grid", [GLOBAL, REGIONAL], ids=["global", "regional"])
@pytest.mark.parametrize("dx,dy", [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1),
                                   (-1, -1), (1, -1), (-1, 1), (2, -3)])
def test_shift_matches_glsl_offset(grid, dx, dy):
    f = rand_field(grid)
    got = np.asarray(topology.shift(jnp.asarray(f), dx, dy, grid))
    want = shift_oracle(f, dx, dy, grid.coords)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("dx,dy", [(0, -1), (0, 1), (1, 1), (-1, -1)])
def test_shift_no_pole_wrap(dx, dy):
    grid = GLOBAL
    f = rand_field(grid)
    got = np.asarray(topology.shift(jnp.asarray(f), dx, dy, grid, pole_wrap=False))
    want = shift_oracle(f, dx, dy, grid.coords, pole_wrap=False)
    np.testing.assert_array_equal(got, want)


def test_pole_reflection_semantics():
    """Row below the south edge = same row, antipodal column."""
    grid = GLOBAL
    f = rand_field(grid)
    down = np.asarray(topology.shift(jnp.asarray(f), 0, -1, grid))
    # row 0 looks below the pole -> row 0, columns shifted by W/2
    np.testing.assert_array_equal(down[0], np.roll(f[0], -grid.width // 2))
    # interior rows just shift
    np.testing.assert_array_equal(down[1:], f[:-1])


@pytest.mark.parametrize("grid", [GLOBAL, REGIONAL], ids=["global", "regional"])
def test_sample_offset_nearest_fractional(grid):
    f = rand_field(grid)
    for (dx, dy) in [(0.3, 0.0), (-1.7, 1.0), (5.25, -2.0), (0.0, -1.5)]:
        got = np.asarray(
            topology.sample_offset_nearest(jnp.asarray(f), dx, dy, grid)
        )
        H, W = grid.shape
        want = np.zeros_like(f)
        for r in range(H):
            for c in range(W):
                s, t = (c + 0.5) / W, (r + 0.5) / H
                s2, t2 = offset_oracle((s, t), (dx, dy), (W, H), grid.coords)
                cc = min(max(int(math.floor(s2 * W)), 0), W - 1)
                rr = min(max(int(math.floor(t2 * H)), 0), H - 1)
                want[r, c] = f[rr, cc]
        np.testing.assert_array_equal(got, want)


def test_bilinear_matches_gl():
    grid = GLOBAL
    f = rand_field(grid)
    rng = np.random.default_rng(3)
    ss = rng.uniform(-0.2, 1.2, size=64).astype(np.float32)
    tt = rng.uniform(-0.2, 1.2, size=64).astype(np.float32)
    got = np.asarray(topology.sample_bilinear(jnp.asarray(f), jnp.asarray(ss), jnp.asarray(tt)))
    want = np.array([fetch_bilinear(f, s, t) for s, t in zip(ss, tt)], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("grid", [GLOBAL, REGIONAL], ids=["global", "regional"])
def test_gradient_oracle(grid):
    f = rand_field(grid)
    gx, gy = stencils.texture_gradient(jnp.asarray(f), grid)
    ox, oy = gradient_oracle(f, grid.coords)
    np.testing.assert_allclose(np.asarray(gx), ox, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy), oy, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("grid", [GLOBAL, REGIONAL], ids=["global", "regional"])
def test_laplacian_oracle(grid):
    f = rand_field(grid)
    lx, ly = stencils.texture_laplacian(jnp.asarray(f), grid)
    ox, oy = laplacian_oracle(f, grid.coords)
    np.testing.assert_allclose(np.asarray(lx), ox, rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ly), oy, rtol=2e-4, atol=2e-6)


def test_geodistance():
    grid = Grid(width=1000, height=500)
    # quarter circumference along the equator: (0,0) to (90E,0)
    p1 = (0.5, 0.5)
    p2 = (0.75, 0.5)
    d = float(grid.geodistance_tex(jnp.asarray(p1), jnp.asarray(p2)))
    assert abs(d - 250.0) < 1e-3  # pi/2 / (2 pi) * 1000
