import math

import numpy as np
import pytest

import jax.numpy as jnp

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.ops import flow
from demiurge_tpu.ops.noise import NoiseParams, fbm

PI = math.pi


def brute_force_accumulate(parent, area):
    """Oracle: repeated child-sum relaxation (exact after depth iters)."""
    N = len(parent)
    acc = np.array(area, np.float64)
    for _ in range(N):
        new = np.array(area, np.float64)
        for i in range(N):
            if parent[i] >= 0:
                new[parent[i]] += acc[i]
        if np.allclose(new, acc):
            break
        acc = new
    return acc


def test_accumulate_matches_bruteforce_random_forest():
    rng = np.random.default_rng(0)
    N = 300
    # random forest: parent[i] < i or -1 (guarantees acyclic)
    parent = np.full(N, -1, np.int32)
    for i in range(1, N):
        if rng.random() < 0.8:
            parent[i] = rng.integers(0, i)
    area = rng.random(N).astype(np.float32)
    got = np.asarray(flow.accumulate(jnp.asarray(parent), jnp.asarray(area), 10))
    want = brute_force_accumulate(parent, area)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_accumulate_long_chain():
    """A path graph longer than 2^rounds would break a lazy implementation;
    rounds=ceil(log2(N)) must cover it exactly."""
    N = 1000
    parent = np.arange(-1, N - 1, dtype=np.int32)  # i -> i-1 chain
    area = np.ones(N, np.float32)
    rounds = flow._doubling_rounds(N)
    got = np.asarray(flow.accumulate(jnp.asarray(parent), jnp.asarray(area), rounds))
    want = np.arange(N, 0, -1, dtype=np.float32)  # acc[0]=N ... acc[N-1]=1
    np.testing.assert_allclose(got, want)


def test_resolve_roots_chain():
    N = 257
    parent = np.arange(-1, N - 1, dtype=np.int32)
    roots = np.asarray(flow.resolve_roots(jnp.asarray(parent), flow._doubling_rounds(N)))
    assert (roots == 0).all()


def test_directions_point_downhill():
    """On a monotone east-facing slope above sea level, every interior cell
    must flow toward lower ground (eastward components)."""
    g = Grid(32, 16, coords=(-1.0, 1.0, -2.0, 2.0))  # regional: no wrap noise
    c = np.arange(32, dtype=np.float32)
    h = np.broadcast_to(10.0 - 0.2 * c, (16, 32)).copy()  # decreasing eastward
    sel = jnp.ones((16, 32))
    code = np.asarray(flow.flow_directions(jnp.asarray(h), sel, g))
    # interior cells flow east (codes 3, 6, or 9 = dx=+1)
    interior = code[2:-2, 2:-2]
    assert np.isin(interior, [3, 6, 9]).all()


def test_flow_filter_conservation_and_lakes():
    g = Grid(48, 24)
    params = NoiseParams(mode="default", octaves=4, scale=2.0, min=-2.0, max=3.0,
                         seed=3)
    h = fbm(g, params)
    sel = jnp.ones(g.shape)
    fm = np.asarray(flow.flow_filter(h, sel, g,
                                     flow.FlowConfig(exponent=1.0, lakes=True)))
    hn = np.asarray(h)
    assert np.isfinite(fm[hn > 0]).all()
    # ocean cells are 'uninteresting' -> -1 (modulo blur-boundary cells)
    assert (fm[hn <= 0] <= 0).all()
    # some river structure exists
    assert (fm > 0).sum() > 50


def test_crater_lake_drains_to_ocean():
    """An inland depression ringed by high ground must connect over the
    lowest saddle and its flooded floor must be zeroed."""
    g = Grid(32, 16, coords=(-1.0, 1.0, -2.0, 2.0))
    h = np.full((16, 32), -1.0, np.float32)       # ocean
    h[2:14, 4:28] = 5.0                            # plateau island
    h[6:10, 10:18] = 2.0                           # crater floor (above sea)
    h[7, 18] = 3.0                                 # saddle in the east rim
    sel = jnp.ones((16, 32))
    cfg = flow.FlowConfig(preblur=0.0, exponent=1.0, lakes=True)
    fm = np.asarray(flow.flow_filter(jnp.asarray(h), sel, g, cfg))
    # crater floor cells were reached (not -1): either flooded (0) or carrying flow
    floor = fm[6:10, 10:18]
    assert (floor >= 0).all(), floor
    assert np.isfinite(fm).all()


def test_cell_area_nonnegative_and_cosine():
    g = Grid(64, 32)
    area = np.asarray(flow.cell_area_lower_edge(g))
    assert (area >= 0).all()
    # row above equator edge has cos(phi=0)=1 scaling
    pwx = g.circumference * 2 * PI / (2 * PI) / 64
    pwy = g.circumference * PI / (2 * PI) / 32
    np.testing.assert_allclose(area[16, 0], pwx * pwy * 1e-5, rtol=1e-5)
