import math

import numpy as np
import pytest

import jax.numpy as jnp

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.viz import CanvasParams, PROJECTIONS, appearance, project_field
from demiurge_tpu.viz.appearance import gradient_lut, render, sample_lut

PI = math.pi


def terrain(g):
    from demiurge_tpu.ops.noise import NoiseParams, fbm

    return fbm(g, NoiseParams(octaves=3, scale=2.0, min=-2.0, max=3.0, seed=5))


def test_equirectangular_identity():
    """At zoom 1, window aspect 2 (w/h), the equirect canvas shows the whole
    map 1:1 (Canvas pipeline sanity): x spans ±pi, y spans ±pi/2."""
    g = Grid(64, 32)
    h = terrain(g)
    p = CanvasParams(projection="equirectangular", zoom=1.0, window_aspect=2.0)
    img, oob = project_field(h, p, g, 64, 32)
    assert not bool(oob.any())
    np.testing.assert_allclose(np.asarray(img), np.asarray(h), rtol=1e-5)


@pytest.mark.parametrize("name", sorted(PROJECTIONS))
def test_projection_inverse_consistency(name):
    """inverse() composed with the forward spherical mapping: the returned
    (lam, phi) must reproject to the input plane point for interior points
    (checked via the known forward formulas where simple, else via
    smoothness/validity)."""
    proj = PROJECTIONS[name]
    lam, phi, oob = proj.inverse(jnp.float32(0.1), jnp.float32(0.05))
    assert not bool(oob)
    assert abs(float(lam)) < 0.5 and abs(float(phi)) < 0.5
    # out-of-bounds detection fires far outside
    _, _, oob2 = proj.inverse(jnp.float32(50.0), jnp.float32(50.0))
    assert bool(oob2)


def test_mollweide_known_point():
    """Mollweide inverse at the equator center: y=0 -> phi=0, lam = pi x/(2 sqrt2)."""
    lam, phi, oob = PROJECTIONS["mollweide"].inverse(jnp.float32(1.0), jnp.float32(0.0))
    assert abs(float(phi)) < 1e-6
    assert abs(float(lam) - PI / (2 * math.sqrt(2))) < 1e-5


def test_mercator_inverse():
    lam, phi, _ = PROJECTIONS["mercator"].inverse(jnp.float32(0.5), jnp.float32(0.0))
    assert abs(float(phi)) < 1e-6 and abs(float(lam) - 0.5) < 1e-6
    _, phi2, _ = PROJECTIONS["mercator"].inverse(jnp.float32(0.0), jnp.float32(100.0))
    assert abs(float(phi2) - PI / 2) < 1e-3


def test_oblique_rotation_moves_center():
    g = Grid(64, 32)
    h = terrain(g)
    p0 = CanvasParams(projection="orthographic")
    p1 = CanvasParams(projection="orthographic", rotation=(1.0, 0.5, 0.0))
    i0, _ = project_field(h, p0, g, 64, 64)
    i1, _ = project_field(h, p1, g, 64, 64)
    assert float(jnp.abs(i0 - i1).max()) > 0


def test_gradient_lut_interp():
    lut = gradient_lut([0, 0, 0, 255, 255, 255], n=100)
    assert lut.shape == (100, 4)
    v = np.asarray(sample_lut(lut, jnp.float32(0.5)))
    assert abs(v[0] - 0.5) < 0.02
    # clamp
    v0 = np.asarray(sample_lut(lut, jnp.float32(-1.0)))
    assert v0[0] == 0.0


def test_render_chain_shapes_and_range():
    g = Grid(64, 32)
    h = terrain(g)
    img = render(h, g, [appearance.ElevationMap(land="atlas", ocean="blue",
                                                scale=3.0),
                        appearance.Hillshade(z_factor=50.0,
                                             multidirectional=True),
                        appearance.SlopeMap(),
                        appearance.AspectMap(),
                        appearance.Graticules(interval=45.0)])
    assert img.shape == (32, 64, 4)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.min() >= 0 and a.max() <= 1


def test_vector_field_draws_arrows():
    g = Grid(64, 32)
    h = jnp.zeros(g.shape)
    u = jnp.ones(g.shape)
    v = jnp.zeros(g.shape)
    base = render(h, g, [appearance.ElevationMap()])
    img = render(h, g, [appearance.ElevationMap(),
                        appearance.VectorField(spacing=8)], uv=(u, v))
    assert float(jnp.abs(img - base).max()) > 0
