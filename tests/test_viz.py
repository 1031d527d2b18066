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


@pytest.mark.parametrize("name", sorted(n for n in PROJECTIONS
                                        if n != "img"))
def test_projection_inverse_consistency(name):
    """inverse() composed with the forward spherical mapping: the returned
    (lam, phi) must reproject to the input plane point for interior points
    (checked via the known forward formulas where simple, else via
    smoothness/validity).  'img' has its own screen->tex mapping (no
    spherical inverse) and is covered by test_img_flat_view."""
    proj = PROJECTIONS[name]
    lam, phi, oob = proj.inverse(jnp.float32(0.1), jnp.float32(0.05))
    assert not bool(oob)
    assert abs(float(lam)) < 0.5 and abs(float(phi)) < 0.5
    # out-of-bounds detection fires far outside
    _, _, oob2 = proj.inverse(jnp.float32(50.0), jnp.float32(50.0))
    assert bool(oob2)


def test_img_flat_view():
    """The raw-texture quad view (img.cpp:14-148): screen center maps to
    tex center; the view is aspect-true (equal screen steps move equal
    TEXTURE-pixel counts in x and y); t decreases upward (row 0 = top of
    the quad); pan shifts the view; far zoom shows the whole quad with
    out-of-bounds beyond it."""
    from demiurge_tpu.viz.projections import inverse_point

    g = Grid(64, 32)
    p = CanvasParams(projection="img", zoom=1.0, window_aspect=1.0)
    c = inverse_point(p, g, 0.5, 0.5)
    assert c is not None
    np.testing.assert_allclose(c, (0.5, 0.5), atol=1e-6)

    d = 0.1
    right = inverse_point(p, g, 0.5 + d, 0.5)
    up = inverse_point(p, g, 0.5, 0.5 + d)
    # aspect-true: ds*W == |dt|*H for equal screen steps
    np.testing.assert_allclose((right[0] - 0.5) * g.width,
                               (0.5 - up[1]) * g.height, rtol=1e-5)
    assert up[1] < 0.5  # y-up screen motion -> decreasing t? no: t=0 top
    # pan moves the window (quad units)
    p2 = CanvasParams(projection="img", zoom=1.0, window_aspect=1.0,
                      offset=(0.3, 0.0))
    c2 = inverse_point(p2, g, 0.5, 0.5)
    assert c2[0] < c[0]  # panning the quad +x shows smaller s at center

    # zoomed far out, corners beyond the quad are out of bounds
    pfar = CanvasParams(projection="img", zoom=5.0, window_aspect=1.0)
    img, oob = project_field(terrain(g), pfar, g, 32, 16)
    assert bool(np.asarray(oob).any())
    assert inverse_point(pfar, g, 0.02, 0.02) is None


def test_orthographic_globe_drag():
    """Drag-to-rotate (Orthographic.cpp:71-127): dragging moves the picked
    texture point with the cursor (the globe follows the mouse), delta_phi
    clamps to [0, pi], and the canvas renders through the rotation."""
    import dataclasses as dc

    from demiurge_tpu.viz.projections import (orthographic_drag,
                                              orthographic_mouse_pos)

    g = Grid(64, 32)
    p = CanvasParams(projection="orthographic",
                     ortho_state=(0.0, math.pi / 2))
    before = orthographic_mouse_pos(p, g, 0.5, 0.5)
    p2 = orthographic_drag(p, g, (0.5, 0.5), (0.55, 0.5))
    assert p2.ortho_state != p.ortho_state
    # the point previously under the cursor center is now (approximately)
    # under the new cursor position: its tex coords there match
    after = orthographic_mouse_pos(p2, g, 0.55, 0.5)
    np.testing.assert_allclose(after, before, atol=0.02)

    # delta_phi clamp
    p3 = p
    for _ in range(10):
        p3 = orthographic_drag(p3, g, (0.5, 0.5), (0.5, 0.6))
    assert 0.0 <= p3.ortho_state[1] <= math.pi + 1e-9

    # renders (no crash, center in bounds, rim out of bounds)
    img, oob = project_field(terrain(g), dc.replace(p2, zoom=1.2), g, 32, 32)
    o = np.asarray(oob)
    assert not o[16, 16] and o[0, 0]


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


def test_overlay_layers():
    """Brush-circle / selection-outline / darken-unselected overlays
    (Shader.h:216-275, FreeSelection.cpp:182-188)."""
    from demiurge_tpu.viz.appearance import (BrushOutline, ElevationMap,
                                             SelectionOutline, UnselectedDim,
                                             render)

    g = Grid(64, 32)
    h = jnp.ones(g.shape) * 0.5
    sel = jnp.zeros(g.shape).at[8:24, 16:48].set(1.0)

    base = render(h, g, layers=[ElevationMap()])
    bo = render(h, g, layers=[ElevationMap(),
                              BrushOutline(center=(0.5, 0.5), size=8.0)])
    # the outline ring changes some pixels near the center, not all
    changed = np.any(np.asarray(base) != np.asarray(bo), axis=-1)
    assert changed.any() and not changed.all()
    # ring pixels are at geodistance ~ size
    ys, xs = np.nonzero(changed)
    s = (xs + 0.5) / 64
    t = (ys + 0.5) / 32
    r = np.asarray(g.geodistance_tex((jnp.asarray(s), jnp.asarray(t)),
                                     (0.5, 0.5)))
    assert (np.abs(r - 8.0) < 3.0).all()

    so = render(h, g, layers=[ElevationMap(), SelectionOutline(sel=sel)])
    changed = np.any(np.asarray(base) != np.asarray(so), axis=-1)
    # outline only at the selection boundary (within 1 px of an edge)
    bsel = np.asarray(sel) != 0
    edge = (np.roll(bsel, -1, 1) != np.roll(bsel, 1, 1)) | \
           (np.roll(bsel, -1, 0) != np.roll(bsel, 1, 0))
    assert changed[edge].sum() > 0
    assert not changed[~edge].any()

    dim = render(h, g, layers=[ElevationMap(), UnselectedDim(sel=sel)])
    d = np.asarray(dim)
    b = np.asarray(base)
    inside = np.asarray(sel) > 0
    np.testing.assert_allclose(d[inside], b[inside], atol=1e-6)
    assert (d[~inside][..., :3] <= b[~inside][..., :3] + 1e-6).all()
