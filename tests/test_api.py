import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

from demiurge_tpu.api import Project
from demiurge_tpu.core.grid import Grid
from demiurge_tpu.ops.brush import BrushParams, brush_profile
from demiurge_tpu.ops.noise import NoiseParams
from demiurge_tpu.select import selection as sel_tools
from demiurge_tpu.utils.png import read_png, write_png

PI = math.pi


def small_project():
    return Project(width=64, height=32)


def test_project_noise_undo_redo():
    p = small_project()
    p.gradient_noise(NoiseParams(octaves=3, scale=2.0, min=-1.0, max=1.0))
    after = np.asarray(p.terrain)
    assert np.abs(after).max() > 0
    assert p.undo()
    np.testing.assert_allclose(np.asarray(p.terrain), 0.0, atol=1e-6)
    assert p.redo()
    np.testing.assert_allclose(np.asarray(p.terrain), after, atol=1e-6)


def test_undo_stack_depth_and_offsets():
    p = small_project()
    p.offset(1.0)
    p.offset(2.0)
    p.scale(2.0)
    np.testing.assert_allclose(np.asarray(p.terrain), 6.0, atol=1e-5)
    p.undo()
    np.testing.assert_allclose(np.asarray(p.terrain), 3.0, atol=1e-5)
    p.undo()
    np.testing.assert_allclose(np.asarray(p.terrain), 1.0, atol=1e-5)
    p.redo()
    p.redo()
    np.testing.assert_allclose(np.asarray(p.terrain), 6.0, atol=1e-5)


def test_blur_restore_unselected_weighted_blend():
    """Selection-masked blur must blend by the FRACTIONAL selection
    (restoreUnselected, Filter.cpp:51-68: fc = s*new + (1-s)*backup), not
    gate at sel > 0 — checked with a soft (blurred) selection edge."""
    p = small_project()
    p.gradient_noise(NoiseParams(octaves=3, scale=2.0, min=-1.0, max=1.0))
    p.select_height(-2.0, 0.0)
    p.select_blur(2.0)           # soft edge: fractional sel values
    s = np.asarray(p.sel)
    assert ((s > 0.01) & (s < 0.99)).sum() > 0, "selection edge not soft"
    before = np.asarray(p.terrain)
    from demiurge_tpu.ops.blur import blur as blur_op
    full = np.asarray(blur_op(p.terrain, p.grid, 3.0))
    p.blur(3.0)
    np.testing.assert_allclose(np.asarray(p.terrain),
                               s * full + (1 - s) * before, atol=1e-6)


def test_selection_tools():
    p = small_project()
    p.offset(1.0)  # all land at h=1
    p.select_height(0.5, 1.5)
    assert float(p.sel.min()) == 1.0
    p.select_invert()
    assert float(p.sel.max()) == 0.0
    p.undo()
    assert float(p.sel.min()) == 1.0
    # selection gates edits
    p.select_height(5.0, 6.0)  # selects nothing
    p.offset(10.0)
    np.testing.assert_allclose(np.asarray(p.terrain), 1.0, atol=1e-5)


def test_lasso_selects_triangle_region():
    g = Grid(64, 32)
    sel = jnp.zeros(g.shape)
    path = [(0.4, 0.4), (0.6, 0.4), (0.6, 0.6), (0.4, 0.6)]
    out = np.asarray(sel_tools.lasso(sel, g, path, "replace"))
    assert out.sum() > 0
    assert out.max() <= 1.0


def test_brush_profile_monotone():
    lut = brush_profile(0.5, n=64)
    assert lut.shape == (64, 64)
    # each row is a running integral -> monotone nondecreasing
    assert (np.diff(lut, axis=1) >= -1e-6).all()
    # center row integrates more than edge rows
    assert lut[0, -1] > lut[-1, -1]


def test_brush_stroke_raises_terrain():
    p = small_project()
    p.brush_stroke([(0.4, 0.5), (0.5, 0.5), (0.6, 0.5)],
                   BrushParams(size=5.0, value=1.0, flow=1.0))
    t = np.asarray(p.terrain)
    assert t.max() > 0
    # painted along the equator strip, not at the poles
    assert np.abs(t[0]).max() < np.abs(t[16]).max()
    assert p.undo()
    np.testing.assert_allclose(np.asarray(p.terrain), 0.0, atol=1e-6)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((16, 24)).astype(np.float32)
    path = str(tmp_path / "t.png")
    write_png(path, img, bitdepth=16)
    back = read_png(path)
    np.testing.assert_allclose(back, img, atol=1.0 / 65535 + 1e-6)
    # color roundtrip 8-bit
    rgb = rng.random((8, 8, 3)).astype(np.float32)
    write_png(path, rgb, bitdepth=8)
    back = read_png(path)
    np.testing.assert_allclose(back, rgb, atol=1.5 / 255)


def test_project_save_load(tmp_path):
    p = small_project()
    p.gradient_noise(NoiseParams(octaves=2, scale=2.0, min=-1.0, max=1.0))
    p.add_layer("extra", p.terrain * 2)
    path = str(tmp_path / "proj.npz")
    p.save(path)
    q = Project.load(path)
    np.testing.assert_allclose(np.asarray(q.terrain), np.asarray(p.terrain))
    assert len(q.layers) == len(p.layers)
    assert q.grid == p.grid


def test_heightmap_import_export(tmp_path):
    p = small_project()
    p.gradient_noise(NoiseParams(octaves=2, scale=2.0, min=0.0, max=1.0))
    path = str(tmp_path / "hm.png")
    p.export_png(path, bitdepth=16, lo=0.0, hi=1.0)
    q = small_project()
    q.load_heightmap(path)
    np.testing.assert_allclose(np.asarray(q.terrain), np.asarray(p.terrain),
                               atol=2e-4)


def test_layers_remove_undo():
    p = small_project()
    lid = p.add_layer("scratch")
    assert lid in p.layers
    p.remove_layer(lid)
    assert lid not in p.layers
    p.undo()
    assert lid in p.layers


def test_render_pipeline():
    p = small_project()
    p.gradient_noise(NoiseParams(octaves=3, scale=2.0, min=-1.0, max=2.0))
    img = p.render(projection="mollweide", out_w=128, out_h=64)
    assert img.shape == (64, 128, 4)
    assert np.isfinite(np.asarray(img)).all()


def test_project_simulation_filters():
    """The reference's OceanCurrents / Temperature / Tectonics filters as
    session operations: velocity persists, temperature replaces terrain
    undoably (Temperature.cpp:27-45), tectonics evolves plates."""
    from demiurge_tpu.ops.noise import NoiseParams

    p = Project(64, 32)
    p.gradient_noise(NoiseParams(octaves=3, scale=2.0, min=-2.0, max=3.0,
                                 seed=1))
    terrain_before = np.asarray(p.terrain)

    u, v = p.ocean_currents(steps=1)
    assert u.shape == p.grid.shape
    assert bool(jnp.isfinite(u).all()) and bool(jnp.isfinite(v).all())
    u2, _ = p.ocean_currents(steps=1)  # continues from persisted state
    assert float(jnp.abs(u2).max()) > 0

    T = p.temperature_sim(substeps=2)  # write_terrain=True by default
    np.testing.assert_array_equal(np.asarray(p.terrain), np.asarray(T))
    assert p.undo()
    # undo diffs go through the fixed-accuracy codec (1e-6, zfp parity)
    np.testing.assert_allclose(np.asarray(p.terrain), terrain_before,
                               atol=1e-5)

    p.tectonics(steps=1)
    assert p.plates  # plate state persists for continued runs
    assert bool(jnp.isfinite(p.terrain).all())
    assert p.undo()
    np.testing.assert_allclose(np.asarray(p.terrain), terrain_before,
                               atol=2e-5)


def test_progress_and_cancel():
    """ProgressFilter analog: progress reporting + cooperative cancel
    (reference src/filter/Filter.h:117-130, Filter.cpp:97-115)."""
    from demiurge_tpu.ops import erosion
    from demiurge_tpu.utils import Progress

    from demiurge_tpu.ops.noise import fbm

    g = Grid(64, 32)
    h = fbm(g, NoiseParams(octaves=3, scale=2.0, min=-1.0, max=2.0, seed=3))
    sel = jnp.ones(g.shape, jnp.float32)

    seen = []
    prog = Progress(lambda frac, info: seen.append((frac, info["step"])))
    erosion.landscape_evolution(h, sel, g,
                                erosion.ErosionConfig(lakes=False),
                                iterations=3, progress=prog)
    assert [s for _, s in seen] == [1, 2, 3]
    assert abs(seen[-1][0] - 1.0) < 1e-9

    # cancel after the first step: the driver stops early
    prog2 = Progress()
    calls = []

    def cb(i, hh):
        calls.append(i)
        if i == 0:
            prog2.cancel()

    erosion.landscape_evolution(h, sel, g,
                                erosion.ErosionConfig(lakes=False),
                                iterations=5, callback=cb, progress=prog2)
    assert calls == [0]
    assert prog2.cancelled
