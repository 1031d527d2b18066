import math

import numpy as np
import pytest

import jax.numpy as jnp

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.ops import adjust, blend, blur, morphological, noise, temperature, thermal

from oracles import shift_oracle, gradient_oracle

PI = math.pi


def rand_field(grid, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(grid.shape) * scale).astype(np.float32)


# ---------------------------------------------------------------- blur


def test_sigma_list_variance():
    for radius in [0.5, 1.0, 3.0, 7.0, 25.0]:
        rl = blur.sigma_list(radius)
        want = (radius / 2) ** 2 / 2
        assert abs(sum(r * r for r in rl) - want) < 1e-4 * max(want, 1)


def test_blur_preserves_constant():
    g = Grid(32, 16)
    f = jnp.full(g.shape, 3.25, jnp.float32)
    out = blur.blur(f, g, 5.0)
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=2e-5)


def test_blur_smooths_delta_symmetrically():
    g = Grid(64, 32)
    f = jnp.zeros(g.shape).at[16, 32].set(1.0)
    out = np.asarray(blur.blur(f, g, 6.0))
    assert out[16, 32] < 1.0
    assert out.max() == out[16, 32]
    # E/W symmetry at the impulse row
    np.testing.assert_allclose(out[16, 33], out[16, 31], rtol=1e-4)
    assert abs(out.sum() - 1.0) < 0.05  # approximately mass preserving


# ---------------------------------------------------------------- thermal


def thermal_oracle(h, grid, substeps=1):
    """Direct numpy transliteration of ThermalErosion.cpp:25-142."""
    coords = grid.coords
    gx, gy = gradient_oracle(h, coords, grid.circumference)
    for _ in range(substeps):
        gx, gy = gradient_oracle(h, coords, grid.circumference)
        slope = np.arctan(np.sqrt(gx**2 + gy**2))
        neigh = [shift_oracle(h, dx, dy, coords)
                 for (dx, dy) in [(-1, 1), (0, 1), (1, 1), (1, 0), (-1, 0),
                                  (1, -1), (0, -1), (-1, -1)]]
        minh = h.copy()
        count = np.ones_like(h)
        for n2 in neigh:
            minh = np.minimum(minh, n2)
            count += (n2 < h)
        shed = np.where((slope > PI / 6) & (h > 0), (h - minh) / count * 0.3, 0.0)
        gain = np.zeros_like(h)
        for (dx, dy) in [(-1, 1), (0, 1), (1, 1), (-1, 0), (1, 0),
                         (-1, -1), (0, -1), (1, -1)]:
            h2 = shift_oracle(h, dx, dy, coords)
            s2 = shift_oracle(shed, dx, dy, coords)
            gain += np.where(h2 > h, s2, 0.0)
        keep = (slope > PI / 6 / 10) & (h > 0)
        h = np.where(keep, h, h + gain).astype(np.float32)
    return h


def test_thermal_matches_oracle():
    g = Grid(16, 8)
    h = rand_field(g, seed=7, scale=2000.0)  # steep terrain in km at ~2600km pixels
    got = np.asarray(thermal.thermal_erosion_step(jnp.asarray(h), g, substeps=2))
    want = thermal_oracle(h, g, substeps=2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_thermal_flat_unchanged():
    g = Grid(16, 8)
    h = jnp.full(g.shape, 1.0, jnp.float32)
    out = thermal.thermal_erosion_step(h, g)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(h))


# ---------------------------------------------------------------- morphological


def test_morphology_bounds():
    g = Grid(32, 16)
    f = jnp.asarray(rand_field(g, 3))
    e = morphological.erode(f, g, 3.0)
    d = morphological.dilate(f, g, 3.0)
    assert float(jnp.max(e - f)) <= 0.0
    assert float(jnp.min(d - f)) >= 0.0
    grad = morphological.morphological_gradient(f, g, 3.0)
    assert float(jnp.min(grad)) >= 0.0


def test_morphology_constant():
    g = Grid(32, 16)
    f = jnp.full(g.shape, 2.0, jnp.float32)
    np.testing.assert_array_equal(np.asarray(morphological.erode(f, g, 5.0)), 2.0)


# ---------------------------------------------------------------- blend / adjust


def test_blend_modes():
    old = jnp.asarray([1.0, 2.0])
    new = jnp.asarray([3.0, 0.5])
    sel = jnp.asarray([1.0, 0.5])
    np.testing.assert_allclose(blend.blend(old, new, sel, "replace"), [3.0, 1.25])
    np.testing.assert_allclose(blend.blend(old, new, sel, "add"), [4.0, 2.25])
    np.testing.assert_allclose(blend.blend(old, new, sel, "subtract"), [0.0, 1.5])
    np.testing.assert_allclose(blend.blend(old, new, sel, "max"), [3.0, 2.0])
    np.testing.assert_allclose(blend.selection_mode(old, new, "intersect"), [3.0, 1.0])


def test_adjust():
    h = jnp.asarray([1.0, -2.0])
    sel = jnp.asarray([1.0, 0.5])
    np.testing.assert_allclose(adjust.offset(h, sel, 2.0), [3.0, -1.0])
    np.testing.assert_allclose(adjust.scale(h, sel, 3.0), [3.0, -4.0])


# ---------------------------------------------------------------- noise


def test_noise_seamless_across_dateline():
    """Noise is a function of the 3D sphere point only: rotating the grid a
    half-world in longitude must produce the same field rolled."""
    g1 = Grid(32, 16)
    g2 = Grid(32, 16, coords=(-PI / 2, PI / 2, 0.0, 2 * PI))
    params = noise.NoiseParams(mode="default", octaves=3, scale=4.0, seed=5)
    off = noise.seed_offset_from(5)
    n1 = np.asarray(noise.fbm(g1, params, off))
    n2 = np.asarray(noise.fbm(g2, params, off))
    np.testing.assert_allclose(n1, np.roll(n2, 16, axis=1), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", list(noise.NoiseParams.__annotations__ and
                                      ["default", "ridged", "billowy", "iq",
                                       "swiss", "jordan", "plateaus"]))
def test_noise_modes_finite(mode):
    g = Grid(16, 8)
    params = noise.NoiseParams(mode=mode, octaves=3, scale=3.0, warp=0.5,
                               min=-1.0, max=2.0)
    out = np.asarray(noise.fbm(g, params))
    assert np.isfinite(out).all()
    assert out.std() > 0


def test_noise_blend_into_terrain():
    g = Grid(16, 8)
    h = jnp.zeros(g.shape)
    sel = jnp.zeros(g.shape).at[:, :4].set(1.0)
    params = noise.NoiseParams(mode="default", octaves=2, scale=3.0)
    out = np.asarray(noise.gradient_noise(h, sel, g, params, "replace"))
    assert (out[:, 4:] == 0).all()
    assert np.abs(out[:, :4]).sum() > 0


# ---------------------------------------------------------------- temperature


def qday_oracle(phi, M):
    ecc, gamma, omega2 = 0.017, 23.44 / 180 * PI, 77.05 / 180 * PI
    A = M + (2 * ecc - ecc**3 / 4 * math.sin(M)
             + 5 / 4 * ecc**2 * math.sin(2 * M)
             + 13 / 12 * ecc**3 * math.sin(3 * M))
    S = 1365 * (1 + 2 * ecc * math.cos(A))
    delt = math.asin(math.sin(gamma) * math.sin(A - omega2))
    if abs(phi) <= PI / 2 - abs(delt):
        h = math.acos(-math.tan(phi) * math.tan(delt))
    else:
        h = PI if (math.copysign(1, phi) == math.copysign(1, delt) and phi != 0) else 0.0
    return S / PI * (h * math.sin(phi) * math.sin(delt)
                     + math.cos(phi) * math.cos(delt) * math.sin(h))


def test_qday_matches_oracle():
    for phi in [-1.4, -0.7, 0.0, 0.3, 1.0, 1.5]:
        for M in [0.0, 1.0, PI, 4.5]:
            got = float(temperature.qday(jnp.float32(phi), jnp.float32(M)))
            want = qday_oracle(phi, M)
            assert abs(got - want) < 1e-2, (phi, M, got, want)


def test_temperature_steps_sane():
    g = Grid(32, 16)
    terrain = jnp.asarray(rand_field(g, 11, scale=1.0))
    T = temperature.init_temperature(g)
    T, i = temperature.temperature_step(T, terrain, 0.0, g, substeps=100)
    T = np.asarray(T)
    assert np.isfinite(T).all()
    assert float(i) == 100.0
    # radiative cooling from 50C start dominates initially
    assert T.mean() < 50.0
