"""Independent-oracle parity for the ocean and erosion passes.

Each repo pass (under ``exact_quirks=True`` / 'exact' sampling) is checked
allclose against a scalar NumPy transliteration of the cited reference GLSL
(tests/oracles.py) on a small full-globe grid with real coastlines — the
north-star "match the reference implementation" check at op level.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import oracles
from demiurge_tpu.core.grid import Grid
from demiurge_tpu.ops import erosion, ocean
from demiurge_tpu.ops.noise import NoiseParams, fbm

PI = math.pi


def _setup(W=48, H=24, seed=5):
    g = Grid(W, H)
    h = fbm(g, NoiseParams(mode="default", octaves=4, scale=2.0,
                           min=-1.5, max=2.0, seed=seed))
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    u = jnp.where(h > 0, 0.0, jax.random.normal(k1, g.shape) * 2.0)
    v = jnp.where(h > 0, 0.0, jax.random.normal(k2, g.shape) * 2.0)
    return g, h, u, v


CFG = ocean.OceanConfig(exact_quirks=True, advect_method="exact",
                        pressure_method="xla", diffusion_iters=1,
                        jacobi_iters=1)


def _close(a, b, rtol=2e-4, atol=None):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if atol is None:
        atol = 1e-5 * (np.abs(b).max() + 1e-30)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


def test_advect_matches_oracle():
    g, h, u, v = _setup()
    nu, nv = ocean.advect(u, v, h, g, CFG)
    ou, ov = oracles.ocean_advect_oracle(np.asarray(u), np.asarray(v),
                                         np.asarray(h), g.coords,
                                         g.circumference)
    _close(nu, ou, atol=2e-4)
    _close(nv, ov, atol=2e-4)


def test_diffusion_sweep_matches_oracle():
    g, h, u, v = _setup()
    nu, nv = ocean.diffusion(u, v, h, g, CFG)  # 1 sweep
    ou, ov = oracles.ocean_diffusion_sweep_oracle(
        np.asarray(u), np.asarray(v), np.asarray(h), g.coords,
        g.circumference)
    _close(nu, ou)
    _close(nv, ov)


def test_divergence_matches_oracle():
    g, h, u, v = _setup()
    d = ocean.divergence(u, v, h, g, CFG)
    od = oracles.ocean_divergence_oracle(np.asarray(u), np.asarray(v),
                                         np.asarray(h), g.coords,
                                         CFG.pressurefactor,
                                         g.circumference)
    _close(d, od)


def test_pressure_sweeps_match_oracle():
    g, h, u, v = _setup()
    d = ocean.divergence(u, v, h, g, CFG)
    d_np = np.asarray(d)
    h_np = np.asarray(h)
    p_np = np.zeros_like(d_np)
    for _ in range(3):
        p_np = oracles.ocean_jacobi_sweep_oracle(p_np, d_np, h_np, g.coords,
                                                 g.circumference)
    import dataclasses
    p = ocean.pressure_solve(d, h, g, dataclasses.replace(CFG,
                                                          jacobi_iters=3))
    _close(p, p_np)


def test_project_matches_oracle():
    g, h, u, v = _setup()
    d = ocean.divergence(u, v, h, g, CFG)
    p = ocean.pressure_solve(d, h, g, CFG)
    nu, nv = ocean.project(u, v, p, h, g, CFG)
    ou, ov = oracles.ocean_project_oracle(np.asarray(u), np.asarray(v),
                                          np.asarray(p), np.asarray(h),
                                          g.coords, CFG.pressurefactor,
                                          g.circumference)
    _close(nu, ou)
    _close(nv, ov)


def test_erosion_pass_matches_oracle():
    g, h, _, _ = _setup()
    uplift, h0 = erosion.init_uplift(h)
    # a plausible positive flow map
    flow_map = jnp.abs(fbm(g, NoiseParams(octaves=3, scale=3.0, min=0.0,
                                          max=2.0, seed=9)))
    out = erosion.erosion_pass(h0, flow_map, uplift, g, 1.0, 1.0)
    o = oracles.erosion_pass_oracle(np.asarray(h0), np.asarray(flow_map),
                                    np.asarray(uplift), g.coords,
                                    1.0, 1.0, g.circumference)
    _close(out, o)
