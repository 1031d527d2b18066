"""Pallas kernel equivalence vs the XLA reference paths.

The fused-sweep kernels must reach the same fixpoints as the plain jitted
sweeps (f32 reassociation-level differences only).  Compiled Mosaic runs
TPU-only; on CPU the kernels run in interpreter mode on a small grid so the
equivalence is still exercised everywhere.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demiurge_tpu import Grid
from demiurge_tpu.ops import ocean
from demiurge_tpu.ops.ocean import OceanConfig


def _setup(W, H, seed=0):
    grid = Grid(W, H)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    # smooth-ish land mask with real coastlines
    h = jax.random.normal(k1, (H, W))
    for _ in range(3):
        h = (h + jnp.roll(h, 1, 0) + jnp.roll(h, -1, 0)
             + jnp.roll(h, 1, 1) + jnp.roll(h, -1, 1)) / 5
    u = jax.random.normal(k2, (H, W)) * 0.1
    v = jax.random.normal(k3, (H, W)) * 0.1
    return grid, h, u, v


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Mosaic kernel; CPU covered by "
                           "test_pressure_pallas_interpret")
def test_pressure_pallas_matches_xla_tpu():
    grid, h, u, v = _setup(512, 256)
    cfg = OceanConfig(jacobi_iters=96, diffusion_iters=2,
                      pressure_method="xla")
    div = ocean.divergence(u, v, h, grid, cfg)
    px = ocean.pressure_solve(div, h, grid, cfg)
    pp = ocean.pressure_solve(
        div, h, grid, dataclasses.replace(cfg, pressure_method="pallas"))
    scale = float(jnp.abs(px).max()) + 1e-30
    assert float(jnp.abs(px - pp).max()) / scale < 1e-4


def test_pressure_pallas_interpret():
    """Interpreter-mode run of the banded kernel on a tiny grid."""
    from demiurge_tpu.pallas_kernels import jacobi

    grid, h, u, v = _setup(256, 128)
    cfg = OceanConfig(jacobi_iters=32, diffusion_iters=2,
                      pressure_method="xla")
    div = ocean.divergence(u, v, h, grid, cfg)
    px = ocean.pressure_solve(div, h, grid, cfg)
    pp = jacobi.pressure_solve_pallas(div, h, grid, iters=32, k=8, band=64,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(px),
                               rtol=2e-4, atol=1e-6 * float(jnp.abs(px).max() + 1))


def test_flow_pallas_interpret_matches_stencil():
    """The banded multi-sweep flow kernel must hit the exact fixpoint of
    flow_solve_stencil (bitwise: both sum the same 8 masked adds in the
    same order)."""
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.pallas_kernels.flow import flow_solve_pallas

    grid = Grid(128, 64)
    h = fbm(grid, NoiseParams(octaves=4, scale=2.0, min=-2.0, max=3.0,
                              seed=3))
    sel = jnp.ones(grid.shape, jnp.float32)
    hb = blur(h, grid, 0.5)
    code = flow.flow_directions(hb, sel, grid)
    _, mouth, _ = flow.incoming_mask(code, grid)
    area = flow.cell_area_lower_edge(grid)

    A_ref, vis_ref, _ = flow.flow_solve_stencil(code, area, mouth, grid)
    A, vis = flow_solve_pallas(code, area, mouth, grid, k=8,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(vis), np.asarray(vis_ref))
    np.testing.assert_array_equal(np.asarray(A), np.asarray(A_ref))

    # split halves (the production TPU route) hit the same fixpoints
    A2, _ = flow_solve_pallas(code, area, mouth, grid, k=8, mode="A",
                              interpret=True)
    _, vis2 = flow_solve_pallas(code, area, mouth, grid, k=8, mode="vis",
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(A2), np.asarray(A_ref))
    np.testing.assert_array_equal(np.asarray(vis2), np.asarray(vis_ref))


def test_pressure_resident_interpret_matches_xla():
    """Single-launch VMEM-resident pressure solve (coefficients loaded
    once, in-kernel pole-halo refresh) vs the XLA scan."""
    from demiurge_tpu.pallas_kernels import jacobi

    grid, h, u, v = _setup(256, 128)
    cfg = OceanConfig(jacobi_iters=40, diffusion_iters=2,
                      pressure_method="xla")
    div = ocean.divergence(u, v, h, grid, cfg)
    px = ocean.pressure_solve(div, h, grid, cfg)
    pr = jacobi.pressure_solve_resident(div, h, grid, iters=40, k=20,
                                        interpret=True)
    scale = float(jnp.abs(px).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(pr) / scale,
                               np.asarray(px) / scale, atol=2e-4)


def test_diffusion_resident_interpret_matches_xla():
    """Single-launch resident viscosity solve (both components per launch,
    sign-flipped velocity pole halos) vs the XLA scan, including a
    remainder round (50 = 4*12 + 2)."""
    from demiurge_tpu.pallas_kernels import jacobi

    grid, h, u, v = _setup(256, 128)
    cfg = OceanConfig(diffusion_iters=50)
    xu, xv = ocean.diffusion(u, v, h, grid, cfg)
    ru, rv = jacobi.diffusion_solve_resident(u, v, h, grid, iters=50, k=12,
                                             interpret=True)
    scale = float(jnp.abs(xu).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(ru) / scale,
                               np.asarray(xu) / scale, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rv) / scale,
                               np.asarray(xv) / scale, atol=2e-5)


def test_visbits_interpret_matches_stencil():
    """The bit-packed vis solver (32 rows per uint32 lane) must reproduce
    the stencil fixpoint exactly on a grid with interior sinks."""
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.pallas_kernels.visbits import vis_solve_bits

    grid = Grid(128, 64)
    h = fbm(grid, NoiseParams(octaves=4, scale=2.0, min=-2.0, max=3.0,
                              seed=3))
    sel = jnp.ones(grid.shape, jnp.float32)
    hb = blur(h, grid, 0.5)
    code = flow.flow_directions(hb, sel, grid)
    _, mouth, _ = flow.incoming_mask(code, grid)
    area = flow.cell_area_lower_edge(grid)

    _, vis_ref, _ = flow.flow_solve_stencil(code, area, mouth, grid)
    vis, sweeps = vis_solve_bits(code, mouth, grid, interpret=True,
                                 with_stats=True)
    np.testing.assert_array_equal(np.asarray(vis), np.asarray(vis_ref))
    assert int(sweeps[0]) > 0


def test_advect_pallas_interpret_matches_taps():
    """The fused tap-sampler kernel must match the XLA tap loop exactly."""
    from demiurge_tpu.ops.ocean import _advect_sample_fast
    from demiurge_tpu.pallas_kernels.advect import advect_sample_pallas

    grid, h, u, v = _setup(256, 128)
    W, H = grid.width, grid.height
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    dx = jax.random.uniform(k1, (H, W), minval=-8.0, maxval=8.0)
    dy = jax.random.uniform(k2, (H, W), minval=-2.0, maxval=2.0)
    c = jnp.arange(W, dtype=jnp.float32).reshape(1, -1)
    r = jnp.arange(H, dtype=jnp.float32).reshape(-1, 1)
    s2 = (c + dx + 0.5) / W
    t2 = (r + dy + 0.5) / H

    xu, xv = _advect_sample_fast(u, v, s2, t2, grid, 8, 2)
    pu, pv = advect_sample_pallas(u, v, dx, dy, 8, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(pu), np.asarray(xu), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), atol=1e-5)


def test_pressure_method_auto_dispatch():
    """'auto' must pick xla on CPU and not crash on odd grids."""
    grid, h, u, v = _setup(250, 120)
    cfg = OceanConfig(jacobi_iters=8, diffusion_iters=2)
    div = ocean.divergence(u, v, h, grid, cfg)
    p = ocean.pressure_solve(div, h, grid, cfg)
    assert bool(jnp.isfinite(p).all())


def test_climate_pallas_interpret_matches_xla():
    """The fused K-substep climate kernel (barrel-rolled corner taps,
    pole-reflected halos) must match the XLA substep scan."""
    from demiurge_tpu.ops import temperature
    from demiurge_tpu.pallas_kernels.climate import climate_step_pallas

    grid, h, u, v = _setup(256, 128)
    T = temperature.init_temperature(grid) + u * 10  # non-uniform start
    Tx, ix = temperature.temperature_step(T, h, 3.0, grid, substeps=10)
    Tp, ip = climate_step_pallas(T, h, 3.0, grid, substeps=10, band=64,
                                 interpret=True)
    assert float(ix) == float(ip)
    np.testing.assert_allclose(np.asarray(Tp), np.asarray(Tx),
                               rtol=2e-5, atol=2e-4)


def test_diffusion_pallas_interpret_matches_xla():
    """The banded viscosity kernel (sign-flipped pole halos, N/S coefficient
    swap) must match the XLA scan after the same number of sweeps."""
    from demiurge_tpu.pallas_kernels import jacobi

    grid, h, u, v = _setup(256, 128)
    cfg = OceanConfig(diffusion_iters=20)
    xu, xv = ocean.diffusion(u, v, h, grid, cfg)
    pu, pv = jacobi.diffusion_solve_pallas(u, v, h, grid, iters=20, k=10,
                                           band=64, interpret=True)
    scale = float(jnp.abs(xu).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(pu) / scale,
                               np.asarray(xu) / scale, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pv) / scale,
                               np.asarray(xv) / scale, atol=2e-5)


def test_advect_tiered_interpret_matches_taps():
    """Tiered sampler == plain hat taps wherever the strip radius covers
    the displacement (interpret mode, small grid)."""
    from demiurge_tpu.core.grid import Grid as G
    from demiurge_tpu.pallas_kernels.advect import (advect_sample_tiered,
                                                    strip_radii)
    from demiurge_tpu.core.topology import _clamped_shift

    grid, h, u, v = _setup(256, 128)
    key = jax.random.PRNGKey(3)
    s2 = jax.random.uniform(key, (128, 256)) * 0.004 + \
        (jnp.arange(256).reshape(1, -1) + 0.5) / 256
    t2 = (jnp.arange(128).reshape(-1, 1) + 0.5) / 128 + 0.001
    W, H = 256, 128
    c = jnp.arange(W, dtype=jnp.float32).reshape(1, -1)
    r = jnp.arange(H, dtype=jnp.float32).reshape(-1, 1)
    radii = strip_radii(grid, 1.0, 24.0)
    rx = jnp.asarray(np.repeat(np.asarray(radii, np.float32), 32)
                     ).reshape(-1, 1)
    dx = jnp.clip(s2 * W - 0.5 - c, -rx, rx)
    dy = jnp.broadcast_to(jnp.clip(t2 * H - 0.5 - r, -2, 2), (H, W))

    tu, tv = advect_sample_tiered(u, v, dx, dy, grid, interpret=True)

    # reference: plain hat-tap loop at a radius covering every strip's
    # fine range (mid strips; polar strips compared only where |dx| <= 6,
    # the hybrid kernel's exact branch)
    uv = jnp.stack([u, v])
    out = jnp.zeros_like(uv)
    for ky in range(-2, 3):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - ky))
        row = _clamped_shift(uv, ky, axis=1) if ky else uv
        for kx in range(-16, 17):
            w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - kx))
            out = out + w * jnp.roll(row, -kx, axis=-1)
    exact_cols = jnp.abs(dx) <= 6.0
    np.testing.assert_allclose(np.where(exact_cols, np.asarray(tu), 0),
                               np.where(exact_cols, np.asarray(out[0]), 0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.where(exact_cols, np.asarray(tv), 0),
                               np.where(exact_cols, np.asarray(out[1]), 0),
                               rtol=1e-5, atol=1e-6)


def test_flow_wave_interpret_matches_stencil():
    """Delta-wave band solver reaches the stencil fixpoint (interpret)."""
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from attic.flow_deadends import flow_solve_wave

    from demiurge_tpu import Grid as G

    grid = G(256, 128)
    h = fbm(grid, NoiseParams(mode="default", octaves=4, scale=2.0,
                              min=-2.0, max=3.0, seed=7))
    sel = jnp.ones(grid.shape, jnp.float32)
    hb = blur(h, grid, 0.5)
    code = flow.flow_directions(hb, sel, grid)
    _, mouth, _ = flow.incoming_mask(code, grid)
    area = flow.cell_area_lower_edge(grid)
    A0, vis0, _ = flow.flow_solve_stencil(code, area, mouth, grid)
    A1, vis1 = flow_solve_wave(code, area, mouth, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(A0), np.asarray(A1),
                               rtol=1e-5, atol=1e-7)
    assert (np.asarray(vis0) == np.asarray(vis1)).all()


def test_blur_pallas_interpret_matches_xla():
    """The fused multi-iteration blur kernel (vertical collapse + barrel
    taps) must match ops.blur's pass sequence (reassociation only)."""
    from demiurge_tpu import Grid as G
    from demiurge_tpu.ops.blur import blur13_pass, sigma_list
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.pallas_kernels.blur import (blur_pallas,
                                                  blur_resident_supported)

    grid = G(256, 128)
    h = fbm(grid, NoiseParams(mode="default", octaves=4, scale=2.0,
                              min=-2.0, max=3.0, seed=7))
    assert blur_resident_supported(grid, 0.5)
    want = h
    for r in sigma_list(0.5):
        want = blur13_pass(want, grid, (0.0, r))
        want = blur13_pass(want, grid, (r, 0.0))
    got = blur_pallas(h, grid, 0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_flow_local_vis_pallas_seed_matches_xla():
    """The band-local Pallas reachability kernel (flow2.flow_local_vis)
    must match its XLA twin with a NONZERO injection seed — the phase-3
    configuration the two-level sharded solve would route to on TPU."""
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.pallas_kernels.flow import pack_masks
    from demiurge_tpu.pallas_kernels.flow2 import (flow_local_vis,
                                                   flow_local_vis_xla,
                                                   mask_local)

    grid = Grid(128, 64)
    h = fbm(grid, NoiseParams(octaves=4, scale=2.0, min=-2.0, max=3.0,
                              seed=5))
    sel = jnp.ones(grid.shape, jnp.float32)
    hb = blur(h, grid, 0.5)
    code = flow.flow_directions(hb, sel, grid)
    _, mouth, _ = flow.incoming_mask(code, grid)
    band = 16
    ploc = mask_local(pack_masks(code, mouth, grid), band)
    # scatter a few resolved-reachability seeds onto boundary rows
    seed = jnp.zeros(grid.shape, jnp.float32)
    seed = seed.at[band - 1, ::7].set(1.0).at[band, 3::11].set(1.0)

    want = flow_local_vis_xla(ploc, seed, band)
    got = flow_local_vis(ploc, seed, band, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
