"""Distribution tests on the 8-virtual-device CPU mesh (SURVEY §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.dist import field_sharding, make_mesh
from demiurge_tpu.dist.halo import exchange_halo, pressure_solve_sharded
from demiurge_tpu.model import CoupledConfig, CoupledState, coupled_step, init_coupled
from demiurge_tpu.ops import ocean
from demiurge_tpu.ops.noise import NoiseParams, fbm


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def terrain(g, seed=7):
    return fbm(g, NoiseParams(octaves=4, scale=2.0, min=-2.0, max=3.0,
                              seed=seed))


@requires_8
def test_halo_exchange_matches_global_shift():
    """A padded block's rings must equal the wrap-topology neighbors."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from demiurge_tpu.core.topology import shift

    g = Grid(64, 32)
    mesh = make_mesh(8, shape=(2, 4))
    f = terrain(g)
    k = 2

    def body(b):
        return exchange_halo(b, k, g, mesh)

    padded = shard_map(body, mesh=mesh, in_specs=P("y", "x"),
                       out_specs=P("y", "x"))(f)
    # padded has shape (H + 2k*ny, W + 2k*nx); check one block explicitly
    pn = np.asarray(padded)
    bh, bw = 16, 16
    blk = pn[:bh + 2 * k, :bw + 2 * k]  # block (0,0) with halos
    fn = np.asarray(f)
    # interior
    np.testing.assert_array_equal(blk[k:-k, k:-k], fn[:bh, :bw])
    # west halo: dateline wrap (columns W-k..W)
    np.testing.assert_array_equal(blk[k:-k, :k], fn[:bh, -k:])
    # north halo: rows bh..bh+k
    np.testing.assert_array_equal(blk[-k:, k:-k], fn[bh:bh + k, :bw])
    # south halo: pole reflection = rows k-1..0 flipped, antipodal columns
    want = np.asarray(shift(f, 0, -1, g))[0, :bw]  # row 0 looking south
    np.testing.assert_array_equal(blk[k - 1, k:-k], want)


@requires_8
def test_sharded_pressure_solve_matches_single_device():
    g = Grid(64, 32)
    h = terrain(g)
    cfg = ocean.OceanConfig(jacobi_iters=64, diffusion_iters=5)
    u, v = ocean.init_ocean(g)
    for _ in range(2):
        u, v = ocean.advect(u, v, h, g, cfg)
    d = ocean.divergence(u, v, h, g, cfg)

    want = ocean.pressure_solve(d, h, g, cfg)

    mesh = make_mesh(8, shape=(2, 4))
    got = pressure_solve_sharded(d, h, g, mesh, iters=64, k=8)
    # different fusion order -> f32 reassociation noise; compare relative to
    # the field magnitude (pressures are ~1e5 from the area*pf scaling)
    scale = float(np.abs(np.asarray(want)).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale,
                               atol=2e-5)


@requires_8
def test_coupled_step_gspmd_matches_single_device():
    """The full coupled model step under 2D sharding must equal the
    single-device result (the framework's core distributed guarantee)."""
    g = Grid(64, 32)
    cfg = CoupledConfig(
        climate_substeps=2,
        ocean=ocean.OceanConfig(jacobi_iters=16, diffusion_iters=4),
    )
    state = init_coupled(terrain(g), g)

    ref = coupled_step(state, g, cfg)

    mesh = make_mesh(8, shape=(2, 4))
    s = field_sharding(mesh)
    sharded = CoupledState(
        height=jax.device_put(state.height, s),
        uplift=jax.device_put(state.uplift, s),
        sel=jax.device_put(state.sel, s),
        u=jax.device_put(state.u, s),
        v=jax.device_put(state.v, s),
        temperature=jax.device_put(state.temperature, s),
        t_index=state.t_index,
    )
    out = coupled_step(sharded, g, cfg)
    assert len(out.height.sharding.device_set) == 8

    for name in ["height", "u", "v", "temperature"]:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=2e-5, atol=1e-5, err_msg=name)


@requires_8
def test_sharded_diffusion_matches_single_device():
    from demiurge_tpu.ops.ocean import OceanConfig

    g = Grid(256, 128)
    mesh = make_mesh(8, shape=(2, 4))
    h = terrain(g)
    oc = OceanConfig(jacobi_iters=8, diffusion_iters=20)
    u0, v0 = ocean.init_ocean(g)
    u1, v1 = ocean.advect(u0, v0, h, g, oc)
    du, dv = ocean.diffusion(u1, v1, h, g, oc)
    s = field_sharding(mesh)
    du2, dv2 = ocean.diffusion(jax.device_put(u1, s), jax.device_put(v1, s),
                               jax.device_put(h, s), g, oc, mesh=mesh)
    np.testing.assert_allclose(np.asarray(du), np.asarray(du2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv2),
                               rtol=1e-5, atol=1e-6)


@requires_8
def test_sharded_flow_matches_single_device():
    """Sharded flow accumulation reaches the stencil fixpoint: the
    visited/-1 mask exactly, the accumulation allclose (the two-level
    path's chain sums reassociate f32 additions)."""
    from demiurge_tpu.ops import flow

    g = Grid(256, 128)
    mesh = make_mesh(8, shape=(2, 4))
    h = terrain(g)
    sel = jnp.ones(g.shape, jnp.float32)
    f0 = np.asarray(flow.flow_filter_device(h, sel, g))
    s = field_sharding(mesh)
    f1 = np.asarray(flow.flow_filter_device(jax.device_put(h, s),
                                            jax.device_put(sel, s), g,
                                            mesh=mesh))
    np.testing.assert_array_equal(f0 < 0, f1 < 0)
    np.testing.assert_allclose(f1, f0, rtol=1e-5, atol=1e-6)


@requires_8
def test_coupled_step_mesh_arg_matches_single_device():
    """coupled_step(mesh=...) — the amortized explicit-halo production
    path — matches the single-device step."""
    from demiurge_tpu.ops.ocean import OceanConfig

    g = Grid(256, 128)
    mesh = make_mesh(8, shape=(2, 4))
    h = terrain(g)
    cfg = CoupledConfig(climate_substeps=2,
                        ocean=OceanConfig(jacobi_iters=16, diffusion_iters=5))
    st = init_coupled(h, g)
    o0 = coupled_step(st, g, cfg)
    s = field_sharding(mesh)
    sts = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s) if getattr(x, "ndim", 0) == 2 else x,
        st)
    o1 = coupled_step(sts, g, cfg, mesh=mesh)
    # height/temperature: allclose, not bitwise — the round-5 mesh paths
    # reassociate f32 sums (two-level flow chain sums; summed-Laplacian
    # climate, same form as the single-chip Pallas kernel)
    np.testing.assert_allclose(np.asarray(o0.height),
                               np.asarray(o1.height), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o0.temperature),
                               np.asarray(o1.temperature),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o0.u), np.asarray(o1.u),
                               rtol=1e-5, atol=1e-6)


def test_single_core_pallas_gate_respects_device_count(monkeypatch):
    """Every Pallas fast path must be unreachable when device_count() > 1
    (VERDICT r4 weak #3: an un-shard_mapped pallas_call inside a jitted
    multi-chip step forces replication or fails to lower)."""
    from demiurge_tpu.core import platform

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 8)
    assert platform.single_core_pallas() is False
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    assert platform.single_core_pallas() is True
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert platform.single_core_pallas() is False


def test_no_bare_backend_gates_in_package():
    """Grep the package: the only place allowed to test
    default_backend()=="tpu" is core/platform.py — ops must use the shared
    single_core_pallas() predicate so the device-count guard can't be
    forgotten again."""
    import pathlib

    import demiurge_tpu

    pkg = pathlib.Path(demiurge_tpu.__file__).parent
    offenders = []
    for py in pkg.rglob("*.py"):
        if py.name == "platform.py" and py.parent.name == "core":
            continue
        text = py.read_text()
        if 'default_backend() == "tpu"' in text \
                or "default_backend() == 'tpu'" in text:
            offenders.append(str(py.relative_to(pkg)))
    assert not offenders, offenders


@requires_8
def test_sharded_twolevel_flow_matches_stencil():
    """The two-level distributed flow solve (all_to_all row regroup +
    contracted inter-band graph, dist/flowdist.py) must reach the
    flow_solve_stencil fixpoint: A allclose (chain sums reassociate f32),
    vis exactly."""
    from demiurge_tpu.dist.flowdist import (
        flow_sharded_twolevel_supported, flow_solve_sharded_twolevel)
    from demiurge_tpu.ops import flow as flow_ops
    from demiurge_tpu.ops.blur import blur

    g = Grid(256, 128)
    mesh = make_mesh(8, shape=(2, 4))
    assert flow_sharded_twolevel_supported(g, mesh)
    h = terrain(g)
    sel = jnp.ones(g.shape, jnp.float32)
    hb = blur(h, g, 0.5)
    code = flow_ops.flow_directions(hb, sel, g)
    _, mouth, _ = flow_ops.incoming_mask(code, g)
    area = flow_ops.cell_area_lower_edge(g)
    A0, vis0, _ = flow_ops.flow_solve_stencil(code, area, mouth, g)
    s = field_sharding(mesh)
    A1, vis1 = flow_solve_sharded_twolevel(
        jax.device_put(code, s), jax.device_put(area, s),
        jax.device_put(mouth, s), g, mesh)
    np.testing.assert_allclose(np.asarray(A0), np.asarray(A1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(vis0), np.asarray(vis1))


def test_twolevel_singlechip_matches_stencil():
    """Single-chip two-level A solve (pallas_kernels/flow2.py, interpret
    mode) matches flow_solve_stencil across band sizes."""
    from demiurge_tpu.ops import flow as flow_ops
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.pallas_kernels.flow2 import flow_solve_twolevel

    g = Grid(128, 64)
    h = terrain(g)
    sel = jnp.ones(g.shape, jnp.float32)
    hb = blur(h, g, 0.5)
    code = flow_ops.flow_directions(hb, sel, g)
    _, mouth, _ = flow_ops.incoming_mask(code, g)
    area = flow_ops.cell_area_lower_edge(g)
    A0, _, _ = flow_ops.flow_solve_stencil(code, area, mouth, g)
    for band in (16, 32, 64):
        A1 = flow_solve_twolevel(code, area, mouth, g, band=band,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(A0), np.asarray(A1),
                                   rtol=1e-5, atol=1e-7)


@requires_8
def test_sharded_climate_matches_single_device():
    """Amortized sharded climate (K substeps per one row-halo exchange,
    dist/climate.py) matches the single-chip Pallas kernel's numerics and
    stays allclose to the per-component XLA scan."""
    from demiurge_tpu.dist.climate import (climate_sharded_supported,
                                           climate_step_sharded)
    from demiurge_tpu.ops import temperature
    from demiurge_tpu.pallas_kernels.climate import climate_step_pallas

    g = Grid(256, 128)
    mesh = make_mesh(8, shape=(2, 4))
    assert climate_sharded_supported(g, mesh, 10)
    h = terrain(g)
    T0 = temperature.init_temperature(g) + terrain(g, seed=11)
    T_xla, i_x = temperature.temperature_step(T0, h, 3.0, g, substeps=10)
    T_pal, _ = climate_step_pallas(T0, h, 3.0, g, substeps=10,
                                   interpret=True)
    s = field_sharding(mesh)
    T_sh, i_s = climate_step_sharded(jax.device_put(T0, s),
                                     jax.device_put(h, s), 3.0, g, mesh,
                                     substeps=10)
    np.testing.assert_allclose(np.asarray(T_sh), np.asarray(T_pal),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T_sh), np.asarray(T_xla),
                               rtol=1e-5, atol=1e-4)
    assert float(i_s) == float(i_x)


@requires_8
def test_sharded_advect_matches_single_device():
    """Amortized sharded tap sampling (one halo exchange, dist/advect.py)
    matches the single-device XLA tap loop (same taps and weights; XLA
    fuses the two programs differently, so 1-ulp FMA noise remains)."""
    from demiurge_tpu.ops import ocean

    g = Grid(256, 128)
    mesh = make_mesh(8, shape=(2, 4))
    h = terrain(g)
    cfg = ocean.OceanConfig()
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, g.shape, jnp.float32) * 0.3
    v = jax.random.normal(jax.random.PRNGKey(1), g.shape, jnp.float32) * 0.3
    land = h > 0
    u = jnp.where(land, 0.0, u)
    v = jnp.where(land, 0.0, v)
    u0, v0 = ocean.advect(u, v, h, g, cfg)
    s = field_sharding(mesh)
    u1, v1 = ocean.advect(jax.device_put(u, s), jax.device_put(v, s),
                          jax.device_put(h, s), g, cfg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=1e-4, atol=1e-6)
