"""Per-component wall-clock profile of the coupled step on the real chip.

NOTE: one timed dispatch per row — on the shared axon tunnel every call
pays a fixed ~24 ms dispatch+readback round trip, which swamps sub-ms
components.  Prefer tools/profile_step3.py (slope-based: the fixed cost
cancels between two scan lengths); this script remains for quick
eyeballing.  Usage:

    python tools/profile_step.py [W H]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _sync(out):
    # a scalar readback is the only reliable remote-execution barrier
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])


def timeit(name, fn, *args, iters=3, warmup=1):
    fn_j = jax.jit(fn)
    out = None
    for _ in range(warmup):
        out = fn_j(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:9.2f} ms")
    return dt


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from demiurge_tpu import Grid
    from demiurge_tpu.model import CoupledConfig, coupled_step, init_coupled
    from demiurge_tpu.ops import erosion, flow, ocean, temperature
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.ops.ocean import OceanConfig

    grid = Grid(W, H)
    cfg = CoupledConfig(
        climate_substeps=10,
        ocean=OceanConfig(jacobi_iters=200, diffusion_iters=50),
    )
    h = fbm(grid, NoiseParams(mode="default", octaves=6, scale=2.0,
                              min=-2.0, max=3.0, seed=7))
    state = init_coupled(h, grid)
    state = jax.block_until_ready(
        jax.jit(lambda s: coupled_step(s, grid, cfg))(state))

    hgt, u, v, T = state.height, state.u, state.v, state.temperature

    total = timeit("coupled_step (total)",
                   lambda s: coupled_step(s, grid, cfg), state)

    timeit("climate x10",
           lambda T_, h_, t_: temperature.temperature_step(
               T_, h_, t_, grid, substeps=cfg.climate_substeps),
           T, hgt, state.t_index)

    oc = cfg.ocean
    timeit("ocean.advect",
           lambda u_, v_, h_: ocean.advect(u_, v_, h_, grid, oc), u, v, hgt)
    timeit("ocean.diffusion x50",
           lambda u_, v_, h_: ocean.diffusion(u_, v_, h_, grid, oc),
           u, v, hgt)
    div = jax.jit(lambda u_, v_, h_: ocean.divergence(u_, v_, h_, grid, oc))(
        u, v, hgt)
    timeit("ocean.divergence",
           lambda u_, v_, h_: ocean.divergence(u_, v_, h_, grid, oc),
           u, v, hgt)
    timeit("ocean.pressure x200 (XLA)",
           lambda d_, h_: ocean.pressure_solve(d_, h_, grid, oc), div, hgt)
    try:
        from demiurge_tpu.pallas_kernels.jacobi import pressure_solve_pallas
        timeit("ocean.pressure x200 (pallas)",
               lambda d_, h_: pressure_solve_pallas(d_, h_, grid,
                                                    iters=oc.jacobi_iters),
               div, hgt)
    except Exception as e:  # noqa: BLE001
        print("pallas pressure failed:", repr(e))
    p = jax.jit(lambda d_, h_: ocean.pressure_solve(d_, h_, grid, oc))(
        div, hgt)
    timeit("ocean.project",
           lambda u_, v_, p_, h_: ocean.project(u_, v_, p_, h_, grid, oc),
           u, v, p, hgt)

    timeit("flow_filter_device",
           lambda h_, s_: flow.flow_filter_device(
               h_, s_, grid, exponent=cfg.flow_exponent,
               preblur=cfg.flow_preblur), hgt, state.sel)
    fm = jax.jit(lambda h_, s_: flow.flow_filter_device(
        h_, s_, grid, exponent=cfg.flow_exponent,
        preblur=cfg.flow_preblur))(hgt, state.sel)
    timeit("erosion_pass",
           lambda h_, f_, u_: erosion.erosion_pass(
               h_, f_, u_, grid, cfg.erosion_factor,
               cfg.erosion_slope_exponent), hgt, fm, state.uplift)

    print(f"{'':34s} {'-----':>9s}")
    print(f"{'(sum of parts vs total above)':34s}")


if __name__ == "__main__":
    main()
