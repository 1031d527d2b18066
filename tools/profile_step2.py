"""Dispatch-floor-free per-component profile of the coupled step.

tools/profile_step.py times one dispatch per measurement, so the remote
tunnel's per-call floor (~8-13 ms) swamps sub-ms components.  This variant
scans each component N times INSIDE one jit (inputs perturbed by the loop
carry so nothing hoists), syncs once, and divides — the dispatch cost
amortizes to noise.  Usage:

    python tools/profile_step2.py [W H [N]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp


def timeit_scan(name, fn, args, n=10, reps=3):
    """fn(*args) -> pytree; scanned n times with a carry-perturbed first arg."""

    def body(carry, _):
        c, a = carry
        out = fn(jax.tree_util.tree_map(lambda x: x * (1 + 1e-30 * c), a[0]),
                 *a[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        return (c + leaf.ravel()[0] * 1e-30, a), None

    run = jax.jit(lambda a: jax.lax.scan(body, (jnp.float32(0.0), a), None,
                                         length=n)[0][0])
    out = run(args)
    float(out)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(args)
        float(out)
        best = min(best, (time.perf_counter() - t0))
    dt = best / n * 1e3
    print(f"{name:38s} {dt:9.3f} ms")
    return dt


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from demiurge_tpu import Grid
    from demiurge_tpu.model import CoupledConfig, coupled_step, init_coupled
    from demiurge_tpu.ops import erosion, flow, ocean, temperature
    from demiurge_tpu.ops.blur import blur
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
    oc = cfg.ocean

    total = timeit_scan(
        "coupled_step (total)",
        lambda s: coupled_step(s, grid, cfg), (state,), n=N)

    timeit_scan("climate x10",
                lambda T_, h_, t_: temperature.temperature_step(
                    T_, h_, t_, grid, substeps=cfg.climate_substeps),
                (T, hgt, state.t_index), n=N)

    timeit_scan("ocean.advect",
                lambda u_, v_, h_: ocean.advect(u_, v_, h_, grid, oc),
                (u, v, hgt), n=N)
    timeit_scan("ocean.diffusion x50",
                lambda u_, v_, h_: ocean.diffusion(u_, v_, h_, grid, oc),
                (u, v, hgt), n=N)
    div = jax.jit(lambda: ocean.divergence(u, v, hgt, grid, oc))()
    timeit_scan("ocean.divergence",
                lambda u_, v_, h_: ocean.divergence(u_, v_, h_, grid, oc),
                (u, v, hgt), n=N)
    timeit_scan("ocean.pressure x200",
                lambda d_, h_: ocean.pressure_solve(d_, h_, grid, oc),
                (div, hgt), n=N)
    p = jax.jit(lambda: ocean.pressure_solve(div, hgt, grid, oc))()
    timeit_scan("ocean.project",
                lambda u_, v_, p_, h_: ocean.project(u_, v_, p_, h_, grid, oc),
                (u, v, p, hgt), n=N)

    timeit_scan("flow.blur",
                lambda h_: blur(h_, grid, cfg.flow_preblur), (hgt,), n=N)
    hb = jax.jit(lambda: blur(hgt, grid, cfg.flow_preblur))()
    timeit_scan("flow.directions",
                lambda h_, s_: flow.flow_directions(h_, s_, grid),
                (hb, state.sel), n=N)
    code = jax.jit(lambda: flow.flow_directions(hb, state.sel, grid))()
    timeit_scan("flow.incoming_mask",
                lambda c_: flow.incoming_mask(c_, grid), (code,), n=N)

    timeit_scan("flow_filter_device (all)",
                lambda h_, s_: flow.flow_filter_device(
                    h_, s_, grid, exponent=cfg.flow_exponent,
                    preblur=cfg.flow_preblur), (hgt, state.sel), n=N)
    fm = jax.jit(lambda: flow.flow_filter_device(
        hgt, state.sel, grid, exponent=cfg.flow_exponent,
        preblur=cfg.flow_preblur))()
    timeit_scan("erosion_pass",
                lambda h_, f_, u_: erosion.erosion_pass(
                    h_, f_, u_, grid, cfg.erosion_factor,
                    cfg.erosion_slope_exponent), (hgt, fm, state.uplift), n=N)


if __name__ == "__main__":
    main()
