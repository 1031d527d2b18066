"""Slope-based per-component profile: immune to the tunnel's fixed cost.

The axon tunnel charges a ~24 ms fixed dispatch+readback round trip per
call; any single-call timing is swamped by it.  This profiler times each
component scanned N1 and N2 times inside one jit and reports
(t2-t1)/(N2-N1) — the true marginal per-iteration device time.

    python tools/profile_step3.py [W H]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp

N1, N2 = 4, 24


def _mk(fn, args, n):
    def body(carry, _):
        c, a = carry
        out = fn(jax.tree_util.tree_map(lambda x: x * (1 + 1e-30 * c), a[0]),
                 *a[1:])
        # consume one scalar from EVERY output leaf: anything not fed back
        # into the carry is dead code XLA deletes from the measured loop
        # (with only the first leaf, "coupled_step (total)" measured just
        # the height-producing half — the ocean/climate solves vanished)
        acc = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + leaf.ravel()[0].astype(jnp.float32)
        return (c + acc * 1e-30, a), None

    return jax.jit(lambda a: jax.lax.scan(body, (jnp.float32(0.0), a), None,
                                          length=n)[0][0])


def timeit_slope(name, fn, args, reps=4):
    r1 = _mk(fn, args, N1)
    r2 = _mk(fn, args, N2)
    float(r1(args))
    float(r2(args))
    b1 = b2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(args))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(r2(args))
        b2 = min(b2, time.perf_counter() - t0)
    dt = (b2 - b1) / (N2 - N1) * 1e3
    fixed = b1 * 1e3 - N1 * dt
    print(f"{name:38s} {dt:9.3f} ms   (fixed {fixed:6.1f})", flush=True)
    return dt


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

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
    # evolve to the bench's measurement regime (warm + a few steps)
    step10 = jax.jit(lambda s: jax.lax.scan(
        lambda s_, _: (coupled_step(s_, grid, cfg), None), s, None,
        length=10)[0])
    state = jax.block_until_ready(step10(state))

    hgt, u, v, T = state.height, state.u, state.v, state.temperature
    oc = cfg.ocean

    timeit_slope("coupled_step (total)",
                 lambda s: coupled_step(s, grid, cfg), (state,))

    timeit_slope("climate x10",
                 lambda T_, h_, t_: temperature.temperature_step(
                     T_, h_, t_, grid, substeps=cfg.climate_substeps),
                 (T, hgt, state.t_index))

    timeit_slope("ocean.advect",
                 lambda u_, v_, h_: ocean.advect(u_, v_, h_, grid, oc),
                 (u, v, hgt))
    timeit_slope("ocean.diffusion x50",
                 lambda u_, v_, h_: ocean.diffusion(u_, v_, h_, grid, oc),
                 (u, v, hgt))
    div = jax.jit(lambda: ocean.divergence(u, v, hgt, grid, oc))()
    timeit_slope("ocean.divergence",
                 lambda u_, v_, h_: ocean.divergence(u_, v_, h_, grid, oc),
                 (u, v, hgt))
    timeit_slope("ocean.pressure x200",
                 lambda d_, h_: ocean.pressure_solve(d_, h_, grid, oc),
                 (div, hgt))
    p = jax.jit(lambda: ocean.pressure_solve(div, hgt, grid, oc))()
    timeit_slope("ocean.project",
                 lambda u_, v_, p_, h_: ocean.project(u_, v_, p_, h_,
                                                      grid, oc),
                 (u, v, p, hgt))

    timeit_slope("flow.blur",
                 lambda h_: blur(h_, grid, cfg.flow_preblur), (hgt,))
    hb = jax.jit(lambda: blur(hgt, grid, cfg.flow_preblur))()
    timeit_slope("flow.directions",
                 lambda h_, s_: flow.flow_directions(h_, s_, grid),
                 (hb, state.sel))
    code = jax.jit(lambda: flow.flow_directions(hb, state.sel, grid))()
    timeit_slope("flow.incoming_mask",
                 lambda c_: flow.incoming_mask(c_, grid), (code,))

    timeit_slope("flow_filter_device (all)",
                 lambda h_, s_: flow.flow_filter_device(
                     h_, s_, grid, exponent=cfg.flow_exponent,
                     preblur=cfg.flow_preblur), (hgt, state.sel))
    fm = jax.jit(lambda: flow.flow_filter_device(
        hgt, state.sel, grid, exponent=cfg.flow_exponent,
        preblur=cfg.flow_preblur))()
    timeit_slope("erosion_pass",
                 lambda h_, f_, u_: erosion.erosion_pass(
                     h_, f_, u_, grid, cfg.erosion_factor,
                     cfg.erosion_slope_exponent), (hgt, fm, state.uplift))


if __name__ == "__main__":
    main()
