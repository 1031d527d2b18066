"""Tune the flow-accumulation kernels on the real chip (slope timing).

Compares flow_solve_pallas (banded, per-round launches) against
flow_solve_fused (whole solve in one launch) and flow_solve_wave across
(k, band), timed as the (N2-N1) slope of in-jit scans so the tunnel's
fixed dispatch+readback round trip cancels.  Runs at a bench-evolved
state (longer rivers than the initial noise).  Usage:

    python tools/flow_tune.py [W H]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp

N1, N2 = 2, 8


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from demiurge_tpu import Grid
    from demiurge_tpu.model import CoupledConfig, coupled_step, init_coupled
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.ops.ocean import OceanConfig
    from attic.flow_deadends import flow_solve_fused, flow_solve_wave
    from demiurge_tpu.pallas_kernels.flow import flow_solve_pallas

    grid = Grid(W, H)
    h = fbm(grid, NoiseParams(mode="default", octaves=6, scale=2.0,
                              min=-2.0, max=3.0, seed=7))
    cfg = CoupledConfig(climate_substeps=10,
                        ocean=OceanConfig(jacobi_iters=200,
                                          diffusion_iters=50))
    state = init_coupled(h, grid)
    step10 = jax.jit(lambda s: jax.lax.scan(
        lambda s_, _: (coupled_step(s_, grid, cfg), None), s, None,
        length=10)[0])
    state = jax.block_until_ready(step10(state))
    h = state.height

    sel = jnp.ones(grid.shape, jnp.float32)
    hb = jax.jit(lambda: blur(h, grid, 0.5))()
    code = jax.jit(lambda: flow.flow_directions(hb, sel, grid))()
    _, mouth, _ = jax.jit(lambda: flow.incoming_mask(code, grid))()
    area = flow.cell_area_lower_edge(grid)
    code, mouth, area = jax.block_until_ready((code, mouth, area))

    ref = {}

    def timeit(name, solve):
        def body(carry, _):
            c, ar = carry
            acc, vis = solve(ar * (1 + 1e-30 * c))
            return (c + acc.ravel()[0] * 1e-30, ar), None

        def mk(n):
            return jax.jit(lambda ar: jax.lax.scan(
                body, (jnp.float32(0.0), ar), None, length=n)[0][0])

        try:
            r1, r2 = mk(N1), mk(N2)
            float(r1(area))
            float(r2(area))
            b1 = b2 = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(r1(area))
                b1 = min(b1, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(r2(area))
                b2 = min(b2, time.perf_counter() - t0)
            dt = (b2 - b1) / (N2 - N1) * 1e3
            # correctness spot check
            acc, vis = jax.jit(lambda: solve(area))()
            key = (float(jnp.sum(acc)), int(jnp.sum(vis)))
            ref.setdefault("key", key)
            ok = (abs(key[0] - ref["key"][0]) < 1e-2 * abs(ref["key"][0])
                  and key[1] == ref["key"][1])
            print(f"{name:34s} {dt:8.2f} ms  {'ok' if ok else 'MISMATCH ' + str(key)}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} failed: {e!r}", flush=True)

    def split(ar, k, band):
        accA, _ = flow_solve_pallas(code, ar, mouth, grid, k=k, band=band,
                                    mode="A")
        _, vis = flow_solve_pallas(code, ar, mouth, grid, k=k, band=band,
                                   mode="vis")
        return accA, vis

    for k, band in ((4, 64), (8, 64), (16, 64), (8, 128), (16, 128)):
        if k <= band and H % band == 0:
            timeit(f"banded k={k} band={band}",
                   lambda ar, k=k, band=band: flow_solve_pallas(
                       code, ar, mouth, grid, k=k, band=band))
    for k, band in ((8, 64), (16, 64), (8, 128), (16, 128)):
        if k <= band and H % band == 0:
            timeit(f"split  k={k} band={band}",
                   lambda ar, k=k, band=band: split(ar, k, band))
    for k, band in ((16, 128),):
        if k <= band and H % band == 0:
            timeit(f"fused  k={k} band={band}",
                   lambda ar, k=k, band=band: flow_solve_fused(
                       code, ar, mouth, grid, k=k, band=band))


if __name__ == "__main__":
    main()
