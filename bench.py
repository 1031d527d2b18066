"""Benchmark: grid-points/s per chip on the coupled erosion+ocean+climate step.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "grid-points/s", "vs_baseline": N}

The reference (Kuhlwein/Demiurge) publishes no benchmark numbers
(BASELINE.md); the operative baseline is the HBM roofline of the same op
sequence on this chip.  vs_baseline = achieved / roofline, where the
roofline is the minimum HBM traffic of the step's pass sequence divided by
the chip's HBM bandwidth (v5e: ~819 GB/s), i.e. 1.0 would mean every pass
runs exactly at memory speed with perfect fusion.
"""

import json
import os
import sys
import time


def roofline_bytes_per_point(cfg):
    """Minimum HBM traffic per grid point per coupled step, in bytes.

    Model: every iterative sweep must read+write its state once per
    iteration from HBM (stencil neighbor reuse is free in VMEM); float32.
    """
    B = 4
    # climate: per substep read T + terrain, write T
    climate = cfg.climate_substeps * 3 * B
    # ocean advect: read u,v,terrain; write u,v
    advect = 5 * B
    # ocean diffusion: per sweep read u,v(,terrain cached), write u,v
    diff = cfg.ocean.diffusion_iters * 4 * B
    # divergence: read u,v,terrain write div
    div = 4 * B
    # jacobi: per sweep read p, div, write p (terrain mask cached)
    jac = cfg.ocean.jacobi_iters * 3 * B
    # project: read u,v,p,terrain, write u,v
    proj = 6 * B
    # flow: blur (~4 passes r+w) + direction (r h,sel w code) + mask +
    # parent + ~log2(N) scatter rounds each touching A, ptr, alive ~ 3 arrays r+w
    import math

    nrounds = 21  # log2(2048*1024)
    flowb = (4 * 2 + 3 + 3 + 2 + nrounds * 6) * B
    # erosion pass: read h, flow, uplift, write h
    eros = 4 * B
    return climate + advect + diff + div + jac + proj + flowb + eros


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    import jax
    import jax.numpy as jnp

    from demiurge_tpu import Grid
    from demiurge_tpu.model import CoupledConfig, coupled_step, init_coupled
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.ops.ocean import OceanConfig

    W, H = 2048, 1024
    grid = Grid(W, H)
    cfg = CoupledConfig(
        climate_substeps=10,
        ocean=OceanConfig(jacobi_iters=200, diffusion_iters=50),
    )

    h = fbm(grid, NoiseParams(mode="default", octaves=6, scale=2.0,
                              min=-2.0, max=3.0, seed=7))
    state = init_coupled(h, grid)

    n_iters = 40

    @jax.jit
    def run_n(s):
        # the measured loop runs on device (lax.scan): a production driver
        # advances many steps per dispatch, so the remote tunnel's fixed
        # dispatch+readback round trip (~24 ms per call measured) is not
        # part of step throughput
        def body(s_, _):
            return coupled_step(s_, grid, cfg), None

        return jax.lax.scan(body, s, None, length=n_iters)[0]

    @jax.jit
    def probe(s):
        # one scalar depending on every prognostic field: forces full
        # execution through the async device tunnel (block_until_ready does
        # not synchronize remote execution; a readback does)
        return (s.height.ravel()[0] + s.u.ravel()[0] + s.v.ravel()[0]
                + s.temperature.ravel()[0])

    state = run_n(state)           # compile + warm
    float(probe(state))

    # best-of-10 spread over ~2 minutes: the shared chip's throughput
    # drifts with co-tenancy on ~minute scales (measured swings of 2x
    # between whole runs), so back-to-back windows can all land in one
    # slow period; spacing the windows out makes the best one a much
    # better estimate of the chip's uncontended rate
    best = float("inf")
    for i in range(10):
        if i:
            time.sleep(12)
        t0 = time.perf_counter()
        state = run_n(state)
        float(probe(state))
        best = min(best, time.perf_counter() - t0)
    dt = best / n_iters

    gps = W * H / dt  # grid-points per second (coupled steps)

    hbm_bw = 819e9  # bytes/s, TPU v5e
    bpp = roofline_bytes_per_point(cfg)
    roofline_gps = hbm_bw / bpp
    print(json.dumps({
        "metric": "coupled erosion+ocean+climate step, 2048x1024, 1 chip",
        "value": round(gps, 1),
        "unit": "grid-points/s",
        "vs_baseline": round(gps / roofline_gps, 4),
    }))


if __name__ == "__main__":
    main()
