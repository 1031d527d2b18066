"""Tune (k, band) of the banded flow kernel on the real chip.

Scans flow_solve_pallas N times inside one jit per configuration (input
perturbed per iteration so nothing hoists), so the remote dispatch floor
amortizes away.  Usage:

    python tools/flow_tune.py [W H [N]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from demiurge_tpu import Grid
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.pallas_kernels.flow import flow_solve_pallas

    grid = Grid(W, H)
    h = fbm(grid, NoiseParams(mode="default", octaves=6, scale=2.0,
                              min=-2.0, max=3.0, seed=7))
    sel = jnp.ones(grid.shape, jnp.float32)
    hb = jax.jit(lambda: blur(h, grid, 0.5))()
    code = jax.jit(lambda: flow.flow_directions(hb, sel, grid))()
    _, mouth, _ = jax.jit(lambda: flow.incoming_mask(code, grid))()
    area = flow.cell_area_lower_edge(grid)
    code, mouth, area = jax.block_until_ready((code, mouth, area))

    def timeit(k, band):
        def body(carry, _):
            c, ar = carry
            acc, vis = flow_solve_pallas(code, ar * (1 + 1e-30 * c), mouth,
                                         grid, k=k, band=band)
            return (c + acc.ravel()[0] * 1e-30, ar), None

        run = jax.jit(lambda ar: jax.lax.scan(
            body, (jnp.float32(0.0), ar), None, length=N)[0][0])
        float(run(area))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(area))
            best = min(best, time.perf_counter() - t0)
        dt = best / N * 1e3
        print(f"k={k:3d} band={band:4d}  {dt:8.2f} ms", flush=True)
        return dt

    for band in (64, 128):
        for k in (8, 16, 24, 32):
            if k <= band:
                try:
                    timeit(k, band)
                except Exception as e:  # noqa: BLE001
                    print(f"k={k} band={band} failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
