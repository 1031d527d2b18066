"""Sweep (band, K) configs of the banded flow solver on the real chip.

Usage: python tools/flow_tune.py [W H]
"""

import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from demiurge_tpu import Grid
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.pallas_kernels.flow import (flow_solve_fused,
                                                  flow_solve_pallas)

    grid = Grid(W, H)
    h = fbm(grid, NoiseParams(mode="default", octaves=6, scale=2.0,
                              min=-2.0, max=3.0, seed=7))
    sel = jnp.ones(grid.shape, jnp.float32)
    hb = blur(h, grid, 0.5)
    code = jax.jit(flow.flow_directions, static_argnames=("grid",))(
        hb, sel, grid)
    _, mouth, _ = jax.jit(flow.incoming_mask, static_argnames=("grid",))(
        code, grid)
    area = flow.cell_area_lower_edge(grid)
    code, mouth, area = jax.block_until_ready((code, mouth, area))
    print("prepasses done", flush=True)

    ref = None
    configs = [("fused", 64, 16), ("fused", 64, 32), ("fused", 32, 16),
               ("fused", 128, 16)]
    for kind, band, k in configs:
        if H % band or k > band:
            continue
        if True:
            try:
                solver = (flow_solve_fused if kind == "fused"
                          else flow_solve_pallas)
                fn = jax.jit(lambda c, a, m, s=solver, k=k, band=band:
                             s(c, a, m, grid, k=k, band=band))
                probe = jax.jit(lambda A: A.ravel()[0])
                A, vis = fn(code, area, mouth)
                float(probe(A))  # readback = real remote sync
                t0 = time.perf_counter()
                for _ in range(5):
                    A, vis = fn(code, area, mouth)
                float(probe(A))
                dt = (time.perf_counter() - t0) / 5 * 1e3
                if ref is None:
                    ref = A
                ok = bool(jnp.allclose(A, ref, rtol=1e-5))
                print(f"{kind:6s} band={band:4d} k={k:4d}  {dt:8.2f} ms  match={ok}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{kind:6s} band={band:4d} k={k:4d}  FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
