"""Measure pointer-doubling accumulate vs banded relaxation on TPU.

Usage: python tools/flow_doubling.py [W H]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5, warmup=1):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:9.2f} ms")
    return dt


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from demiurge_tpu import Grid
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from attic.flow_deadends import flow_solve_fused

    grid = Grid(W, H)
    h = fbm(grid, NoiseParams(mode="default", octaves=6, scale=2.0,
                              min=-2.0, max=3.0, seed=7))
    sel = jnp.ones(grid.shape, jnp.float32)
    hb = jax.jit(lambda h: blur(h, grid, 0.5))(h)
    code = jax.jit(flow.flow_directions, static_argnames=("grid",))(
        hb, sel, grid)
    _, mouth, _ = jax.jit(flow.incoming_mask, static_argnames=("grid",))(
        code, grid)
    area = flow.cell_area_lower_edge(grid)

    parent = jax.jit(flow.parent_pointers, static_argnames=("grid",))(
        code, grid)
    nr = 11  # covers paths up to 2^11 = 2048

    timeit("parent_pointers", jax.jit(
        lambda c: flow.parent_pointers(c, grid)), code)
    timeit(f"accumulate (doubling, {nr} rounds)",
           jax.jit(lambda p, a: flow.accumulate(p, a, nr)),
           parent, area.reshape(-1))
    timeit(f"resolve_roots ({nr} rounds)",
           jax.jit(lambda p: flow.resolve_roots(p, nr)), parent)

    # combined: accumulate + vis via root-mouth lookup
    @jax.jit
    def both(p, a, m):
        acc = flow.accumulate(p, a, nr)
        root = flow.resolve_roots(p, nr)
        vis = m.reshape(-1)[root]
        return acc, vis

    timeit("accumulate + roots + vis", both, parent, area.reshape(-1), mouth)

    for mr in (4, 8, 16, 32):
        timeit(f"flow_solve_fused max_rounds={mr}",
               jax.jit(lambda c, a, m: flow_solve_fused(
                   c, a, m, grid, max_rounds=mr)), code, area, mouth)
    timeit("flow_solve_fused (to convergence)",
           jax.jit(lambda c, a, m: flow_solve_fused(c, a, m, grid)),
           code, area, mouth)


if __name__ == "__main__":
    main()
