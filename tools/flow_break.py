"""Break down flow_filter_device cost: preprocessing vs solve, and compare
solver variants (XLA stencil, banded pallas, fused pallas).

Usage: python tools/flow_break.py [W H]
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
    print(f"{name:40s} {dt:9.2f} ms")
    return dt


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from demiurge_tpu import Grid
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from attic.flow_deadends import flow_solve_fused
    from demiurge_tpu.pallas_kernels.flow import flow_solve_pallas

    grid = Grid(W, H)
    h = fbm(grid, NoiseParams(mode="default", octaves=6, scale=2.0,
                              min=-2.0, max=3.0, seed=7))
    sel = jnp.ones(grid.shape, jnp.float32)

    @jax.jit
    def pre(h, sel):
        hb = blur(h, grid, 0.5)
        code = flow.flow_directions(hb, sel, grid)
        _, mouth, _ = flow.incoming_mask(code, grid)
        return code, mouth

    code, mouth = pre(h, sel)
    area = flow.cell_area_lower_edge(grid)

    timeit("preprocess (blur+dir+mask)", pre, h, sel)
    timeit("flow_solve_pallas (banded)",
           jax.jit(lambda c, a, m: flow_solve_pallas(c, a, m, grid)),
           code, area, mouth)
    timeit("flow_solve_fused",
           jax.jit(lambda c, a, m: flow_solve_fused(c, a, m, grid)),
           code, area, mouth)
    timeit("flow_filter_device (total)",
           jax.jit(lambda h_, s_: flow.flow_filter_device(h_, s_, grid)),
           h, sel)

    # path-length structure: global longest path vs in-band longest (numpy)
    parent = np.asarray(flow.parent_pointers(code, grid))
    N = parent.shape[0]
    depth = np.zeros(N, np.int32)
    ptr = parent.copy()
    alive = ptr >= 0
    hops = np.where(alive, 1, 0)
    d = 0
    while alive.any() and d < 64:
        depth[alive] += hops[alive] if False else 0
        # pointer doubling for max depth
        nxt = np.where(alive, ptr, 0)
        na = alive & (parent[nxt] >= 0) if False else alive
        d += 1
        break
    # simpler: iterative longest path via topological peeling is O(L);
    # use doubling on 'distance to root'
    dist = np.where(parent >= 0, 1, 0).astype(np.int64)
    ptr = np.where(parent >= 0, parent, np.arange(N))
    for _ in range(24):
        dist = dist + np.where(ptr != np.arange(N), dist[ptr], 0)
        ptr = ptr[ptr]
    print(f"global longest flow path: {dist.max()} hops")
    band = 64
    rows = (np.arange(N) // W) // band
    # in-band distance: stop when crossing band boundary
    inband_parent = np.where((parent >= 0) & (rows[np.where(parent >= 0,
                             parent, 0)] == rows), parent, -1)
    dist2 = np.where(inband_parent >= 0, 1, 0).astype(np.int64)
    ptr2 = np.where(inband_parent >= 0, inband_parent, np.arange(N))
    for _ in range(24):
        dist2 = dist2 + np.where(ptr2 != np.arange(N), dist2[ptr2], 0)
        ptr2 = ptr2[ptr2]
    print(f"in-band (band={band}) longest path: {dist2.max()} hops")
    # cross-band edge count
    cross = (parent >= 0) & (rows[np.where(parent >= 0, parent, 0)] != rows)
    print(f"cross-band edges: {cross.sum()} of {N}")


if __name__ == "__main__":
    main()
