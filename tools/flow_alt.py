"""Measure XLA pointer-doubling accumulation vs the banded kernel.

Usage: python tools/flow_alt.py [W H]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(name, fn, *args, iters=5):
    probe = jax.jit(lambda A: jax.tree_util.tree_leaves(A)[0].ravel()[0])
    out = fn(*args)
    float(probe(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(probe(out))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:9.2f} ms", flush=True)
    return out


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from demiurge_tpu import Grid
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm

    grid = Grid(W, H)
    h = fbm(grid, NoiseParams(mode="default", octaves=6, scale=2.0,
                              min=-2.0, max=3.0, seed=7))
    sel = jnp.ones(grid.shape, jnp.float32)
    hb = blur(h, grid, 0.5)
    code = jax.jit(flow.flow_directions, static_argnames=("grid",))(
        hb, sel, grid)
    mask, mouth, _ = jax.jit(flow.incoming_mask, static_argnames=("grid",))(
        code, grid)
    area = flow.cell_area_lower_edge(grid)
    parent = jax.jit(flow.parent_pointers, static_argnames=("grid",))(
        code, grid)

    # longest path length (host, for reference)
    par_np = np.asarray(parent)
    depth = np.zeros(par_np.shape[0], np.int32)
    order = np.argsort(np.asarray(hb).ravel())  # downstream is always lower
    # iterate cells from low to high height: depth[p]=depth[parent]+1
    for i in order:
        p = par_np[i]
        if p >= 0:
            depth[i] = depth[p] + 1
    print(f"longest flow path: {depth.max()} cells", flush=True)

    nrounds = int(np.ceil(np.log2(max(int(depth.max()) + 1, 2))))
    print(f"doubling rounds needed: {nrounds}", flush=True)

    area_flat = area.reshape(-1)
    timeit(f"accumulate ({nrounds} rounds)",
           jax.jit(lambda p, a: flow.accumulate(p, a, nrounds)),
           parent, area_flat)
    timeit("accumulate (21 rounds)",
           jax.jit(lambda p, a: flow.accumulate(p, a, 21)),
           parent, area_flat)
    timeit(f"resolve_roots ({nrounds} rounds)",
           jax.jit(lambda p: flow.resolve_roots(p, nrounds)), parent)

    timeit("prepass: blur",
           jax.jit(lambda x: blur(x, grid, 0.5)), h)
    timeit("prepass: directions",
           jax.jit(lambda x, s: flow.flow_directions(x, s, grid)), hb, sel)
    timeit("prepass: incoming_mask",
           jax.jit(lambda c: flow.incoming_mask(c, grid)), code)
    timeit("prepass: parent_pointers",
           jax.jit(lambda c: flow.parent_pointers(c, grid)), code)


if __name__ == "__main__":
    main()
