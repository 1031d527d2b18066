"""A/B the lane-first vs slab-first sweep roll structure in one process
(slope timing).  python tools/flow_rollswap_race.py [W H]"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

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
    from demiurge_tpu.pallas_kernels import flow as fk
    from jax.experimental.pallas import tpu as pltpu

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

    new_sweep_body = fk._sweep_body

    def old_sweep_body(K, packed, area, a0, vis0, shrink_x=False,
                       mode="both"):
        # pre-round-5 slab-first structure, verbatim
        rows, Wl = area.shape
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, Wl), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, Wl), 1)
        do_A = mode in ("both", "A")
        do_v = mode in ("both", "vis")
        inc = [((packed >> i) & 1).astype(jnp.float32) for i in range(8)] \
            if do_A else None
        outm = [((packed >> (8 + i)) & 1).astype(jnp.float32)
                for i in range(8)] if do_v else None
        mouthf = ((packed >> 16) & 1).astype(jnp.float32) if do_v else None

        def apply_sweep(A, vis):
            newA, newvis = A, vis
            if do_A:
                Aslab = {dy: pltpu.roll(A, (-dy) % rows, 0) if dy else A
                         for dy in (-1, 0, 1)}
                newA = area
            if do_v:
                vslab = {dy: pltpu.roll(vis, (-dy) % rows, 0) if dy else vis
                         for dy in (-1, 0, 1)}
                newvis = mouthf
            for i, (dx, dy) in enumerate(fk._SCAN_ORDER):
                if do_A:
                    Ad = Aslab[dy]
                    if dx:
                        Ad = pltpu.roll(Ad, (-dx) % Wl, 1)
                    newA = newA + inc[i] * Ad
                if do_v:
                    vd = vslab[dy]
                    if dx:
                        vd = pltpu.roll(vd, (-dx) % Wl, 1)
                    newvis = jnp.maximum(newvis, outm[i] * vd)
            return newA, newvis

        def check_done(A, vis, newA, newvis, s_next):
            live = (row_iota >= s_next) & (row_iota < rows - s_next)
            if shrink_x:
                live = live & (col_iota >= s_next) & (col_iota < Wl - s_next)
            ch = jnp.zeros_like(live)
            if do_A:
                ch = ch | (newA != A)
            if do_v:
                ch = ch | (newvis != vis)
            return jnp.logical_not(jnp.any(live & ch))

        def sweep(carry):
            A, vis, s, _ = carry
            A1, vis1 = apply_sweep(A, vis)
            A2, vis2 = apply_sweep(A1, vis1)
            done = check_done(A1, vis1, A2, vis2, s + 2)
            return A2, vis2, s + 2, done

        def cond(carry):
            _, _, s, done = carry
            return (s < K) & jnp.logical_not(done)

        A, vis, _, _ = jax.lax.while_loop(
            cond, sweep, (a0, vis0, jnp.int32(0), jnp.asarray(False)))
        return A, vis

    A_ref = None

    def timeit(name, body_impl, solve):
        nonlocal A_ref
        fk._sweep_body = body_impl

        def body(carry, _):
            c, ar = carry
            acc = solve(ar * (1 + 1e-30 * c))
            return (c + acc.ravel()[0] * 1e-30, ar), None

        def mk(n):
            return jax.jit(lambda ar: jax.lax.scan(
                body, (jnp.float32(0.0), ar), None, length=n)[0][0])

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
        A = np.asarray(jax.jit(lambda: solve(area))())
        if A_ref is None:
            A_ref = A
            ok = "ref"
        else:
            ok = "ok(bitwise)" if np.array_equal(A_ref, A) else "MISMATCH"
        print(f"{name:30s} {dt:8.2f} ms  {ok}", flush=True)
        fk._sweep_body = new_sweep_body

    def solveA(ar):
        return fk.flow_solve_pallas(code, ar, mouth, grid, k=8, band=64,
                                    mode="A")[0]

    def solveV(ar):
        _, vis = fk.flow_solve_pallas(code, ar, mouth, grid, k=8, band=64,
                                      mode="vis")
        return vis.astype(jnp.float32) + ar[0, 0] * 0

    for rep in range(2):
        timeit(f"A slab-first (old) r{rep}", old_sweep_body, solveA)
        timeit(f"A lane-first (new) r{rep}", new_sweep_body, solveA)


if __name__ == "__main__":
    main()
