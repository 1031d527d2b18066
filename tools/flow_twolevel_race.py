"""Race the two-level flow solve against the production banded A-solve on
the real chip (slope timing, same process — see docs/PERF.md methodology).

    python tools/flow_twolevel_race.py [W H]
"""

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
    nevolve = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from demiurge_tpu import Grid
    from demiurge_tpu.model import CoupledConfig, coupled_step, init_coupled
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.ops.ocean import OceanConfig
    from demiurge_tpu.pallas_kernels.flow import flow_solve_pallas
    from demiurge_tpu.pallas_kernels.flow2 import flow_solve_twolevel

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
    for _ in range(nevolve // 10):
        state = jax.block_until_ready(step10(state))
    h = state.height

    sel = jnp.ones(grid.shape, jnp.float32)
    hb = jax.jit(lambda: blur(h, grid, 0.5))()
    code = jax.jit(lambda: flow.flow_directions(hb, sel, grid))()
    _, mouth, _ = jax.jit(lambda: flow.incoming_mask(code, grid))()
    area = flow.cell_area_lower_edge(grid)
    code, mouth, area = jax.block_until_ready((code, mouth, area))

    A_ref = None

    def timeit(name, solve):
        nonlocal A_ref

        def body(carry, _):
            c, ar = carry
            acc = solve(ar * (1 + 1e-30 * c))
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
            A = np.asarray(jax.jit(lambda: solve(area))())
            if A_ref is None:
                A_ref = A
                ok = "ref"
            else:
                ok = "ok" if np.allclose(A_ref, A, rtol=1e-4, atol=1e-6) \
                    else f"MISMATCH maxrel={np.max(np.abs(A - A_ref) / (np.abs(A_ref) + 1e-12)):.2e}"
            print(f"{name:34s} {dt:8.2f} ms  {ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} failed: {e!r}", flush=True)

    for rep in range(2):
        timeit(f"banded A  k=8 band=64 (prod) r{rep}",
               lambda ar: flow_solve_pallas(code, ar, mouth, grid, k=8,
                                            band=64, mode="A")[0])
        for band in (128, 256):
            if H % band == 0:
                timeit(f"twolevel band={band} r{rep}",
                       lambda ar, band=band: flow_solve_twolevel(
                           code, ar, mouth, grid, band=band))


if __name__ == "__main__":
    main()
