"""Diagnose the banded flow solver's convergence tail: per-round active
bands (Python-driven loop, readback of the change flags each round).

Usage: python tools/flow_rounds.py [W H [band k]]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    band = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from demiurge_tpu import Grid
    from demiurge_tpu.ops import flow
    from demiurge_tpu.ops.blur import blur
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.pallas_kernels.flow import (_kernel, _pad_zero_rows,
                                                  pack_masks)

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

    nbands = H // band
    packed = pack_masks(code, mouth, grid)
    ppad = _pad_zero_rows(packed, k)
    areapad = _pad_zero_rows(area, k)
    apad = _pad_zero_rows(area, k)
    vpad = _pad_zero_rows(jnp.where(mouth, 1.0, 0.0), k)
    flags = jnp.ones((nbands,), jnp.int32)

    fshape = jax.ShapeDtypeStruct((H + 2 * k, W), jnp.float32)
    call = jax.jit(pl.pallas_call(
        functools.partial(_kernel, k, band, nbands),
        grid=(nbands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(fshape, fshape,
                   jax.ShapeDtypeStruct((nbands,), jnp.int32)),
        input_output_aliases={3: 0, 4: 1},
        scratch_shapes=[
            pltpu.VMEM((band + 2 * k, W), jnp.float32),
            pltpu.VMEM((band + 2 * k, W), jnp.float32),
            pltpu.VMEM((band + 2 * k, W), jnp.int32),
            pltpu.VMEM((band + 2 * k, W), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    ))

    hist = []
    rounds = 0
    while True:
        apad, vpad, flags = call(flags, ppad, areapad, apad, vpad)
        f = np.asarray(flags)
        hist.append(int(f.sum()))
        rounds += 1
        if f.sum() == 0 or rounds > 3000:
            break
    print(f"band={band} k={k} nbands={nbands}: rounds={rounds} "
          f"sweeps<={rounds * k}")
    print("active bands per round:", hist)
    print("total band-runs:", sum(hist) + nbands)


if __name__ == "__main__":
    main()
