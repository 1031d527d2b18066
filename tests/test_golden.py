"""Golden-state regression tests (SURVEY §4): N steps of each solver on a
small grid against committed reference arrays.

The goldens pin the *semantics* — any intentional numerics change must
regenerate them (`python tests/test_golden.py regen`) and justify the diff
in the commit message.  Tolerances are loose enough for backend-to-backend
f32 drift (CPU vs TPU, reassociation in fused kernels) but catch real
behavior changes.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from demiurge_tpu import Grid
from demiurge_tpu.model import CoupledConfig, coupled_step, init_coupled
from demiurge_tpu.ops.noise import NoiseParams, fbm
from demiurge_tpu.ops.ocean import OceanConfig

GOLD = os.path.join(os.path.dirname(__file__), "golden")

W, H, STEPS = 128, 64, 5


def _run():
    grid = Grid(W, H)
    cfg = CoupledConfig(
        climate_substeps=4,
        ocean=OceanConfig(jacobi_iters=40, diffusion_iters=10),
    )
    h = fbm(grid, NoiseParams(octaves=4, scale=2.0, min=-2.0, max=3.0,
                              seed=11))
    state = init_coupled(h, grid)
    for _ in range(STEPS):
        state = coupled_step(state, grid, cfg)
    return state


def test_coupled_golden():
    path = os.path.join(GOLD, "coupled_128x64_5steps.npz")
    if not os.path.exists(path):
        pytest.skip("golden file missing — run `python tests/test_golden.py regen`")
    z = np.load(path)
    state = _run()
    for name in ("height", "u", "v", "temperature"):
        got = np.asarray(getattr(state, name))
        want = z[name]
        scale = np.abs(want).max() + 1e-9
        np.testing.assert_allclose(got / scale, want / scale, atol=5e-5,
                                   err_msg=name)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(GOLD, exist_ok=True)
        state = _run()
        np.savez_compressed(
            os.path.join(GOLD, "coupled_128x64_5steps.npz"),
            height=np.asarray(state.height), u=np.asarray(state.u),
            v=np.asarray(state.v),
            temperature=np.asarray(state.temperature))
        print("regenerated")
