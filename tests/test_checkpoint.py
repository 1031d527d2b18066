"""Checkpoint/resume fault tolerance (SURVEY §5: failure detection/recovery).

Simulates the failure scenario the reference cannot survive: a run is killed
mid-way; a new process resumes from the latest complete checkpoint and must
reach a state identical to an uninterrupted run.
"""

import os

import numpy as np

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.model import (CoupledConfig, CoupledState, coupled_step,
                                init_coupled)
from demiurge_tpu.ops.noise import NoiseParams, fbm
from demiurge_tpu.ops.ocean import OceanConfig
from demiurge_tpu.utils import checkpoint as ckpt


def _setup():
    g = Grid(64, 32)
    cfg = CoupledConfig(climate_substeps=2,
                        ocean=OceanConfig(jacobi_iters=8, diffusion_iters=2))
    h = fbm(g, NoiseParams(octaves=3, scale=2.0, min=-2.0, max=3.0, seed=7))
    return g, cfg, init_coupled(h, g)


def test_resume_matches_uninterrupted(tmp_path):
    g, cfg, state = _setup()
    path = str(tmp_path / "run.ckpt.npz")

    # uninterrupted: 4 steps
    ref = state
    for _ in range(4):
        ref = coupled_step(ref, g, cfg)

    # interrupted: 2 steps, checkpoint, "crash", resume, 2 more
    s = state
    for i in range(2):
        s = coupled_step(s, g, cfg)
    ckpt.save(path, s, 2, g)
    del s  # the crash

    s2, step = ckpt.load(path, CoupledState)
    assert step == 2
    for _ in range(step, 4):
        s2 = coupled_step(s2, g, cfg)

    for name in ("height", "u", "v", "temperature", "t_index"):
        np.testing.assert_allclose(np.asarray(getattr(s2, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=1e-6, atol=1e-7, err_msg=name)


def test_checkpoint_write_is_atomic(tmp_path):
    """A pre-existing checkpoint survives an interrupted overwrite attempt."""
    g, cfg, state = _setup()
    path = str(tmp_path / "run.ckpt.npz")
    ckpt.save(path, state, 1, g)
    before = os.stat(path).st_size

    class Boom(RuntimeError):
        pass

    class Exploding:
        """Array-like that fails mid-serialization."""
        shape = (4,)
        dtype = np.float32

        def __array__(self, *a, **k):
            raise Boom()

    bad = CoupledState(height=Exploding(), uplift=Exploding(),
                       sel=Exploding(), u=Exploding(), v=Exploding(),
                       temperature=Exploding(), t_index=Exploding())
    try:
        ckpt.save(path, bad, 2, g)
    except Boom:
        pass
    # original checkpoint intact, no temp litter
    assert os.stat(path).st_size == before
    _, step = ckpt.load(path, CoupledState)
    assert step == 1
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_cli_coupled_resume(tmp_path):
    """End-to-end through the CLI: run with --checkpoint, then --resume."""
    from demiurge_tpu.api import cli

    path = str(tmp_path / "cli.ckpt.npz")
    common = ["coupled", "--width", "64", "--height", "32",
              "--checkpoint", path, "--checkpoint-every", "1"]
    cli.main(common + ["--steps", "2"])
    _, step = ckpt.load(path, CoupledState)
    assert step == 2
    cli.main(common + ["--steps", "3", "--resume"])
    _, step = ckpt.load(path, CoupledState)
    assert step == 3
