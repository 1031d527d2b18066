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


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Per-process shard files + manifest: save sharded state WITHOUT
    materializing the global arrays; resume both (a) onto the same mesh via
    make_array_from_single_device_arrays and (b) host-side with no mesh."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    from demiurge_tpu.dist import field_sharding, make_mesh

    g, cfg, state = _setup()
    mesh = make_mesh(8, shape=(2, 4))
    s = field_sharding(mesh)
    sharded = CoupledState(
        **{f: jax.device_put(getattr(state, f), s)
           for f in ("height", "uplift", "sel", "u", "v", "temperature")},
        t_index=state.t_index)

    d = str(tmp_path / "ckpt")
    ckpt.save_sharded(d, sharded, 7, g)
    assert ckpt.latest(d) == d
    # shard file holds shard-sized blocks, not the global array
    with np.load(os.path.join(d, "shard_00000.npz")) as z:
        blocks = [z[k] for k in z.files if k.startswith("f_height__")]
        assert blocks and all(b.shape == (16, 16) for b in blocks)

    # (a) same-mesh resume
    got, step = ckpt.load_sharded(d, CoupledState, sharding=s)
    assert step == 7
    assert got.height.sharding.is_equivalent_to(s, 2)
    for name in ("height", "u", "v", "temperature", "t_index"):
        np.testing.assert_array_equal(np.asarray(getattr(got, name)),
                                      np.asarray(getattr(state, name)),
                                      err_msg=name)

    # (b) meshless host-side assembly
    got2, step2 = ckpt.load_sharded(d, CoupledState)
    assert step2 == 7
    np.testing.assert_array_equal(np.asarray(got2.height),
                                  np.asarray(state.height))


def test_elastic_resume_on_smaller_mesh(tmp_path):
    """Elastic recovery: a run sharded over 8 devices is killed; the
    sharded checkpoint restores onto a DIFFERENT (2-device) mesh and the
    continued run matches an uninterrupted single-device run exactly —
    losing 6 of 8 'hosts' only costs the work since the last checkpoint."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    from demiurge_tpu.dist import field_sharding, make_mesh

    g, cfg, state = _setup()
    fields = ("height", "uplift", "sel", "u", "v", "temperature")

    # uninterrupted single-device reference: 4 steps
    ref = state
    for _ in range(4):
        ref = coupled_step(ref, g, cfg)

    # sharded run on the full 8-device mesh, killed after 2 steps
    mesh8 = make_mesh(8, shape=(2, 4))
    s8 = field_sharding(mesh8)
    run = CoupledState(
        **{f: jax.device_put(getattr(state, f), s8) for f in fields},
        t_index=state.t_index)
    for _ in range(2):
        run = coupled_step(run, g, cfg)
    d = str(tmp_path / "ckpt")
    ckpt.save_sharded(d, run, 2, g)

    # "host loss": restart on a 2-device mesh from the shard files
    mesh2 = make_mesh(2, shape=(1, 2))
    s2 = field_sharding(mesh2)
    got, step = ckpt.load_sharded(d, CoupledState)  # host-side assembly
    assert step == 2
    resumed = CoupledState(
        **{f: jax.device_put(getattr(got, f), s2) for f in fields},
        t_index=got.t_index)
    for _ in range(2):
        resumed = coupled_step(resumed, g, cfg)

    for name in ("height", "u", "v", "temperature"):
        np.testing.assert_allclose(np.asarray(getattr(resumed, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=2e-5, atol=1e-6, err_msg=name)


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
