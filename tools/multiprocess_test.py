"""REAL multi-process run: 2 CPU processes x 4 devices, one 2x4 mesh.

Round-4 verdict: nothing had ever executed with process_count > 1 — the
cross-process manifest/addressable-shard logic in utils.checkpoint and the
multi-host claims of dist.mesh were theory.  This script launches two OS
processes that form one JAX distributed system (jax.distributed.initialize
over a local coordinator), then:

  1. runs 3 coupled steps on the global 2x4 mesh through the amortized
     mesh path (cross-PROCESS ppermutes/all_to_alls on the CPU backend),
  2. checks the result against a single-device run of the same steps,
  3. writes a sharded per-process checkpoint (save_sharded), resumes it
     on the same topology (load_sharded with a NamedSharding — each
     process reads only its own file), steps once more on both the
     resumed and original states and checks they agree,
  4. the parent then assembles the checkpoint single-host
     (load_sharded(sharding=None)) and re-checks against the reference.

Run:  python tools/multiprocess_test.py [--json MULTIPROC_r05.json]
"""

import argparse
import json
import os
import pickle
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def worker(pid: int, nproc: int, port: int, workdir: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    sys.path.insert(0, REPO)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from demiurge_tpu.dist import mesh as dmesh

    dmesh.initialize(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from demiurge_tpu import Grid
    from demiurge_tpu.dist import field_sharding, make_mesh
    from demiurge_tpu.model import (CoupledConfig, CoupledState,
                                    coupled_step, init_coupled)
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.ops.ocean import OceanConfig
    from demiurge_tpu.utils import checkpoint as ckpt

    g = Grid(128, 64)
    mesh = make_mesh(8, shape=(2, 4))
    cfg = CoupledConfig(climate_substeps=2,
                        ocean=OceanConfig(jacobi_iters=16,
                                          diffusion_iters=4))

    # identical full terrain on every process (deterministic), then build
    # the global sharded state from per-process host data
    h_np = np.asarray(jax.jit(
        lambda: fbm(g, NoiseParams(octaves=4, scale=2.0, min=-2.0, max=3.0,
                                   seed=7)), device=jax.local_devices()[0])())
    st_local = init_coupled(jnp.asarray(h_np), g)

    s = field_sharding(mesh)

    def globalize(x):
        if getattr(x, "ndim", 0) != 2:
            return jnp.asarray(x)
        x_np = np.asarray(x)
        return jax.make_array_from_callback(x_np.shape, s,
                                            lambda idx: x_np[idx])

    st = jax.tree_util.tree_map(globalize, st_local)

    step = jax.jit(lambda s_: coupled_step(s_, g, cfg, mesh=mesh))
    for _ in range(3):
        st = step(st)
    st = jax.block_until_ready(st)

    # single-device reference on this process's device 0
    ref_step = jax.jit(lambda s_: coupled_step(s_, g, cfg),
                       device=jax.local_devices()[0])
    ref = st_local
    for _ in range(3):
        ref = ref_step(ref)
    ref = jax.block_until_ready(ref)

    from jax.experimental import multihost_utils

    def gather(a):
        return np.asarray(multihost_utils.process_allgather(a, tiled=True))

    def gdiff(a, b):
        return float(np.max(np.abs(gather(a) - np.asarray(b))))

    dh = gdiff(st.height, ref.height)
    dh_q = float(np.quantile(np.abs(gather(st.height)
                                    - np.asarray(ref.height)), 0.999))
    dT = gdiff(st.temperature, ref.temperature)

    # --- sharded checkpoint round trip on the same topology
    cdir = os.path.join(workdir, "ckpt")
    ckpt.save_sharded(cdir, st, step=3, grid=g)
    st2, step_no = ckpt.load_sharded(cdir, CoupledState, sharding=s)
    assert step_no == 3
    a = jax.block_until_ready(step(st))
    b = jax.block_until_ready(step(st2))
    dresume = gdiff(b.height, np.asarray(
        multihost_utils.process_allgather(a.height, tiled=True)))

    if pid == 0:
        out = {
            "process_count": jax.process_count(),
            "global_devices": jax.device_count(),
            "local_devices": len(jax.local_devices()),
            "mesh": [2, 4],
            "grid": [64, 128],
            "steps": 3,
            "max_abs_height_diff_vs_single_device": dh,
            "p999_abs_height_diff_vs_single_device": dh_q,
            "max_abs_temperature_diff_vs_single_device": dT,
            "resume_then_step_max_abs_height_diff": dresume,
            # height: bulk must be tight; isolated cells may differ by
            # ~1e-3 when an f32 reassociation flips a knife-edge D8
            # direction tie and reroutes one cell's drainage (both
            # resolutions are valid; erosion then differs locally)
            "height_ok": dh_q < 1e-5 and dh < 5e-3,
            "temperature_ok": dT < 1e-3,
            "resume_ok": dresume == 0.0,
        }
        with open(os.path.join(workdir, "result.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        # stash the reference final state for the parent's single-host
        # assembly check
        with open(os.path.join(workdir, "ref_height.npy"), "wb") as fh:
            np.save(fh, np.asarray(ref.height))
    multihost_utils.sync_global_devices("demiurge_tpu-mptest-done")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=12785)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, 2, args.port, args.workdir)
        return

    workdir = tempfile.mkdtemp(prefix="demiurge_mptest_")
    procs = [subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__), "--worker", str(i),
         "--port", str(args.port), "--workdir", workdir],
        cwd=REPO) for i in range(2)]
    rcs = [p.wait(timeout=3600) for p in procs]
    assert all(r == 0 for r in rcs), rcs

    with open(os.path.join(workdir, "result.json")) as fh:
        result = json.load(fh)

    # single-host assembly of the 2-process checkpoint (elastic reader)
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)
    import numpy as np

    from demiurge_tpu.model import CoupledState
    from demiurge_tpu.utils import checkpoint as ckpt

    st, step_no = ckpt.load_sharded(os.path.join(workdir, "ckpt"),
                                    CoupledState, sharding=None)
    result["single_host_assembly_step"] = step_no
    result["assembled_fields"] = sorted(
        f for f in st.__dataclass_fields__)
    href = np.load(os.path.join(workdir, "ref_height.npy"))
    diff = np.abs(np.asarray(st.height) - href)
    result["single_host_assembly_height_diff_vs_ref"] = float(diff.max())
    result["assembly_ok"] = (float(np.quantile(diff, 0.999)) < 1e-5
                             and float(diff.max()) < 5e-3)
    ok = all(result[k] for k in
             ("height_ok", "temperature_ok", "resume_ok", "assembly_ok"))
    result["ok"] = ok

    txt = json.dumps(result, indent=1)
    print(txt)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(txt + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
