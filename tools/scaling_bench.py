"""Weak-scaling benchmark: grid-points/s of the coupled step at 1..N devices.

BASELINE requires scaling efficiency from 1 chip to N hosts.  With real
multi-chip hardware this measures it directly; without it (the dev
environment has one chip), run on a virtual CPU mesh to validate the
sharded program and produce the efficiency *methodology* numbers:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python tools/scaling_bench.py --weak --base-width 512 --base-height 256

Weak scaling holds the per-device tile fixed (the grid grows with the mesh);
strong scaling (--strong) holds the global grid fixed.  Prints one JSON line
per mesh size with grid-points/s and efficiency vs the 1-device run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weak", action="store_true", default=True)
    ap.add_argument("--strong", dest="weak", action="store_false")
    ap.add_argument("--base-width", type=int, default=1024)
    ap.add_argument("--base-height", type=int, default=512)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--jacobi", type=int, default=200)
    ap.add_argument("--one", type=int, default=0,
                    help="run a single mesh size (used by the subprocess "
                         "isolation below)")
    args = ap.parse_args()

    if not args.one:
        # one subprocess per mesh size: on oversubscribed CPU hosts XLA's
        # collective rendezvous can hard-abort (40s timeout) — isolate so
        # one abort doesn't kill the sweep
        import subprocess

        import jax as _jax
        if os.environ.get("JAX_PLATFORMS"):
            _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        ndev = len(_jax.devices())
        base = None
        for n in (1, 2, 4, 8, 16, 32):
            if n > ndev:
                break
            cmd = [sys.executable, os.path.abspath(__file__), "--one", str(n),
                   "--base-width", str(args.base_width),
                   "--base-height", str(args.base_height),
                   "--steps", str(args.steps), "--jacobi", str(args.jacobi)]
            if not args.weak:
                cmd.append("--strong")
            r = subprocess.run(cmd, capture_output=True, text=True)
            rec = None
            for line in (r.stdout or "").splitlines():
                if line.startswith("{"):
                    rec = json.loads(line)
            if rec is None:
                print(json.dumps({"devices": n, "error":
                                  f"subprocess rc={r.returncode}"}),
                      flush=True)
                continue
            if n == 1:
                base = rec["per_device"]
            if base:
                rec["efficiency_vs_1"] = round(rec["per_device"] / base, 4)
            print(json.dumps(rec), flush=True)
        return

    import jax

    # sitecustomize (axon TPU tunnel) imports jax at interpreter start with
    # JAX_PLATFORMS=axon already latched; re-apply the requested platform.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

    from demiurge_tpu import Grid
    from demiurge_tpu.dist import field_sharding, make_mesh
    from demiurge_tpu.model import (CoupledConfig, CoupledState, coupled_step,
                                    init_coupled)
    from demiurge_tpu.ops.noise import NoiseParams, fbm
    from demiurge_tpu.ops.ocean import OceanConfig

    sizes = [args.one]
    base = None

    for n in sizes:
        mesh = make_mesh(n)
        ny, nx = mesh.devices.shape
        if args.weak:
            W, H = args.base_width * nx, args.base_height * ny
        else:
            W, H = args.base_width, args.base_height
        grid = Grid(W, H)
        cfg = CoupledConfig(
            climate_substeps=10,
            ocean=OceanConfig(jacobi_iters=args.jacobi, diffusion_iters=50),
        )
        h = fbm(grid, NoiseParams(octaves=6, scale=2.0, min=-2.0, max=3.0,
                                  seed=7))
        state = init_coupled(h, grid)
        s = field_sharding(mesh)
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, s if getattr(a, "ndim", 0) == 2
                                     else rep), state)

        # mesh=... : the amortized explicit-halo path (dist.halo) — the
        # production multi-chip configuration (GSPMD handles the rest)
        step = jax.jit(lambda st: coupled_step(st, grid, cfg,
                                               mesh=mesh if n > 1 else None))
        state = step(state)
        jax.block_until_ready(state)
        float(jnp.asarray(state.height).ravel()[0])

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state = step(state)
        float(jnp.asarray(state.height).ravel()[0])
        dt = (time.perf_counter() - t0) / args.steps
        gps = W * H / dt
        per_dev = gps / n
        if base is None:
            base = per_dev
        print(json.dumps({
            "devices": n, "mesh": [int(ny), int(nx)],
            "grid": [H, W],
            "grid_points_per_s": round(gps, 1),
            "per_device": round(per_dev, 1),
            "efficiency_vs_1": round(per_dev / base, 4),
            "mode": "weak" if args.weak else "strong",
        }), flush=True)


if __name__ == "__main__":
    main()
