"""Command-line runner for the five BASELINE configurations.

  python -m demiurge_tpu.api.cli erosion          # config 1: 1024x512, 100 steps
  python -m demiurge_tpu.api.cli tectonic-erosion # config 2: 2048x1024
  python -m demiurge_tpu.api.cli ocean            # config 3: 2048x1024 + Coriolis
  python -m demiurge_tpu.api.cli climate          # config 4: 4096x2048, 1 year
  python -m demiurge_tpu.api.cli coupled          # config 5: 8192x4096, sharded

Common flags: --width/--height/--steps override the config size,
--save out.npz, --png out.png, --log metrics.jsonl, --xprof tracedir,
--mesh NYxNX (domain decomposition; 'coupled' defaults to all devices).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _build_parser():
    p = argparse.ArgumentParser(prog="demiurge_tpu",
                                description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, w, h, steps):
        sp.add_argument("--width", type=int, default=w)
        sp.add_argument("--height", type=int, default=h)
        sp.add_argument("--steps", type=int, default=steps)
        sp.add_argument("--seed", type=int, default=7)
        sp.add_argument("--save", type=str, default=None)
        sp.add_argument("--png", type=str, default=None)
        sp.add_argument("--log", type=str, default=None)
        sp.add_argument("--xprof", type=str, default=None)
        sp.add_argument("--mesh", type=str, default=None,
                        help="NYxNX domain decomposition")
        sp.add_argument("--checkpoint", type=str, default=None,
                        help="checkpoint file; with --resume, restart from it")
        sp.add_argument("--checkpoint-every", type=int, default=10)
        sp.add_argument("--resume", action="store_true",
                        help="resume from --checkpoint if it exists")

    common(sub.add_parser("erosion", help="fluvial erosion (BASELINE 1)"),
           1024, 512, 100)
    sp = sub.add_parser("tectonic-erosion",
                        help="tectonic uplift + erosion (BASELINE 2)")
    common(sp, 2048, 1024, 70)
    sp = sub.add_parser("ocean", help="ocean currents + Coriolis (BASELINE 3)")
    common(sp, 2048, 1024, 50)
    sp.add_argument("--jacobi", type=int, default=1000)
    sp = sub.add_parser("climate", help="seasonal climate (BASELINE 4)")
    common(sp, 4096, 2048, 15000)
    sp = sub.add_parser("coupled", help="coupled pipeline (BASELINE 5)")
    common(sp, 8192, 4096, 10)
    return p


def _terrain(grid, seed):
    from ..ops.noise import NoiseParams, fbm

    return fbm(grid, NoiseParams(octaves=8, scale=2.0, min=-4.0, max=6.0,
                                 seed=seed))


def _mesh_from(args):
    import jax

    from ..dist import make_mesh

    if args.mesh:
        ny, nx = (int(x) for x in args.mesh.lower().split("x"))
        return make_mesh(ny * nx, shape=(ny, nx))
    if args.cmd == "coupled" and len(jax.devices()) > 1:
        return make_mesh()
    return None


def _shard(x, mesh):
    if mesh is None:
        return x
    import jax

    from ..dist import field_sharding

    return jax.device_put(x, field_sharding(mesh))


def _finish(args, grid, height, logger):
    from ..utils.png import write_png

    if args.save:
        np.savez_compressed(args.save, terrain=np.asarray(height),
                            coords=np.asarray(grid.coords),
                            circumference=grid.circumference)
        print(f"saved {args.save}", file=sys.stderr)
    if args.png:
        from ..viz import appearance

        img = appearance.render(height, grid)
        write_png(args.png, np.asarray(img)[::-1])
        print(f"wrote {args.png}", file=sys.stderr)
    logger.close()


def main(argv=None):
    args = _build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core.grid import Grid
    from ..utils import metrics as M

    grid = Grid(args.width, args.height)
    mesh = _mesh_from(args)
    logger = M.StepLogger(grid, path=args.log)

    with M.maybe_profile(args.xprof):
        if args.cmd == "erosion":
            from ..ops import erosion

            h = _terrain(grid, args.seed)
            sel = jnp.ones(grid.shape)
            cfg = erosion.ErosionConfig(lakes=True)

            def cb(i, hh):
                logger.log(i, mass=M.mass(hh, grid))

            h = erosion.landscape_evolution(h, sel, grid, cfg,
                                            iterations=args.steps,
                                            callback=cb)
            _finish(args, grid, h, logger)

        elif args.cmd == "tectonic-erosion":
            from ..ops import erosion

            h = _terrain(grid, args.seed)
            sel = jnp.ones(grid.shape)
            # live coupling: tectonic uplift forcing refreshed during the
            # evolution loop (not the reference's sequential chain)
            h3 = erosion.coupled_tectonic_erosion(
                h, sel, grid, erosion.ErosionConfig(lakes=True),
                iterations=args.steps, tectonic_every=5,
                callback=lambda i, hh: logger.log(i, mass=M.mass(hh, grid)))
            _finish(args, grid, h3, logger)

        elif args.cmd == "ocean":
            from ..ops import ocean

            h = _shard(_terrain(grid, args.seed), mesh)
            cfg = ocean.OceanConfig(jacobi_iters=args.jacobi, coriolis=1.0)
            u, v = ocean.init_ocean(grid)
            u, v = _shard(u, mesh), _shard(v, mesh)
            for i in range(args.steps):
                u, v, p, d = ocean.ocean_step(u, v, h, grid, cfg)
                logger.log(i, div_norm=M.divergence_norm(u, v, h, grid, cfg),
                           vmax=jnp.sqrt(u * u + v * v).max(),
                           advect_clamped=ocean.advect_clamped_fraction(
                               u, v, h, grid, cfg))
            _finish(args, grid, h, logger)

        elif args.cmd == "climate":
            from ..ops import temperature

            h = _shard(_terrain(grid, args.seed), mesh)
            T = _shard(temperature.init_temperature(grid), mesh)
            i0 = 0.0
            per = 250
            done = 0
            step = 0
            while done < args.steps:
                k = min(per, args.steps - done)
                T, i0 = temperature.temperature_step(T, h, i0, grid,
                                                     substeps=k)
                done += k
                step += 1
                logger.log(step, substeps=done,
                           mean_T=M.mean_temperature(T, grid))
            _finish(args, grid, T, logger)

        elif args.cmd == "coupled":
            from ..model import CoupledConfig, CoupledState, coupled_step, \
                init_coupled
            from ..utils import checkpoint as ckpt

            start = 0
            if args.resume and args.checkpoint and \
                    ckpt.latest(args.checkpoint):
                state, start = ckpt.load(args.checkpoint, CoupledState)
                print(f"resumed from {args.checkpoint} at step {start}",
                      file=sys.stderr)
            else:
                h = _terrain(grid, args.seed)
                state = init_coupled(h, grid)
            if mesh is not None:
                import dataclasses as dc

                state = dc.replace(
                    state,
                    **{f: _shard(getattr(state, f), mesh)
                       for f in ("height", "uplift", "sel", "u", "v",
                                 "temperature")})
            cfg = CoupledConfig()
            for i in range(start, args.steps):
                state = coupled_step(state, grid, cfg)
                from ..ops import ocean as ocean_ops

                logger.log(i, mass=M.mass(state.height, grid),
                           mean_T=M.mean_temperature(state.temperature, grid),
                           advect_clamped=ocean_ops.advect_clamped_fraction(
                               state.u, state.v, state.height, grid,
                               cfg.ocean))
                if args.checkpoint and (i + 1) % args.checkpoint_every == 0:
                    ckpt.save(args.checkpoint, state, i + 1, grid)
            if args.checkpoint:
                ckpt.save(args.checkpoint, state, args.steps, grid)
            _finish(args, grid, state.height, logger)


if __name__ == "__main__":
    main()
