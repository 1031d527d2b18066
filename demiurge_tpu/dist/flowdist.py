"""Two-level distributed flow solve: O(1) collectives instead of one halo
exchange per relaxation round.

The round-4 sharded flow (dist.halo.flow_solve_sharded) exchanges an
(A, vis) halo every K sweeps until global convergence — at 8192x4096 that
is hundreds of ppermutes plus a pmax per round, and the per-shard compute
runs the joint f32 relaxation the single-chip path abandoned.  This module
replaces the round loop with the two-level decomposition of
pallas_kernels.flow2 (band-local fixpoints + a contracted inter-band
drainage graph), which needs a FIXED, tiny set of collectives:

  1. all_to_all along 'x': the ('y','x')-sharded blocks redistribute to
     full-width row groups (device (yi, xi) gets rows
     [(yi*nx + xi) * H/D, ...) at full W) — in-band paths wrap the
     dateline, so the band solver needs whole rows.
  2. per-device band-local solves (zero communication): A_loc + exit
     pointers + vis_loc over that device's bands.
  3. all_gather of band BOUNDARY rows only (2 rows per band: ~2/band of
     the field) -> every device solves the same tiny coarse drainage
     graph redundantly (replicated compute beats a scatter round trip).
  4. per-device injection re-solves (zero communication).
  5. all_to_all back to the block layout.

Total: 4 field-sized all_to_alls + 4 small all_gathers, independent of
convergence depth.  Results match ops.flow.flow_solve_stencil (A allclose
— chain sums reassociate f32 additions; vis exactly).

The per-device solves run the Pallas band kernel on a TPU backend (inside
shard_map a pallas_call is per-device code — no device-count gate needed)
and the XLA twin elsewhere, so the 8-virtual-device CPU mesh tests the
identical structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.grid import Grid
from ..core.platform import tpu_backend
from ..pallas_kernels.flow import pack_masks
from ..pallas_kernels.flow2 import (
    _accumulate_adaptive,
    _or_chain_adaptive,
    coarse_graph_rows,
    coarse_rows,
    flow_local_solve,
    flow_local_solve_xla,
    flow_local_vis,
    flow_local_vis_xla,
    mask_local,
)

_SPEC = P("y", "x")


def _pick_dist_band(rows_loc: int) -> int:
    for b in (128, 64, 32, 16, 8, 4, 2):
        if rows_loc % b == 0:
            return b
    return 0


def flow_sharded_twolevel_supported(grid: Grid, mesh: Mesh) -> bool:
    ny, nx = mesh.shape["y"], mesh.shape["x"]
    H, W = grid.shape
    if not grid.wrap_x or H % (ny * nx) != 0 or W % nx != 0:
        return False
    return _pick_dist_band(H // (ny * nx)) > 0


@partial(jax.jit, static_argnames=("grid", "mesh", "band"))
def flow_solve_sharded_twolevel(code, area2d, mouth, grid: Grid, mesh: Mesh,
                                band: int = 0):
    """Distributed (A, vis) flow solve by the two-level scheme (module
    docstring).  Same fixpoint as ops.flow.flow_solve_stencil."""
    H, W = grid.shape
    ny, nx = mesh.shape["y"], mesh.shape["x"]
    D = ny * nx
    rows_loc = H // D
    band = band or _pick_dist_band(rows_loc)
    assert band and rows_loc % band == 0 and grid.wrap_x, (
        grid.shape, mesh.shape, band)
    nbands = H // band

    packed_g = pack_masks(code, mouth, grid)       # GSPMD (one-off shifts)
    ploc_g = mask_local(packed_g, band)

    use_pallas = tpu_backend()

    def local_solve(pl_r, a_r, a0_r, with_exit):
        if use_pallas:
            return flow_local_solve(pl_r, a_r, a0_r, band,
                                    with_exit=with_exit)
        return flow_local_solve_xla(pl_r, a_r, a0_r, band,
                                    with_exit=with_exit)

    def local_vis(pl_r, seed):
        if use_pallas:
            return flow_local_vis(pl_r, seed, band)
        return flow_local_vis_xla(pl_r, seed, band)

    def body(ploc_b, area_b):
        # --- 1. blocks -> full-width row groups
        def to_rows(x):
            if nx == 1:
                return x
            return jax.lax.all_to_all(x, "x", split_axis=0, concat_axis=1,
                                      tiled=True)

        def to_blocks(x):
            if nx == 1:
                return x
            return jax.lax.all_to_all(x, "x", split_axis=1, concat_axis=0,
                                      tiled=True)

        pl_r = to_rows(ploc_b)              # (rows_loc, W) int32
        ar_r = to_rows(area_b)

        # --- 2. local band solves (zero communication)
        A_loc, E = local_solve(pl_r, ar_r, ar_r, True)
        vis_loc = local_vis(pl_r, jnp.zeros_like(ar_r))

        # --- 3. boundary rows -> replicated coarse graph
        def gather_coarse(x):
            xc = coarse_rows(x, band)       # (2*nbands_loc, W)
            if nx > 1:
                xc = jax.lax.all_gather(xc, "x", axis=0, tiled=True)
            if ny > 1:
                xc = jax.lax.all_gather(xc, "y", axis=0, tiled=True)
            return xc                       # (2*nbands, W), replicated

        pc = gather_coarse(pl_r)
        Ac = gather_coarse(A_loc)
        Ec = gather_coarse(E)
        Vc = gather_coarse(vis_loc)

        succ, m0, tflat_c, tflat_g, srcflat_g, cross = \
            coarse_graph_rows(pc, Ac, Ec, band)
        X = _accumulate_adaptive(succ, m0)
        n0 = jnp.where(cross, Vc.reshape(-1)[tflat_c], 0.0)
        visX = _or_chain_adaptive(succ, n0)

        # --- 4. own-rows injections + re-solves (zero communication)
        g = jax.lax.axis_index("y") * nx + jax.lax.axis_index("x")
        lo = g * rows_loc * W
        n_loc = rows_loc * W
        own_t = cross & (tflat_g >= lo) & (tflat_g < lo + n_loc)
        inj = jnp.zeros((n_loc,), jnp.float32).at[
            jnp.where(own_t, tflat_g - lo, n_loc)].add(
            jnp.where(own_t, X, 0.0), mode="drop").reshape(rows_loc, W)
        own_s = cross & (srcflat_g >= lo) & (srcflat_g < lo + n_loc)
        seed = jnp.zeros((n_loc,), jnp.float32).at[
            jnp.where(own_s, srcflat_g - lo, n_loc)].max(
            jnp.where(own_s, visX, 0.0), mode="drop").reshape(rows_loc, W)

        A, _ = local_solve(pl_r, ar_r + inj, A_loc + inj, False)
        vis = flow_local_vis_xla(pl_r, seed, band)

        # --- 5. back to the block layout
        return to_blocks(A), to_blocks(vis)

    fn = shard_map(body, mesh=mesh, in_specs=(_SPEC, _SPEC),
                   out_specs=(_SPEC, _SPEC))
    A, vis = fn(ploc_g, area2d)
    return A, vis > 0.5
