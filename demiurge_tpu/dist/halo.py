"""Explicit halo exchange over the ('y','x') mesh with shard_map.

The GSPMD path (dist.mesh.sharded_jit) lets XLA insert a collective permute
per stencil shift — one exchange per sweep.  For the deep iterative solvers
(pressure Jacobi, viscosity, flow accumulation) this module amortizes
communication: exchange a K-wide halo once, run K sweeps locally on the
padded block (validity shrinks one ring per sweep), repeat.  Communication
volume drops K-fold and the interior compute overlaps with the next
exchange in XLA's schedule.

Halo hygiene: static per-sweep inputs (obstacle masks, metric terms, the
divergence right-hand side) are folded into 5-point coefficient fields and
halo-padded ONCE before the round loop; each round then exchanges exactly
the iterated state (p, or u+v, or A+vis) — nothing else.

Topology (reproducing core.topology.shift semantics exactly):
- E/W: periodic ring over the dateline -> `ppermute` along 'x'
- N/S: band exchange along 'y'
- polar caps: the rows "beyond" a pole are the same band's rows, flipped,
  at antipodal longitude — with an even number of x shards that is exactly
  the x-shard nx/2 away, so the cap is one more `ppermute` along 'x'
  (selected only on the pole bands).  Crossing a pole reverses both the
  walk direction (N/S coefficient roles swap in reflected halo rows) and
  tangent vectors (velocity halos negate).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.grid import Grid

_SPEC = P("y", "x")


def _perm_ring(n, shiftv):
    return [(i, (i + shiftv) % n) for i in range(n)]


def exchange_halo(block, k: int, grid: Grid, mesh: Mesh,
                  negate_pole: bool = False):
    """Pad a local (h, w) block with k-wide halos from mesh neighbors.

    Must be called inside shard_map over mesh axes ('y','x').  Returns
    (h+2k, w+2k) padded block whose interior stencils (up to k rings deep)
    match the single-device wrap topology exactly.  ``negate_pole`` flips
    the sign of pole-cap halo rows (velocity components reverse when the
    geodesic walk crosses a pole, OceanCurrents.cpp:389/657).
    """
    ny = mesh.shape["y"]
    nx = mesh.shape["x"]
    assert grid.wrap_x, "halo exchange currently requires x-periodic grids"
    assert nx % 2 == 0 or ny == 1 or not (grid.wrap_south or grid.wrap_north) \
        or nx == 1, "polar cap needs an even number of x shards"

    yi = jax.lax.axis_index("y")

    # --- E/W ring (dateline periodic)
    if nx > 1:
        west = jax.lax.ppermute(block[:, -k:], "x", _perm_ring(nx, 1))
        east = jax.lax.ppermute(block[:, :k], "x", _perm_ring(nx, -1))
    else:
        west = block[:, -k:]
        east = block[:, :k]
    block = jnp.concatenate([west, block, east], axis=1)

    # --- N/S bands
    if ny > 1:
        south = jax.lax.ppermute(block[-k:, :], "y",
                                 [(i, i + 1) for i in range(ny - 1)])
        north = jax.lax.ppermute(block[:k, :], "y",
                                 [(i + 1, i) for i in range(ny - 1)])
    else:
        south = jnp.zeros_like(block[-k:, :])
        north = jnp.zeros_like(block[:k, :])

    # --- polar caps: flipped head/tail rows from the antipodal x shard
    if grid.wrap_south or grid.wrap_north:
        head = jnp.flip(block[:k, :], axis=0)
        tail = jnp.flip(block[-k:, :], axis=0)
        if negate_pole:
            head = -head
            tail = -tail
        if nx > 1:
            head = jax.lax.ppermute(head, "x", _perm_ring(nx, nx // 2))
            tail = jax.lax.ppermute(tail, "x", _perm_ring(nx, nx // 2))
        else:
            W = block.shape[1]
            head = jnp.roll(head, -W // 2, axis=1)
            tail = jnp.roll(tail, -W // 2, axis=1)
        if grid.wrap_south:
            south = jnp.where(yi == 0, head, south)
        if grid.wrap_north:
            north = jnp.where(yi == ny - 1, tail, north)

    return jnp.concatenate([south, block, north], axis=0)


def exchange_rows_halo(block, k: int, mesh: Mesh, grid: Grid,
                       edge: str = "reflect"):
    """k-row halo exchange in the FLATTENED row-group layout.

    ``block`` is (rows_loc, W): device (yi, xi) holds full-width rows
    [(yi*nx + xi) * rows_loc, ...) — the layout produced by an all_to_all
    along 'x' (see dist.flowdist).  The south neighbor of device g is
    g-1, i.e. (yi, xi-1) or, at xi == 0, (yi-1, nx-1): one x-ring
    ppermute plus a conditional y ppermute.

    ``edge`` handles the halo beyond the global first/last row:
    'reflect' = pole wrap (flipped rows at antipodal longitude — LOCAL in
    this layout, since rows are full-width), 'clamp' = repeat the edge
    row (GL_CLAMP_TO_EDGE), 'zero' = zeros.
    Returns (rows_loc + 2k, W)."""
    ny = mesh.shape["y"]
    nx = mesh.shape["x"]
    W = block.shape[1]
    yi = jax.lax.axis_index("y")
    xi = jax.lax.axis_index("x")

    def from_prev(tail):  # south halo: last k rows of device g-1
        v = jax.lax.ppermute(tail, "x", _perm_ring(nx, 1)) if nx > 1 else tail
        if ny > 1:
            vy = jax.lax.ppermute(v, "y", [(i, i + 1) for i in range(ny - 1)])
            v = jnp.where(xi == 0, vy, v)
        elif nx == 1:
            v = jnp.zeros_like(v)  # single device: no interior neighbor
        else:
            v = jnp.where(xi == 0, jnp.zeros_like(v), v)
        return v

    def from_next(head):  # north halo: first k rows of device g+1
        v = jax.lax.ppermute(head, "x", _perm_ring(nx, -1)) if nx > 1 \
            else head
        if ny > 1:
            vy = jax.lax.ppermute(v, "y", [(i + 1, i) for i in range(ny - 1)])
            v = jnp.where(xi == nx - 1, vy, v)
        elif nx == 1:
            v = jnp.zeros_like(v)
        else:
            v = jnp.where(xi == nx - 1, jnp.zeros_like(v), v)
        return v

    south = from_prev(block[-k:, :])
    north = from_next(block[:k, :])

    if edge == "reflect":
        s_edge = jnp.roll(jnp.flip(block[:k, :], 0), -(W // 2), 1)
        n_edge = jnp.roll(jnp.flip(block[-k:, :], 0), -(W // 2), 1)
    elif edge == "clamp":
        s_edge = jnp.broadcast_to(block[0:1, :], (k, W))
        n_edge = jnp.broadcast_to(block[-1:, :], (k, W))
    else:
        s_edge = jnp.zeros((k, W), block.dtype)
        n_edge = jnp.zeros((k, W), block.dtype)

    at_s = (yi == 0) & (xi == 0)
    at_n = (yi == ny - 1) & (xi == nx - 1)
    south = jnp.where(at_s, s_edge, south)
    north = jnp.where(at_n, n_edge, north)
    return jnp.concatenate([south, block, north], axis=0)


def _swap_pole_rows(a, b, k, grid: Grid, mesh: Mesh):
    """In pole-reflected halo rows, 'padded north' is 'sphere south': swap
    an (N, S) coefficient pair there so halo rows' own sweep updates use
    the right neighbor roles (must be called inside shard_map; a, b are
    already halo-padded)."""
    yi = jax.lax.axis_index("y")
    ny = mesh.shape["y"]
    rows = jnp.arange(a.shape[0]).reshape(-1, 1)
    in_south_halo = (rows < k) & (yi == 0) & grid.wrap_south
    in_north_halo = (rows >= a.shape[0] - k) & (yi == ny - 1) \
        & grid.wrap_north
    sw = in_south_halo | in_north_halo
    return jnp.where(sw, b, a), jnp.where(sw, a, b)


def _sweep5(p, cN, cS, cE, cW, cC, b):
    """One folded 5-point sweep on a padded block: plain shifts."""
    pN = jnp.roll(p, -1, 0)
    pS = jnp.roll(p, 1, 0)
    pE = jnp.roll(p, -1, 1)
    pW = jnp.roll(p, 1, 1)
    return cN * pN + cS * pS + cE * pE + cW * pW + cC * p + b


def _overlapped_ksweeps(p_b, k, coeffs, exchange, n_sw=None):
    """k sweeps + halo refresh, decomposed so the halo ppermutes OVERLAP
    interior compute (the north-star requirement).

    ``coeffs``: tuple of (h+2k, w+2k) padded static fields consumed by
    _sweep5 (cN, cS, cE, cW, cC, b).  ``exchange``: closure producing the
    (h+2k, w+2k) padded state (the collectives).  ``n_sw``: optional
    traced sweep quota (sweeps past it freeze — the remainder-round
    logic of the viscosity solver).

    The CENTER region (out rows/cols [2k, h-2k)) needs only p_b's
    interior — no data dependence on the exchanged halos, so XLA's
    latency-hiding scheduler can run the ppermutes while it computes.
    The 2k-deep FRAME recomputes from the padded block.  Identical
    values to the monolithic version: every output cell sees exactly the
    same stencil inputs (the frame/center split only re-partitions which
    intermediate buffers they flow through).

    Falls back to the monolithic order when the block is too small to
    split (h or w < 4k)."""
    h, w = p_b.shape

    def run(block, csl, nsweeps):
        for i in range(nsweeps):
            nxt = _sweep5(block, *csl)
            if n_sw is not None:
                nxt = jnp.where(i < n_sw, nxt, block)
            block = nxt
        return block

    def crop(r0, r1, c0, c1):
        return tuple(c[r0:r1, c0:c1] for c in coeffs)

    pp = exchange(p_b)  # ppermutes touch only p_b's edge slices

    if h < 4 * k or w < 4 * k:
        return run(pp, coeffs, k)[k:-k, k:-k]

    # center: input block rows/cols [k, h-k) = pp[2k:h, 2k:w); after k
    # sweeps the valid interior is out rows/cols [2k, h-2k)
    center = run(p_b[k:h - k, k:w - k], crop(2 * k, h, 2 * k, w), k)
    center = center[k:-k, k:-k]

    # frame strips from the padded block (each keeps its k-shrunk core)
    S = run(pp[0:4 * k, :], crop(0, 4 * k, 0, w + 2 * k), k)[k:3 * k, k:-k]
    N = run(pp[h - 2 * k:h + 2 * k, :],
            crop(h - 2 * k, h + 2 * k, 0, w + 2 * k), k)[k:3 * k, k:-k]
    Wst = run(pp[2 * k:h, 0:4 * k], crop(2 * k, h, 0, 4 * k), k)[k:-k,
                                                                k:3 * k]
    E = run(pp[2 * k:h, w - 2 * k:w + 2 * k],
            crop(2 * k, h, w - 2 * k, w + 2 * k), k)[k:-k, k:3 * k]

    mid = jnp.concatenate([Wst, center, E], axis=1)
    return jnp.concatenate([S, mid, N], axis=0)


@partial(jax.jit, static_argnames=("grid", "mesh", "iters", "k"))
def pressure_solve_sharded(divw, terrain, grid: Grid, mesh: Mesh,
                           iters: int = 5000, k: int = 8):
    """Distributed pressure Poisson solve: K sweeps per K-wide halo
    exchange of p ONLY (coefficients are folded and padded once).

    Same fixpoint as ops.ocean.pressure_solve; transient iterates match
    exactly in the block interiors (halo-deep rings recompute identical
    values because the padded stencil sees the true neighbors).
    """
    from ..pallas_kernels.jacobi import _coefficients

    cN_g, cS_g, cE_g, cW_g, cC_g, b_g = _coefficients(divw, terrain, grid)
    n_rounds = (iters + k - 1) // k

    def body(cN_b, cS_b, cE_b, cW_b, cC_b, b_b):
        # pad the static coefficient fields once
        cN = exchange_halo(cN_b, k, grid, mesh)
        cS = exchange_halo(cS_b, k, grid, mesh)
        cN, cS = _swap_pole_rows(cN, cS, k, grid, mesh)
        cE = exchange_halo(cE_b, k, grid, mesh)
        cW = exchange_halo(cW_b, k, grid, mesh)
        cC = exchange_halo(cC_b, k, grid, mesh)
        bb = exchange_halo(b_b, k, grid, mesh)

        p = jnp.zeros_like(cN_b)
        coeffs = (cN, cS, cE, cW, cC, bb)

        def round_fn(p, _):
            # interior/boundary split: the center's k sweeps have no data
            # dependence on this round's ppermutes (_overlapped_ksweeps)
            p = _overlapped_ksweeps(
                p, k, coeffs, lambda q: exchange_halo(q, k, grid, mesh))
            return p, None

        p, _ = jax.lax.scan(round_fn, p, None, length=n_rounds)
        return p

    fn = shard_map(body, mesh=mesh, in_specs=(_SPEC,) * 6, out_specs=_SPEC)
    return fn(cN_g, cS_g, cE_g, cW_g, cC_g, b_g)


@partial(jax.jit, static_argnames=("grid", "mesh", "iters", "k"))
def diffusion_solve_sharded(u, v, terrain, grid: Grid, mesh: Mesh,
                            iters: int = 50, k: int = 10):
    """Distributed implicit-viscosity solve (intent mode): K sweeps per
    halo exchange of (u, v); coefficients padded once; velocity pole halos
    sign-flipped.  Same fixpoint as ops.ocean.diffusion."""
    from ..pallas_kernels.jacobi import _diffusion_coefficients

    cN_g, cS_g, cE_g, cW_g, cC_g = _diffusion_coefficients(terrain, grid)
    n_rounds = (iters + k - 1) // k
    iters_rem = iters - (n_rounds - 1) * k  # last round runs the remainder

    def body(u_b, v_b, cN_b, cS_b, cE_b, cW_b, cC_b):
        cN = exchange_halo(cN_b, k, grid, mesh)
        cS = exchange_halo(cS_b, k, grid, mesh)
        cN, cS = _swap_pole_rows(cN, cS, k, grid, mesh)
        cE = exchange_halo(cE_b, k, grid, mesh)
        cW = exchange_halo(cW_b, k, grid, mesh)
        cC = exchange_halo(cC_b, k, grid, mesh)
        zb = jnp.zeros_like(cN)
        coeffs = (cN, cS, cE, cW, cC, zb)

        def exch(q):
            return exchange_halo(q, k, grid, mesh, negate_pole=True)

        def round_fn(carry, n_sw):
            # u and v relax independently (intent-mode rhs is per-
            # component), each through the overlapped interior/boundary
            # split; n_sw freezes sweeps past the round's quota exactly
            uu, vv = carry
            uu = _overlapped_ksweeps(uu, k, coeffs, exch, n_sw=n_sw)
            vv = _overlapped_ksweeps(vv, k, coeffs, exch, n_sw=n_sw)
            return (uu, vv), None

        sw_counts = jnp.concatenate([
            jnp.full((n_rounds - 1,), k, jnp.int32),
            jnp.asarray([iters_rem], jnp.int32)])
        (uu, vv), _ = jax.lax.scan(round_fn, (u_b, v_b), sw_counts)
        return uu, vv

    fn = shard_map(body, mesh=mesh, in_specs=(_SPEC,) * 7,
                   out_specs=(_SPEC, _SPEC))
    return fn(u, v, cN_g, cS_g, cE_g, cW_g, cC_g)


@partial(jax.jit, static_argnames=("grid", "mesh", "k", "check_every",
                                   "max_iters"))
def flow_solve_sharded(code, area2d, mouth, grid: Grid, mesh: Mesh,
                       k: int = 16, check_every: int = 1,
                       max_iters: int = 1 << 20):
    """Distributed flow accumulation + mouth reachability: K sweeps of the
    (A, vis) relaxation per K-wide halo exchange; the packed direction
    masks are padded once.  Same fixpoint as ops.flow.flow_solve_stencil
    (the relaxation is monotone from below, so halo rings that go stale
    between exchanges only delay convergence, never corrupt it — the
    convergence test compares full rounds).

    Returns (A, vis bool).
    """
    from ..pallas_kernels.flow import pack_masks, _SCAN_ORDER

    packed_g = pack_masks(code, mouth, grid)
    vis0_g = jnp.where(mouth, 1.0, 0.0)

    def body(packed_b, area_b, vis0_b):
        # flow's y topology clips at the grid edge (no pole wrap): the
        # exchanged pole-cap halo rows carry values, but every cross-pole
        # contribution bit is already masked off in `packed`, so their
        # contents are never read.
        packed = exchange_halo(packed_b, k, grid, mesh)
        area = exchange_halo(area_b, k, grid, mesh)

        def sweep(A, vis):
            newA = area
            newvis = jnp.where((packed & (1 << 16)) != 0, 1.0, 0.0)
            for i, (dx, dy) in enumerate(_SCAN_ORDER):
                Ad = jnp.roll(jnp.roll(A, -dy, 0), -dx, 1)
                vd = jnp.roll(jnp.roll(vis, -dy, 0), -dx, 1)
                newA = newA + jnp.where((packed & (1 << i)) != 0, Ad, 0.0)
                newvis = jnp.maximum(
                    newvis,
                    jnp.where((packed & (1 << (8 + i))) != 0, vd, 0.0))
            return newA, newvis

        def round_fn(carry):
            A, vis, it, _ = carry
            Ap = exchange_halo(A, k, grid, mesh)
            vp = exchange_halo(vis, k, grid, mesh)
            for _ in range(k):
                Ap, vp = sweep(Ap, vp)
            A2 = Ap[k:-k, k:-k]
            v2 = vp[k:-k, k:-k]
            changed = jnp.any((A2 != A) | (v2 != vis))
            # replicated convergence flag (max over shards)
            changed = jax.lax.pmax(jax.lax.pmax(changed, "x"), "y")
            return A2, v2, it + k, changed

        def cond(carry):
            _, _, it, changed = carry
            return changed & (it < max_iters)

        A, vis, _, _ = jax.lax.while_loop(
            cond, round_fn,
            (area_b, vis0_b, jnp.int32(0), jnp.asarray(True)))
        return A, vis

    fn = shard_map(body, mesh=mesh, in_specs=(_SPEC,) * 3,
                   out_specs=(_SPEC, _SPEC))
    A, vis = fn(packed_g, area2d, vis0_g)
    return A, vis > 0.5
