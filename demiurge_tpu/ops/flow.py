"""Flow routing, lake solving, and upstream flow accumulation.

Re-architects the reference FlowFilter (src/filter/FlowFilter.cpp) for TPU:

Reference pipeline (hybrid GPU passes + CPU threadpool recursion):
  1. pre-blur heights (FlowFilter.cpp:89-103)
  2. GPU "magic numbers": per-pixel D8 direction = aspect-quantized with
     value-noise tie-break, falling back to steepest descent
     (FlowFilter.cpp:109-259)
  3. GPU incoming-neighbor bitmask inversion (FlowFilter.cpp:268-310)
  4. CPU: lake indexing + basin flood fill (FlowFilter.cpp:322-398)
  5. GPU basin-border pass + CPU saddle (lowest pass) search
     (FlowFilter.cpp:400-531)
  6. CPU: global lowest-pass merge into a drainage tree
     (FlowFilter.cpp:533-595)
  7. CPU: recursive upstream accumulation, discharge = (sum of upstream
     cos-weighted cell areas)^exponent; optional lake fill
     (FlowFilter.cpp:597-717)

TPU-native design:
  - steps 1-3 are fused jitted array passes (`flow_directions`).
  - step 7's recursion becomes **pointer-doubling accumulation**: K =
    ceil(log2(N)) rounds of scatter-add deliver every cell's area to all of
    its downstream ancestors exactly (`accumulate`).  Root/visited resolution
    is the same doubling on the parent pointers.  This runs entirely on
    device and is exact for arbitrary flow-path lengths.
  - steps 4-6 are an irregular graph problem over the (few) lakes; they run
    on host (`solve_lakes` — NumPy reference implementation here, C++
    accelerated version in demiurge_tpu/native) and yield (a) extra parent
    edges attaching each lake's sink to its spill point and (b) a per-sink
    lake waterheight used to zero flooded cells.

Faithful quirks kept (documented):
  - the direction pass runs with the reference's "coordsMod" hack
    (FlowFilter.cpp:253-256): cornerCoords shrunk by 1e-3 so pole wrap is
    disabled during direction finding.
  - the incoming-mask pass runs with *normal* coords (pole wrap active), but
    the CPU-side traversal drops out-of-range rows; pole-crossing incoming
    bits therefore never contribute, which the parent-pointer formulation
    reproduces by construction.
  - cell area uses the latitude of the row's *lower edge*
    (FlowFilter.cpp:608-613).
  - solvingConnections' seed loop skips passes whose source-lake *pixel
    index* has bit 10 set (`Nthbit(c.from,10)`, FlowFilter.cpp:544) — as
    written in the reference, this tests the index, not the magic number.
"""

from __future__ import annotations

import dataclasses
import heapq
import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core.stencils import get_aspect
from ..core.topology import CODE_DIR, DIR_CODE, shift
from .blur import blur

PI = math.pi

#: scan order of the steepest-descent fallback (FlowFilter.cpp:181-236)
_SCAN_ORDER = ((1, 1), (0, 1), (-1, 1), (1, 0), (-1, 0), (1, -1), (0, -1), (-1, -1))


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    preblur: float = 0.5          # FlowfilterMenu default / cpufilter value
    exponent: float = 0.5         # FlowfilterMenu 'Exponent'
    lakes: bool = True            # lakeflag
    area_scale: float = 1e-5      # FlowFilter.cpp:613


# ---------------------------------------------------------------------------
# value-noise tie break hash (FlowFilter.cpp:114-131)
# ---------------------------------------------------------------------------


def _hash2(px, py):
    px = 50.0 * _fract(px * 0.3183099 + 0.71)
    py = 50.0 * _fract(py * 0.3183099 + 0.113)
    return -1.0 + 2.0 * _fract(px * py * (px + py))


def _fract(x):
    return x - jnp.floor(x)


def tie_break_noise(grid: Grid):
    """q = noise(st*resolution*2)*0.5+0.5 (FlowFilter.cpp:151).

    st*resolution*2 lands exactly on integer lattice points (2c+1, 2r+1), so
    the value noise reduces to the raw hash at those integers.
    """
    c = jnp.arange(grid.width, dtype=jnp.float32).reshape(1, -1)
    r = jnp.arange(grid.height, dtype=jnp.float32).reshape(-1, 1)
    px = jnp.broadcast_to(2 * c + 1, grid.shape)
    py = jnp.broadcast_to(2 * r + 1, grid.shape)
    return _hash2(px, py) * 0.5 + 0.5


# ---------------------------------------------------------------------------
# direction + incoming mask passes (device)
# ---------------------------------------------------------------------------


def _coords_mod_grid(grid: Grid) -> Grid:
    """The reference's pole-wrap-disabling coords hack (FlowFilter.cpp:253-256)."""
    y0, y1, x0, x1 = grid.coords
    return dataclasses.replace(grid, coords=(y0 + 1e-3, y1 - 1e-3, x0, x1))


@partial(jax.jit, static_argnames=("grid",))
def flow_directions(height_blurred, sel, grid: Grid):
    """The 'magic numbers' direction pass (FlowFilter.cpp:109-259).

    Returns int32 direction codes: 0 = not interesting (ocean/unselected),
    1-9 keypad direction (5 = sink).
    """
    gmod = _coords_mod_grid(grid)
    a = height_blurred
    interesting = (a > 0.0) & (sel != 0.0)

    aspect = get_aspect(a, gmod)
    lower = jnp.floor(aspect / (2 * PI) * 8) / 8 * (2 * PI)
    upper = jnp.ceil(aspect / (2 * PI) * 8) / 8 * (2 * PI)
    prob = jnp.abs(aspect - lower) / PI * 4
    q = tie_break_noise(grid)
    asp = jnp.where(q < prob, upper, lower)

    dirx = jnp.round(jnp.cos(asp)).astype(jnp.int32)
    diry = -jnp.round(jnp.sin(asp)).astype(jnp.int32)

    code = jnp.full(grid.shape, 5, jnp.int32)
    for (dx, dy), c in DIR_CODE.items():
        if (dx, dy) == (0, 0):
            continue
        code = jnp.where((dirx == dx) & (diry == dy), c, code)

    # neighbor heights/sel at all 8 offsets (coordsMod wrap: pole wrap off)
    nh = {d: shift(a, d[0], d[1], gmod) for d in _SCAN_ORDER}
    ns = {d: shift(sel, d[0], d[1], gmod) for d in _SCAN_ORDER}

    # aspect-chosen neighbor
    a2 = jnp.full_like(a, jnp.inf)
    s2 = jnp.ones_like(a)
    for d in _SCAN_ORDER:
        m = (dirx == d[0]) & (diry == d[1])
        a2 = jnp.where(m, nh[d], a2)
        s2 = jnp.where(m, ns[d], s2)

    aspect_code = code
    aspect_code = jnp.where((a2 <= 0.0) | (s2 == 0.0), 5, aspect_code)
    take_aspect = a2 < a  # FlowFilter.cpp:176 'if (a2<a) return'

    # steepest-descent fallback scan (FlowFilter.cpp:178-242)
    best_code = jnp.full(grid.shape, 5, jnp.int32)
    best_a = a
    best_s = jnp.ones_like(a)
    for d in _SCAN_ORDER:
        better = nh[d] < best_a
        best_code = jnp.where(better, DIR_CODE[d], best_code)
        best_s = jnp.where(better, ns[d], best_s)
        best_a = jnp.where(better, nh[d], best_a)
    scan_code = jnp.where((best_a <= 0.0) | (best_s == 0.0), 5, best_code)

    code = jnp.where(take_aspect, aspect_code, scan_code)
    return jnp.where(interesting, code, 0)


@partial(jax.jit, static_argnames=("grid",))
def incoming_mask(code, grid: Grid):
    """Incoming-neighbor bitmask + flags (FlowFilter.cpp:268-310).

    Returns (mask int32 bits1..9 with bit5=self-sink, mouth bool,
    interesting bool).  Sampled with normal coords (pole wrap active), like
    the reference's second pass.
    """
    interesting = code > 0
    codef = code  # int32

    mask = jnp.zeros(grid.shape, jnp.int32)
    # bit k set if the neighbor at CODE_DIR[k-offset] flows into this pixel
    spec = [  # (offset to neighbor, code the neighbor must have, bit value)
        ((1, 1), 1, 256),
        ((0, 1), 2, 128),
        ((-1, 1), 3, 64),
        ((1, 0), 4, 32),
        ((-1, 0), 6, 8),
        ((1, -1), 7, 4),
        ((0, -1), 8, 2),
        ((-1, -1), 9, 1),
    ]
    mouth = jnp.zeros(grid.shape, bool)
    for (dx, dy), want, bit in spec:
        ncode = shift(codef, dx, dy, grid)
        mask = mask + jnp.where(ncode == want, bit, 0)
        mouth = mouth | (ncode == 0)
    mask = mask + jnp.where(code == 5, 16, 0)
    mouth = mouth & interesting
    return mask, mouth, interesting


# ---------------------------------------------------------------------------
# parent pointers + pointer-doubling accumulation (device)
# ---------------------------------------------------------------------------


def _parent_from_code(code_np: np.ndarray, grid: Grid) -> np.ndarray:
    """Flattened downstream-parent index per cell; -1 = no parent (sink,
    uninteresting, or target out of range — matching the CPU neighbours()
    clipping, FlowFilter.cpp:39-75: x wraps iff full globe, y clips)."""
    H, W = code_np.shape
    wrap = abs(grid.lam1 - grid.lam0) > 2 * PI - 1e-4
    r, c = np.mgrid[0:H, 0:W]
    parent = np.full((H, W), -1, np.int64)
    for codeval, (dx, dy) in CODE_DIR.items():
        if codeval == 5:
            continue
        m = code_np == codeval
        nc = c + dx
        nr = r + dy
        if wrap:
            nc = (nc + W) % W
            okx = np.ones_like(m)
        else:
            okx = (nc >= 0) & (nc < W)
        oky = (nr >= 0) & (nr < H)
        ok = m & okx & oky
        parent[ok] = (nr[ok] * W + np.clip(nc[ok], 0, W - 1))
    return parent.reshape(-1)


def parent_pointers(code, grid: Grid):
    """jnp wrapper: downstream parent index (-1 none) per flattened cell."""
    H, W = grid.shape
    wrap = abs(grid.lam1 - grid.lam0) > 2 * PI - 1e-4
    r = jnp.arange(H, dtype=jnp.int32).reshape(-1, 1)
    c = jnp.arange(W, dtype=jnp.int32).reshape(1, -1)
    parent = jnp.full(grid.shape, -1, jnp.int32)
    for codeval, (dx, dy) in CODE_DIR.items():
        if codeval == 5:
            continue
        m = code == codeval
        nc = c + dx
        nr = r + dy
        if wrap:
            nc = (nc + W) % W
            ok = (nr >= 0) & (nr < H)
        else:
            ok = (nc >= 0) & (nc < W) & (nr >= 0) & (nr < H)
        tgt = nr * W + jnp.clip(nc, 0, W - 1)
        parent = jnp.where(m & ok, tgt, parent)
    return parent.reshape(-1)


def cell_area_lower_edge(grid: Grid, scale: float = 1e-5):
    """Per-cell area with phi at the row *lower edge* (FlowFilter.cpp:607-613)."""
    H, W = grid.shape
    y = jnp.arange(H, dtype=jnp.float32).reshape(-1, 1) / H
    geoy = y * (grid.phi1 - grid.phi0) + grid.phi0
    pwx = grid.circumference * (grid.lam1 - grid.lam0) / (2 * PI) / W
    pwy = grid.circumference * (grid.phi1 - grid.phi0) / (2 * PI) / H
    # cos clamped to >=0: at the exact pole edge float32 cos(pi/2) is ~-4e-8,
    # which in the reference feeds powf(negative, exponent) -> NaN flow at
    # the pole row (latent reference bug); clamping keeps the area formula
    # identical elsewhere and makes pole-row areas ~0 as intended.
    area = pwy * pwx * jnp.maximum(jnp.cos(geoy), 0.0) * scale
    return jnp.broadcast_to(area, grid.shape)


def _doubling_rounds(n: int) -> int:
    return max(1, int(math.ceil(math.log2(max(n, 2)))))


@partial(jax.jit, static_argnames=("nrounds",))
def accumulate(parent, area_flat, nrounds: int):
    """Exact upstream accumulation by pointer doubling.

    parent: (N,) int32, -1 = root/no parent.  area_flat: (N,) float32.
    Returns acc (N,) where acc[p] = area[p] + sum of area over all cells
    whose downstream path reaches p.

    Invariant at round k: A[q] = sum of areas of cells within graph distance
    2^k - 1 upstream of q (incl. q); ptr[q] = 2^k-th downstream ancestor
    where alive[q] says it exists at exactly that distance.  Each round
    scatters A over ptr, then squares the pointers.  ceil(log2(N)) rounds
    cover any possible path length.
    """
    N = parent.shape[0]
    A = area_flat
    has = parent >= 0
    ptr = jnp.where(has, parent, 0)
    alive = has

    def round_fn(carry, _):
        A, ptr, alive = carry
        contrib = jnp.where(alive, A, 0.0)
        tgt = jnp.where(alive, ptr, N)  # N = drop bucket
        A = A + jnp.zeros_like(A).at[tgt].add(contrib, mode="drop")
        nxt_alive = alive & alive[ptr]
        ptr = jnp.where(nxt_alive, ptr[ptr], ptr)
        return (A, ptr, nxt_alive), None

    (A, _, _), _ = jax.lax.scan(round_fn, (A, ptr, alive), None, length=nrounds)
    return A


def _incoming_fields(code, grid: Grid):
    """For each of the 8 directions d (offset from a cell to its upstream
    neighbor), a boolean field 'the neighbor at d flows into me', with the
    same in-range semantics as the CPU traversal (x wraps iff full globe,
    y edges drop — FlowFilter.cpp:39-75)."""
    H, W = grid.shape
    wrap = abs(grid.lam1 - grid.lam0) > 2 * PI - 1e-4
    fields = []
    for (dx, dy) in _SCAN_ORDER:
        back = DIR_CODE[(-dx, -dy)]
        ncode = shift(code, dx, dy, grid, pole_wrap=False)
        ok = ncode == back
        # drop out-of-range rows (y clips, never pole-wraps on the CPU side)
        if dy > 0:
            ok = ok & (jnp.arange(H).reshape(-1, 1) < H - dy)
        elif dy < 0:
            ok = ok & (jnp.arange(H).reshape(-1, 1) >= -dy)
        if not wrap and dx != 0:
            if dx > 0:
                ok = ok & (jnp.arange(W).reshape(1, -1) < W - dx)
            else:
                ok = ok & (jnp.arange(W).reshape(1, -1) >= -dx)
        fields.append(((dx, dy), ok))
    return fields


@partial(jax.jit, static_argnames=("grid", "check_every", "max_iters",
                                   "want_root"))
def flow_solve_stencil(code, area2d, mouth, grid: Grid,
                       conn_from=None, conn_to=None,
                       check_every: int = 64, max_iters: int = 1 << 30,
                       want_root: bool = False):
    """Exact flow accumulation + mouth-reachability (+ basin root) by
    fused stencil relaxation.

    Iterates to fixpoint:
      A       <- area + sum_d incoming_d * shift(A, d)        (upstream sum)
      visited <- mouth | downstream-neighbor visited           (reachability)
      root    <- self where sink else downstream root          (basin id)
    Each sweep is a fused 8-neighbor stencil (no gather/scatter on the hot
    path), so it runs at HBM speed; convergence takes longest-flow-path
    iterations, checked every ``check_every`` sweeps.  Optional lake
    connection edges (lake sink -> attach pixel, from the host solver) are
    applied as a small per-sweep scatter, which extends both the
    accumulation and the reachability through merged lakes.

    Same fixpoint as pointer-doubling :func:`accumulate`; float32 summation
    order differs from the reference's recursive DFS (allclose).
    """
    H, W = grid.shape
    inc = _incoming_fields(code, grid)
    has_conns = conn_from is not None and conn_from.shape[0] > 0

    # downstream-selection masks: which direction each cell's code points to,
    # masked to in-range rows (the CPU traversal clips y, FlowFilter.cpp:
    # 39-75; without the mask a clamped diagonal shift at the grid edge
    # would read the east/west neighbor's visited flag)
    rows_idx = jnp.arange(H).reshape(-1, 1)

    def _rowmask(dy):
        if dy > 0:
            return rows_idx < H - dy
        if dy < 0:
            return rows_idx >= -dy
        return jnp.ones((H, 1), bool)

    out_masks = [(CODE_DIR[c], (code == c) & _rowmask(CODE_DIR[c][1]))
                 for c in range(1, 10) if c != 5]
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    sink = code == 5

    def sweep(carry):
        A, vis, root = carry
        newA = area2d
        for (dx, dy), ok in inc:
            newA = newA + jnp.where(
                ok, shift(A, dx, dy, grid, pole_wrap=False), 0.0)
        # visited/root flow *downstream->upstream*: take the value of the
        # cell my code points to
        newvis = mouth
        newroot = jnp.where(sink, idx, -1) if want_root else root
        for (dx, dy), m in out_masks:
            down_vis = shift(vis, dx, dy, grid, pole_wrap=False)
            newvis = newvis | (m & down_vis)
            if want_root:
                down_root = shift(root, dx, dy, grid, pole_wrap=False)
                newroot = jnp.where(m, down_root, newroot)
        if has_conns:
            fA = newA.reshape(-1)
            fA = fA.at[conn_to].add(A.reshape(-1)[conn_from])
            newA = fA.reshape(H, W)
            fv = newvis.reshape(-1)
            # conn_from indices are unique (each lake placed once), so a
            # scatter-set of the OR is safe for bool dtype
            fv = fv.at[conn_from].set(fv[conn_from] | vis.reshape(-1)[conn_to])
            newvis = fv.reshape(H, W)
        return newA, newvis, newroot

    def body(carry):
        (A, vis, root), _, it = carry
        prev = A
        prev_v = vis
        # fori_loop (not Python unroll): keeps the while-body HLO small —
        # compile time scales with ONE sweep, not check_every of them.
        A, vis, root = jax.lax.fori_loop(
            0, check_every, lambda _, c: sweep(c), (A, vis, root))
        done = jnp.all(A == prev) & jnp.all(vis == prev_v)
        return (A, vis, root), done, it + check_every

    def cond(carry):
        _, done, it = carry
        return (~done) & (it < max_iters)

    root0 = jnp.where(sink, idx, -1) if want_root else jnp.zeros((1, 1), jnp.int32)
    state0 = (area2d, mouth, root0)
    (A, vis, root), _, _ = jax.lax.while_loop(
        cond, body, (state0, jnp.asarray(False), 0))
    return A, vis, root


@partial(jax.jit, static_argnames=("nrounds",))
def resolve_roots(parent, nrounds: int):
    """Root (terminal downstream) index of every cell by pointer doubling."""
    has = parent >= 0
    idx = jnp.arange(parent.shape[0], dtype=parent.dtype)
    ptr = jnp.where(has, parent, idx)

    def round_fn(ptr, _):
        return ptr[ptr], None

    ptr, _ = jax.lax.scan(round_fn, ptr, None, length=nrounds)
    return ptr


# ---------------------------------------------------------------------------
# host lake-graph solver (steps 4-6) — NumPy reference implementation
# ---------------------------------------------------------------------------


class LakeSolution(NamedTuple):
    conn_from: np.ndarray   # (C,) lake sink index
    conn_to: np.ndarray     # (C,) attach pixel index (pass location)
    conn_h: np.ndarray      # (C,) pass height
    lake_wh: np.ndarray     # (N,) waterheight threshold keyed by sink index
                            #      (NaN where not a sink / not flooded)


_NEIGHBOR_BITS = [  # (bit value, offset) of incoming-mask bits 1..9 minus 5
    (1, (-1, -1)),
    (2, (0, -1)),
    (4, (1, -1)),
    (8, (-1, 0)),
    (32, (1, 0)),
    (64, (-1, 1)),
    (128, (0, 1)),
    (256, (1, 1)),
]


def _upstream_neighbors(i, mask, W, H, wrap):
    """CPU neighbours() (FlowFilter.cpp:39-75): cells flowing into i."""
    out = []
    m = int(mask[i])
    x = i % W
    y = i // W
    for bit, (dx, dy) in _NEIGHBOR_BITS:
        if not (m & bit):
            continue
        nx = x + dx
        if wrap:
            nx = (nx + W) % W
        elif nx < 0 or nx >= W:
            continue
        ny = y + dy
        if ny < 0 or ny >= H:
            continue
        out.append(ny * W + nx)
    return out


def solve_lakes_numpy(mask, mouth, height, parent, grid: Grid) -> LakeSolution:
    """Steps 4-6 of the reference pipeline, host-side (NumPy).

    mask: (N,) int incoming bitmask; mouth: (N,) bool; height: (N,) original
    (unblurred) heights; parent: (N,) downstream pointers.
    """
    H, W = grid.shape
    N = H * W
    wrap = abs(grid.lam1 - grid.lam0) > 2 * PI - 1e-4

    mask = np.asarray(mask).reshape(-1)
    mouth = np.asarray(mouth).reshape(-1)
    height = np.asarray(height).reshape(-1)

    sinks = np.nonzero((mask & 16) != 0)[0]
    lake_sinks = sinks  # all sinks incl. mouths (reference indexLakes)

    # --- basin flood fill (assignLakeIds, FlowFilter.cpp:360-398)
    basin = np.full(N, -1, np.int64)
    for s in lake_sinks:
        stack = [s]
        while stack:
            p = stack.pop()
            basin[p] = s
            stack.extend(_upstream_neighbors(p, mask, W, H, wrap))

    # --- border pixels + lowest passes (findAllConnections, 400-531)
    # border bitmask: neighbor in a different valid basin
    passes: dict = {}  # sink -> list of (h, from_sink, tolocation)
    offs = [(dx, dy) for _, (dx, dy) in _NEIGHBOR_BITS]
    for s in lake_sinks:
        newpasses: dict = {}
        stack = [s]
        while stack:
            p = stack.pop()
            x, y = p % W, p // W
            # find neighboring different-basin pixels
            minpass = np.inf
            nlake_pix = -1
            for (dx, dy) in offs:
                nx = x + dx
                if wrap:
                    nx = (nx + W) % W
                elif nx < 0 or nx >= W:
                    continue
                ny = y + dy
                if ny < 0 or ny >= H:
                    continue
                n = ny * W + nx
                if basin[n] >= 0 and basin[n] != s:
                    bd = height[n]
                    if bd > 0 and bd < minpass:
                        minpass = bd
                        nlake_pix = n
            if nlake_pix >= 0:
                lid = basin[nlake_pix]
                if not mouth[lid]:  # skip passes into river-mouth basins
                    nheight = max(minpass, height[p])
                    if lid not in newpasses or nheight < newpasses[lid][0]:
                        newpasses[lid] = (nheight, lid, p)
            stack.extend(_upstream_neighbors(p, mask, W, H, wrap))
        passes[s] = sorted(newpasses.values())  # by h (set<pass, comp by h>)

    # --- global merge (solvingConnections, 533-595)
    placed = set()
    candidates: list = []  # heap of (h, from, to)
    conns: dict = {}       # tolocation -> (h, from, to)

    def push_next(lake):
        lst = passes.get(lake)
        if lst is None:
            return
        while lst:
            c = lst.pop(0)
            if c[1] in placed:
                continue
            heapq.heappush(candidates, c)
            break

    for s in lake_sinks:
        if not mouth[s]:
            continue
        placed.add(s)
        lst = passes.get(s, [])
        while lst:
            c = lst.pop(0)
            if c[1] in placed:
                continue
            # reference as-written: tests bit 10 of the *index* (cpp:544)
            if int(c[1]) & (1 << 9):
                continue
            heapq.heappush(candidates, c)
            break

    while candidates:
        h, frm, to = heapq.heappop(candidates)
        if frm in placed:
            push_next(basin[to])
        else:
            placed.add(frm)
            conns[to] = (h, frm, to)
            push_next(frm)
            push_next(basin[to])

    conn_to = np.array(sorted(conns.keys()), np.int64)
    conn_from = np.array([conns[t][1] for t in conn_to], np.int64)
    conn_h = np.array([conns[t][0] for t in conn_to], np.float32)

    # --- lake waterheights (lakefill recursion, 651-695): per-basin scalar
    lake_wh = np.full(N, np.nan, np.float32)
    # connections grouped by the basin their attach point lives in
    by_basin: dict = {}
    for t in conns:
        by_basin.setdefault(int(basin[t]), []).append(conns[t])
    stack2 = [(int(s), 0.0) for s in lake_sinks if mouth[s]]
    while stack2:
        s, wh = stack2.pop()
        lake_wh[s] = wh
        for (h, frm, to) in by_basin.get(s, []):
            nwh = wh if wh > h else h
            stack2.append((int(frm), float(nwh)))

    return LakeSolution(conn_from, conn_to, conn_h, lake_wh)


@partial(jax.jit, static_argnames=("grid", "exponent", "preblur", "mesh",
                                   "return_acc"))
def flow_filter_device(height, sel, grid: Grid, exponent: float = 0.5,
                       preblur: float = 0.5, mesh=None, acc0=None,
                       return_acc: bool = False):
    """Fully-jittable flow accumulation without the host lake-merge stage.

    Identical to :func:`flow_filter` with ``lakes=False`` except that
    endorheic basins (interior sinks) simply do not drain — their cells keep
    -1 exactly like the reference's unvisited cells.  This is the path used
    inside fused/distributed step functions where a host round-trip is not
    acceptable; the full filter with lake solving remains available for the
    editing API.

    ``acc0``: optional warm start for the accumulation relaxation (the
    previous step's fixpoint — see flow_solve_pallas); the fixpoint is
    unique so the result is unchanged, only convergence is faster.
    ``return_acc=True`` additionally returns the raw accumulation for
    carrying across steps.
    """
    hb = blur(height, grid, preblur)
    from ..core.platform import single_core_pallas as _scp

    if mesh is None and _scp():
        from ..pallas_kernels.directions import (directions_supported,
                                                 flow_directions_pallas)

        if directions_supported(grid):
            # fused band-resident direction pass (2 reads + 1 int write of
            # HBM); aspect-quantization knife-edge ties can resolve
            # differently than the XLA pass at isolated pixels (separately
            # compiled trig/fusion rounds 1 ulp apart — both drainage
            # resolutions valid; pallas_kernels/directions.py)
            code = flow_directions_pallas(hb, sel, grid)
        else:
            code = flow_directions(hb, sel, grid)
    else:
        code = flow_directions(hb, sel, grid)
    _, mouth, interesting = incoming_mask(code, grid)
    area = cell_area_lower_edge(grid)

    if mesh is not None and grid.wrap_x:
        from ..dist.flowdist import (flow_sharded_twolevel_supported,
                                     flow_solve_sharded_twolevel)

        if flow_sharded_twolevel_supported(grid, mesh):
            # two-level decomposition: a FIXED handful of collectives
            # (all_to_all row regroup + boundary-row gathers) instead of
            # one halo exchange per relaxation round (dist/flowdist.py)
            acc, vis = flow_solve_sharded_twolevel(code, area, mouth,
                                                   grid, mesh)
        else:
            from ..dist.halo import flow_solve_sharded

            acc, vis = flow_solve_sharded(code, area, mouth, grid, mesh)
        out = jnp.where(vis, jnp.power(acc, exponent), -1.0)
        return (out, acc) if return_acc else out

    from ..core.platform import single_core_pallas

    if single_core_pallas():
        from ..pallas_kernels.flow import (flow_solve_pallas,
                                           flow_solve_supported)

        # SPLIT solve: A (upstream sums, converges downstream) and vis
        # (mouth reachability, converges upstream) as two independent
        # solves.  Their convergence waves travel in opposite directions
        # along a river, so the joint banded solve keeps the union of both
        # wavefronts' bands active every round — splitting measures 2.1x
        # faster (tools/flow_tune.py).  The boolean vis half additionally
        # bit-packs 32 rows per uint32 lane and solves in one VMEM-resident
        # launch (pallas_kernels.visbits): 0.5 ms vs 7.0 ms for the f32
        # banded vis at an evolved 2048x1024 state (14x).
        if flow_solve_supported(grid):
            from ..pallas_kernels.visbits import (vis_bits_supported,
                                                   vis_solve_bits)

            H = grid.height
            acc, _ = flow_solve_pallas(code, area, mouth, grid, k=8,
                                       band=64 if H % 64 == 0 else 0,
                                       mode="A", a0=acc0)
            if vis_bits_supported(grid):
                vis = vis_solve_bits(code, mouth, grid)
            else:
                _, vis = flow_solve_pallas(code, area, mouth, grid, k=8,
                                           mode="vis")
            out = jnp.where(vis, jnp.power(acc, exponent), -1.0)
            return (out, acc) if return_acc else out

    acc, vis, _ = flow_solve_stencil(code, area, mouth, grid)
    out = jnp.where(vis, jnp.power(acc, exponent), -1.0)
    return (out, acc) if return_acc else out


def default_lake_solver():
    """Native C++ solver when buildable, NumPy reference otherwise."""
    try:
        from ..native import native_available, solve_lakes_native

        if native_available():
            return solve_lakes_native
    except Exception:
        pass
    return solve_lakes_numpy


# ---------------------------------------------------------------------------
# full filter
# ---------------------------------------------------------------------------


def flow_filter(height, sel, grid: Grid, cfg: FlowConfig = FlowConfig(),
                lake_solver=None):
    """Full FlowFilter: returns the flow/discharge map that the reference
    writes over the terrain (FlowFilter.cpp:719-786).

    Cells never visited from a river mouth keep -1 (the reference's lakeID
    initialization); flooded lake cells are 0; everything else is
    (upstream area sum)^exponent.
    """
    if lake_solver is None:
        lake_solver = default_lake_solver()
    H, W = grid.shape

    hb = blur(height, grid, cfg.preblur)
    code = flow_directions(hb, sel, grid)
    mask, mouth, interesting = incoming_mask(code, grid)
    parent = parent_pointers(code, grid)

    # host lake solve (irregular, small)
    mask_np = np.asarray(mask).reshape(-1)
    mouth_np = np.asarray(mouth).reshape(-1)
    height_np = np.asarray(height).reshape(-1)
    parent_np = np.asarray(parent)

    sol = lake_solver(mask_np, mouth_np, height_np, parent_np, grid)

    conn_from = jnp.asarray(sol.conn_from, jnp.int32)
    conn_to = jnp.asarray(sol.conn_to, jnp.int32)

    area = cell_area_lower_edge(grid, cfg.area_scale)
    acc, vis, root = flow_solve_stencil(
        code, area, mouth, grid,
        conn_from=conn_from, conn_to=conn_to, want_root=cfg.lakes)

    flow = jnp.where(vis, jnp.power(acc, cfg.exponent), -1.0)

    if cfg.lakes:
        wh = jnp.asarray(np.nan_to_num(sol.lake_wh, nan=-np.inf))
        cell_wh = jnp.where(root.reshape(-1) >= 0,
                            wh[jnp.maximum(root.reshape(-1), 0)],
                            -np.inf).reshape(H, W)
        flooded = vis & (height <= cell_wh)
        flow = jnp.where(flooded, 0.0, flow)

    return flow
