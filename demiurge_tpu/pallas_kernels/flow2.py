"""Two-level flow accumulation: band-local fixpoints + contracted
inter-band drainage graph.

The single-level banded relaxation (pallas_kernels.flow.flow_solve_pallas)
converges in longest-global-flow-path sweeps: every round, each active band
re-relaxes so mass can cross one more band boundary — the convergence tail
is the handful of long rivers, re-swept over and over.  The reference's
CPU recursion (src/filter/FlowFilter.cpp:597-717) never pays this because
pointer-chasing resolves each cell once; TPU gathers make a literal
translation hopeless (measured 970 ms vs ~7 ms, docs/PERF.md).

This module restructures the solve so cost stops scaling with the longest
*global* path.  D8 flow is a forest — each cell has exactly one downstream
parent — so mass injected anywhere in a band follows ONE in-band path and
exits through at most ONE band-boundary crossing.  That turns the
inter-band problem into a tiny functional graph on boundary-row cells:

  phase 1 (Pallas, one launch, no halos): every band solves its LOCAL
    fixpoint — A_loc (upstream sums from in-band sources only; cross-band
    incoming bits are pre-masked off) and `exit` (the id of the crossing
    edge the cell's in-band path leaves through, or -1 if it terminates
    in-band).  Bands are independent; each runs to its own fixpoint with
    a per-band early-exit while loop (longest IN-band path sweeps, not
    global).

  phase 2 (XLA, 2*nbands*W elements ~ 1/band of the grid): for each
    crossing edge s (a boundary-row cell whose code points out of its
    band), succ(s) = exit[parent(s)] — the next crossing its mass reaches
    — and m0(s) = A_loc[s].  The true mass through s is the chain sum
    X(s) = m0(s) + sum over chain predecessors, computed by adaptive
    pointer doubling (the graph is acyclic: flow follows strictly
    decreasing height).  Gathers are fine HERE because the coarse problem
    is two rows per band, not the whole grid.

  phase 3 (Pallas): deliver X(s) at each crossing target as extra area
    and re-run the band-local solve warm-started at A_loc + inj (the
    iterates stay monotone from below, so the early exit still certifies
    the fixpoint).  By linearity of A = area + sum_d inc_d * A_d, the
    result equals the global fixpoint restricted to each band.

Equivalence to ops.flow.flow_solve_stencil's A half is exact up to f32
summation order (the chain sums reassociate additions).  The vis
(reachability) half is solved elsewhere (pallas_kernels.visbits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.grid import Grid
from .flow import _SCAN_ORDER, _pick_band, pack_masks

# _SCAN_ORDER indices by the row offset of the downstream target
_DY_POS = (0, 1, 2)   # (1,1),(0,1),(-1,1): parent at row r+1
_DY_NEG = (5, 6, 7)   # (1,-1),(0,-1),(-1,-1): parent at row r-1


def mask_local(packed, band: int):
    """Clear incoming bits that reach across a band boundary: inc bit i
    refers to the upstream neighbor at row r + dy_i, so the first local row
    must drop dy=-1 bits and the last local row dy=+1 bits."""
    H = packed.shape[0]
    rl = jnp.arange(H).reshape(-1, 1) % band
    first = rl == 0
    last = rl == band - 1
    neg = sum(1 << i for i in _DY_NEG)
    pos = sum(1 << i for i in _DY_POS)
    packed = jnp.where(first, packed & ~neg, packed)
    packed = jnp.where(last, packed & ~pos, packed)
    return packed


def _local_kernel(band, W, with_exit, max_sweeps, pref, areref, a0ref,
                  aout, *eout):
    """One band's full local solve (see module docstring).  Exit ids are
    band-local: side*W + col with side 0 = exits through the first row
    (toward band b-1), 1 = through the last row."""
    packed = pref[...]
    area = areref[...]
    inc = [((packed >> i) & 1).astype(jnp.float32) for i in range(8)]
    if with_exit:
        outm = [((packed >> (8 + i)) & 1).astype(jnp.float32)
                for i in range(8)]
        row_l = jax.lax.broadcasted_iota(jnp.int32, (band, W), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (band, W), 1)
        dn = outm[_DY_POS[0]] + outm[_DY_POS[1]] + outm[_DY_POS[2]]
        up = outm[_DY_NEG[0]] + outm[_DY_NEG[1]] + outm[_DY_NEG[2]]
        crossing = (jnp.where(row_l == 0, up, 0.0)
                    + jnp.where(row_l == band - 1, dn, 0.0))
        selfid = jnp.where(row_l == 0, col, W + col).astype(jnp.float32)
        e0 = jnp.where(crossing > 0, selfid, -1.0)
    else:
        e0 = jnp.zeros((1, 1), jnp.float32)

    def apply_sweep(A, E):
        Aslab = {dy: pltpu.roll(A, (-dy) % band, 0) if dy else A
                 for dy in (-1, 0, 1)}
        newA = area
        if with_exit:
            Eslab = {dy: pltpu.roll(E, (-dy) % band, 0) if dy else E
                     for dy in (-1, 0, 1)}
            newE = jnp.zeros((band, W), jnp.float32)
        else:
            newE = E
        for i, (dx, dy) in enumerate(_SCAN_ORDER):
            Ad = Aslab[dy]
            if dx:
                Ad = pltpu.roll(Ad, (-dx) % W, 1)
            newA = newA + inc[i] * Ad
            if with_exit:
                Ed = Eslab[dy]
                if dx:
                    Ed = pltpu.roll(Ed, (-dx) % W, 1)
                # exactly one out bit per cell: sum(out_i * (E_d + 1)) - 1
                # is E of the downstream cell, or -1 with no out bit
                newE = newE + outm[i] * (Ed + 1.0)
        if with_exit:
            newE = newE - 1.0
            newE = jnp.where(crossing > 0, selfid, newE)
        return newA, newE

    def sweep2(carry):
        A, E, s, _ = carry
        A1, E1 = apply_sweep(A, E)
        A2, E2 = apply_sweep(A1, E1)
        done = jnp.all(A2 == A1)
        if with_exit:
            done = done & jnp.all(E2 == E1)
        return A2, E2, s + 2, done

    def cond(carry):
        _, _, s, done = carry
        return jnp.logical_not(done) & (s < max_sweeps)

    A, E, _, _ = jax.lax.while_loop(
        cond, sweep2,
        (a0ref[...], e0, jnp.int32(0), jnp.asarray(False)))
    aout[...] = A
    if with_exit:
        eout[0][...] = E


@functools.partial(jax.jit, static_argnames=("band", "with_exit",
                                             "max_sweeps", "interpret"))
def flow_local_solve(packed_local, area2d, a0, band: int,
                     with_exit: bool = True, max_sweeps: int = 1 << 20,
                     interpret: bool = False):
    """Band-local fixpoint of the A relaxation (+ exit pointers) for every
    band in one pipelined launch.  Returns (A, E) with E = -1 everywhere
    when with_exit=False."""
    H, W = packed_local.shape
    assert H % band == 0, (H, band)
    nbands = H // band

    blk = pl.BlockSpec((band, W), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((H, W), jnp.float32)]
    out_specs = [blk]
    if with_exit:
        out_shapes.append(jax.ShapeDtypeStruct((H, W), jnp.float32))
        out_specs.append(blk)
    outs = pl.pallas_call(
        functools.partial(_local_kernel, band, W, with_exit, max_sweeps),
        grid=(nbands,),
        in_specs=[blk, blk, blk],
        out_specs=tuple(out_specs) if with_exit else out_specs[0],
        out_shape=tuple(out_shapes) if with_exit else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(packed_local, area2d, a0)
    if with_exit:
        return outs[0], outs[1]
    return outs, None


@functools.partial(jax.jit, static_argnames=("band", "with_exit",
                                             "max_sweeps"))
def flow_local_solve_xla(packed_local, area2d, a0, band: int,
                         with_exit: bool = True, max_sweeps: int = 1 << 20):
    """XLA twin of :func:`flow_local_solve` (works on any backend,
    including inside shard_map on the CPU test mesh).  All bands sweep
    together on the (nbands, band, W) stack — converges in max-over-bands
    local path length sweeps; band-circular rolls read garbage that the
    pre-masked inc bits zero out, exactly like the kernel."""
    H, W = packed_local.shape
    nbands = H // band
    p3 = packed_local.reshape(nbands, band, W)
    area3 = area2d.reshape(nbands, band, W)
    inc = [((p3 >> i) & 1).astype(jnp.float32) for i in range(8)]
    if with_exit:
        outm = [((p3 >> (8 + i)) & 1).astype(jnp.float32) for i in range(8)]
        row_l = jnp.arange(band).reshape(1, -1, 1)
        col = jnp.arange(W).reshape(1, 1, -1)
        dn = outm[_DY_POS[0]] + outm[_DY_POS[1]] + outm[_DY_POS[2]]
        up = outm[_DY_NEG[0]] + outm[_DY_NEG[1]] + outm[_DY_NEG[2]]
        crossing = (jnp.where(row_l == 0, up, 0.0)
                    + jnp.where(row_l == band - 1, dn, 0.0))
        selfid = jnp.broadcast_to(
            jnp.where(row_l == 0, col, W + col).astype(jnp.float32),
            (nbands, band, W))
        e0 = jnp.where(crossing > 0, selfid, -1.0)
    else:
        e0 = jnp.zeros((1, 1, 1), jnp.float32)

    def apply_sweep(A, E):
        newA = area3
        newE = jnp.zeros_like(E) if with_exit else E
        for i, (dx, dy) in enumerate(_SCAN_ORDER):
            Ad = jnp.roll(jnp.roll(A, -dy, 1), -dx, 2) if dx \
                else jnp.roll(A, -dy, 1)
            newA = newA + inc[i] * Ad
            if with_exit:
                Ed = jnp.roll(jnp.roll(E, -dy, 1), -dx, 2) if dx \
                    else jnp.roll(E, -dy, 1)
                newE = newE + outm[i] * (Ed + 1.0)
        if with_exit:
            newE = jnp.where(crossing > 0, selfid, newE - 1.0)
        return newA, newE

    # carry (prev, cur) rather than a boolean `done`: a constant-False
    # initial carry would be axis-unvarying inside shard_map while the
    # computed flag is varying (vma mismatch); comparing prev/cur keeps
    # every carried value derived from the inputs
    def body(carry):
        Ap, A, Ep, E, s = carry
        A1, E1 = apply_sweep(A, E)
        return A, A1, E, E1, s + 1

    def cond(carry):
        Ap, A, Ep, E, s = carry
        changed = jnp.any(A != Ap)
        if with_exit:
            changed = changed | jnp.any(E != Ep)
        return ((s < 1) | changed) & (s < max_sweeps)

    a03 = a0.reshape(nbands, band, W)
    _, A, _, E, _ = jax.lax.while_loop(
        cond, body, (a03, a03, e0, e0, jnp.int32(0)))
    if with_exit:
        return A.reshape(H, W), E.reshape(H, W)
    return A.reshape(H, W), None


@functools.partial(jax.jit, static_argnames=("band", "max_sweeps"))
def flow_local_vis_xla(packed_local, seed, band: int,
                       max_sweeps: int = 1 << 20):
    """Band-local mouth-reachability relaxation (XLA): vis propagates
    upstream (each cell ORs its downstream target's vis); crossing cells
    never read across the band boundary — their continuation is resolved
    by the coarse chain and re-enters through ``seed`` (phase 3).  Returns
    float 0/1."""
    H, W = packed_local.shape
    nbands = H // band
    p3 = packed_local.reshape(nbands, band, W)
    outm = [((p3 >> (8 + i)) & 1).astype(jnp.float32) for i in range(8)]
    mouthf = ((p3 >> 16) & 1).astype(jnp.float32)
    row_l = jnp.arange(band).reshape(1, -1, 1)
    dn = outm[_DY_POS[0]] + outm[_DY_POS[1]] + outm[_DY_POS[2]]
    up = outm[_DY_NEG[0]] + outm[_DY_NEG[1]] + outm[_DY_NEG[2]]
    crossing = (jnp.where(row_l == 0, up, 0.0)
                + jnp.where(row_l == band - 1, dn, 0.0))
    seedm = jnp.maximum(mouthf, seed.reshape(nbands, band, W))

    # (prev, cur) carry — see flow_local_solve_xla for the shard_map
    # varying-axes rationale
    def body(carry):
        visp, vis, s = carry
        new = seedm
        for i, (dx, dy) in enumerate(_SCAN_ORDER):
            vd = jnp.roll(jnp.roll(vis, -dy, 1), -dx, 2) if dx \
                else jnp.roll(vis, -dy, 1)
            new = jnp.maximum(new, outm[i] * vd)
        new = jnp.where(crossing > 0, seedm, new)
        return vis, new, s + 1

    def cond(carry):
        visp, vis, s = carry
        return ((s < 1) | jnp.any(vis != visp)) & (s < max_sweeps)

    _, vis, _ = jax.lax.while_loop(
        cond, body, (seedm, seedm, jnp.int32(0)))
    return vis.reshape(H, W)


def _local_vis_kernel(band, W, max_sweeps, pref, seedref, vout):
    """Pallas twin of flow_local_vis_xla for one band."""
    packed = pref[...]
    outm = [((packed >> (8 + i)) & 1).astype(jnp.float32) for i in range(8)]
    mouthf = ((packed >> 16) & 1).astype(jnp.float32)
    row_l = jax.lax.broadcasted_iota(jnp.int32, (band, W), 0)
    dn = outm[_DY_POS[0]] + outm[_DY_POS[1]] + outm[_DY_POS[2]]
    up = outm[_DY_NEG[0]] + outm[_DY_NEG[1]] + outm[_DY_NEG[2]]
    crossing = (jnp.where(row_l == 0, up, 0.0)
                + jnp.where(row_l == band - 1, dn, 0.0))
    seedm = jnp.maximum(mouthf, seedref[...])

    def apply_sweep(vis):
        cols = {1: pltpu.roll(vis, W - 1, 1), 0: vis,
                -1: pltpu.roll(vis, 1, 1)}
        new = seedm
        for i, (dx, dy) in enumerate(_SCAN_ORDER):
            vd = cols[dx]
            if dy:
                vd = pltpu.roll(vd, (-dy) % band, 0)
            new = jnp.maximum(new, outm[i] * vd)
        return jnp.where(crossing > 0, seedm, new)

    def sweep2(carry):
        vis, s, _ = carry
        v1 = apply_sweep(vis)
        v2 = apply_sweep(v1)
        return v2, s + 2, jnp.all(v2 == v1)

    def cond(carry):
        _, s, done = carry
        return jnp.logical_not(done) & (s < max_sweeps)

    vis, _, _ = jax.lax.while_loop(
        cond, sweep2, (seedm, jnp.int32(0), jnp.asarray(False)))
    vout[...] = vis


@functools.partial(jax.jit, static_argnames=("band", "max_sweeps",
                                             "interpret"))
def flow_local_vis(packed_local, seed, band: int, max_sweeps: int = 1 << 20,
                   interpret: bool = False):
    """Band-local reachability relaxation, Pallas (see flow_local_vis_xla
    for semantics)."""
    H, W = packed_local.shape
    nbands = H // band
    blk = pl.BlockSpec((band, W), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_local_vis_kernel, band, W, max_sweeps),
        grid=(nbands,),
        in_specs=[blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(packed_local, seed)


def _or_chain_adaptive(succ, n0, max_rounds: int = 48):
    """suffix-OR along the functional graph: out[s] = OR of n0 over
    {s, succ(s), succ^2(s), ...} (stops at -1), by pointer doubling."""
    has = succ >= 0
    ptr = jnp.where(has, succ, 0)

    def cond(carry):
        _, _, alive, r = carry
        return jnp.any(alive) & (r < max_rounds)

    def body(carry):
        X, ptr, alive, r = carry
        X = jnp.where(alive, jnp.maximum(X, X[ptr]), X)
        nxt = alive & alive[ptr]
        ptr = jnp.where(nxt, ptr[ptr], ptr)
        return X, ptr, nxt, r + 1

    X, _, _, _ = jax.lax.while_loop(
        cond, body, (n0, ptr, has, jnp.int32(0)))
    return X


def _accumulate_adaptive(parent, m0, max_rounds: int = 48):
    """X[s] = m0[s] + sum of m0 over all chain predecessors of s in the
    functional graph `parent` (-1 = chain end), by adaptive pointer
    doubling: rounds run until no pointer is alive (ceil(log2(longest
    chain)) rounds; the graph is acyclic so this terminates)."""
    N = parent.shape[0]
    has = parent >= 0
    ptr = jnp.where(has, parent, 0)

    def cond(carry):
        _, _, alive, r = carry
        return jnp.any(alive) & (r < max_rounds)

    def body(carry):
        X, ptr, alive, r = carry
        contrib = jnp.where(alive, X, 0.0)
        tgt = jnp.where(alive, ptr, N)  # N = drop bucket
        X = X + jnp.zeros_like(X).at[tgt].add(contrib, mode="drop")
        nxt = alive & alive[ptr]
        ptr = jnp.where(nxt, ptr[ptr], ptr)
        return X, ptr, nxt, r + 1

    X, _, _, _ = jax.lax.while_loop(
        cond, body, (m0, ptr, has, jnp.int32(0)))
    return X


def coarse_rows(x, band: int):
    """(H, W) -> (2*nbands, W): row 2b = first row of band b, 2b+1 = last."""
    H, W = x.shape
    nbands = H // band
    xr = x.reshape(nbands, band, W)
    return jnp.stack([xr[:, 0], xr[:, -1]], axis=1).reshape(2 * nbands, W)


def coarse_graph(packed, A_loc, E, band: int):
    """Build the contracted inter-band drainage graph from phase-1 output
    (full-grid arrays; see coarse_graph_rows for the core)."""
    pc = coarse_rows(packed, band)
    Ac = coarse_rows(A_loc, band)
    Ec = coarse_rows(E, band)
    return coarse_graph_rows(pc, Ac, Ec, band)


def coarse_graph_rows(pc, Ac, Ec, band: int):
    """Contracted inter-band drainage graph from stacked coarse boundary
    rows (2*nbands, W): pc = packed masks, Ac = band-local A, Ec = local
    exit ids.

    Returns (succ, m0, tflat_c, tflat_g, srcflat_g, cross_flat) over the
    flattened (2*nbands*W,) coarse layout: succ = next crossing edge id
    (-1 = chain end), m0 = band-local mass at the crossing source,
    tflat_c / tflat_g = the coarse / GLOBAL flattened index the mass is
    delivered at, srcflat_g = the crossing source cell's own global index
    (for scattering resolved reachability seeds), cross_flat = which
    coarse cells are crossing sources."""
    nbands2, W = pc.shape
    nbands = nbands2 // 2
    H = nbands * band
    Ec = Ec.astype(jnp.int32)

    rows2 = jnp.arange(2 * nbands).reshape(-1, 1)
    is_first = rows2 % 2 == 0
    b_idx = rows2 // 2

    def outbit(i):
        return ((pc >> (8 + i)) & 1) != 0

    cross_dn = (outbit(0) | outbit(1) | outbit(2)) & ~is_first
    cross_up = (outbit(5) | outbit(6) | outbit(7)) & is_first
    cross = cross_dn | cross_up
    # dx of the (unique) out direction: +1 for _SCAN_ORDER 0/3/5, -1 for 2/4/7
    dx = ((outbit(0) | outbit(3) | outbit(5)).astype(jnp.int32)
          - (outbit(2) | outbit(4) | outbit(7)).astype(jnp.int32))

    col = jnp.arange(W).reshape(1, -1)
    tcol = (col + dx) % W
    # target: crossing down lands on the FIRST row of band b+1 (coarse row
    # 2(b+1)); crossing up on the LAST row of band b-1 (coarse row 2(b-1)+1)
    trow_c = jnp.where(cross_dn, 2 * (b_idx + 1), 2 * (b_idx - 1) + 1)
    trow_c = jnp.clip(trow_c, 0, 2 * nbands - 1)  # inert where ~cross
    tflat_c = trow_c * W + tcol

    # remap local exit ids (side*W + col within the holding band) to the
    # global coarse layout: band b side s col c -> (2b + s)*W + c
    Eg = jnp.where(Ec >= 0, (2 * b_idx + Ec // W) * W + Ec % W, -1)

    succ = jnp.where(cross, Eg.reshape(-1)[tflat_c.reshape(-1)
                                           ].reshape(2 * nbands, W), -1)
    m0 = jnp.where(cross, Ac, 0.0)

    trow_g = jnp.where(cross_dn, (b_idx + 1) * band, b_idx * band - 1)
    tflat_g = jnp.where(cross, trow_g * W + tcol, H * W)  # H*W = drop

    srow_g = jnp.where(is_first, b_idx * band, (b_idx + 1) * band - 1)
    srcflat_g = jnp.where(cross, srow_g * W + col, H * W)
    srcflat_g = jnp.broadcast_to(srcflat_g, cross.shape)

    return (succ.reshape(-1), m0.reshape(-1), tflat_c.reshape(-1),
            tflat_g.reshape(-1), srcflat_g.reshape(-1), cross.reshape(-1))


def flow_twolevel_supported(grid: Grid, band: int = 0) -> bool:
    band = band or _pick_band(grid.height)
    return bool(grid.wrap_x and band)


@functools.partial(jax.jit, static_argnames=("grid", "band", "interpret"))
def flow_solve_twolevel(code, area2d, mouth, grid: Grid, band: int = 0,
                        interpret: bool = False):
    """Exact A-half flow accumulation by the two-level scheme (module
    docstring).  Drop-in for flow_solve_pallas(mode='A')'s A output; f32
    summation order differs (allclose, not bitwise)."""
    H, W = grid.shape
    band = band or _pick_band(H)
    assert band and H % band == 0 and grid.wrap_x, (grid.shape, band)
    nbands = H // band

    packed = pack_masks(code, mouth, grid)
    ploc = mask_local(packed, band)

    A_loc, E = flow_local_solve(ploc, area2d, area2d, band,
                                with_exit=nbands > 1, interpret=interpret)
    if nbands == 1:
        return A_loc

    succ, m0, _, tflat_g, _, cross = coarse_graph(packed, A_loc, E, band)
    X = _accumulate_adaptive(succ, m0)
    inj = jnp.zeros((H * W,), jnp.float32).at[tflat_g].add(
        jnp.where(cross, X, 0.0), mode="drop").reshape(H, W)

    A, _ = flow_local_solve(ploc, area2d + inj, A_loc + inj, band,
                            with_exit=False, interpret=interpret)
    return A
