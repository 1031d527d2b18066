"""Fused multi-sweep flow-accumulation kernel (Pallas TPU).

ops.flow.flow_solve_stencil iterates an 8-neighbor masked-add relaxation to
the upstream-accumulation fixpoint; convergence takes longest-flow-path
(~hundreds at 2048x1024) sweeps, each a full HBM round trip on the XLA
path.  This kernel runs K sweeps per HBM round trip: row bands staged into
VMEM with a K-deep halo (validity shrinks one ring per sweep), direction
masks packed into one int32 field.

Two workload reducers on top of the banding:

- **Active-band skipping**: a band whose cells did not change in the last
  round — and whose neighbors' didn't either — cannot change this round
  (information moves at most K <= band rows per round), so its program
  instance skips the sweeps entirely and copies its state through.  The
  convergence frontier shrinks to the few bands containing the longest
  unresolved flow paths, which is where all remaining work lives.
- **Per-band change flags** double as the convergence test: the solve is
  done when no band changed, so the driver's while-loop needs no extra
  full-grid comparison pass.

Sweep semantics are identical to flow_solve_stencil (same fixpoint, same
f32 summation order — bitwise-equal results):

  A'   = area + sum_d inc_d * shift(A, d)       (upstream area sum)
  vis' = mouth | (out_d & shift(vis, d))        (mouth reachability)

with the reference's CPU-traversal range rules (x periodic over the
dateline — the kernel requires wrap_x — y rows clip at the grid edge, no
pole wrap; reference src/filter/FlowFilter.cpp:39-75).  Out-of-range
contributions are masked off in the packed field, so halo contents at the
global y edges never matter.

Packed int32 layout per pixel:
  bits 0..7  incoming: neighbor at _SCAN_ORDER[i] flows into this pixel
  bits 8..15 outgoing one-hot: this pixel's code points at _SCAN_ORDER[i]
  bit  16    river mouth
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.grid import Grid

#: must match ops.flow._SCAN_ORDER
_SCAN_ORDER = ((1, 1), (0, 1), (-1, 1), (1, 0), (-1, 0), (1, -1), (0, -1), (-1, -1))


def pack_masks(code, mouth, grid: Grid):
    """Fold the 8 incoming masks, 8 outgoing one-hots and the mouth flag
    into one int32 field (see module docstring for the range rules)."""
    from ..ops.flow import _incoming_fields
    from ..core.topology import DIR_CODE

    H, W = grid.shape
    packed = jnp.zeros(grid.shape, jnp.int32)
    for i, ((dx, dy), ok) in enumerate(_incoming_fields(code, grid)):
        packed = packed | jnp.where(ok, 1 << i, 0)
    rows = jnp.arange(H).reshape(-1, 1)
    for i, (dx, dy) in enumerate(_SCAN_ORDER):
        m = code == DIR_CODE[(dx, dy)]
        if dy > 0:
            m = m & (rows < H - dy)
        elif dy < 0:
            m = m & (rows >= -dy)
        packed = packed | jnp.where(m, 1 << (8 + i), 0)
    packed = packed | jnp.where(mouth, 1 << 16, 0)
    return packed


def _pad_zero_rows(x, k):
    H, W = x.shape
    z = jnp.zeros((k, W), x.dtype)
    return jnp.concatenate([z, x, z], 0)


def _kernel(K, band, nbands, mode, flags_ref, ppad, areapad, apad, vpad,
            aout, vout, chg_ref, avm, vvm, pvm, arvm, sem):
    """Manual-DMA band kernel over padded (H+2K, W) carries.

    aout/vout alias apad/vpad: a skipped band's state stays in place with
    no copies at all, and later bands see earlier bands' same-round writes
    (Gauss-Seidel ordering — same unique fixpoint, faster convergence).
    The driver's while-loop body is a bare pallas_call: no per-round
    pad/window reshuffles in HBM.

    ``mode``: 'both' solves (A, vis) jointly; 'A'/'vis' solve one half only
    (the other is DMA'd nowhere and passes through via the aliasing) — the
    two halves' convergence waves travel in opposite directions along a
    river (A downstream, vis upstream), so split solves keep far fewer
    bands active per round than the union the joint solve pays for."""
    do_A = mode in ("both", "A")
    do_v = mode in ("both", "vis")
    b = pl.program_id(0)
    # flags are 3-bit: bit0 = changed anywhere (the band itself must keep
    # relaxing), bit1 = changed within K rows of its LOW boundary (can
    # reach band b-1 next round), bit2 = within K of its HIGH boundary.
    # A neighbor is woken only by the edge bit facing it — change deeper
    # than K rows from the shared boundary cannot cross in one round.
    left = flags_ref[jnp.maximum(b - 1, 0)]
    right = flags_ref[jnp.minimum(b + 1, nbands - 1)]
    active = (((flags_ref[b] & 1) != 0)
              | ((jnp.where(b > 0, left >> 2, 0) & 1) != 0)
              | ((jnp.where(b < nbands - 1, right >> 1, 0) & 1) != 0))

    @pl.when(active)
    def _run():
        r0 = b * band
        win = (pl.ds(r0, band + 2 * K), slice(None))
        pairs = [(ppad, pvm)]
        if do_A:
            pairs += [(apad, avm), (areapad, arvm)]
        if do_v:
            pairs += [(vpad, vvm)]
        copies = [pltpu.make_async_copy(src.at[win], dst, sem.at[n])
                  for n, (src, dst) in enumerate(pairs)]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()
        a0 = avm[...]
        # vvm holds no DMA'd data when do_v is False; feed zeros instead of
        # reading uninitialized scratch (the result would be provably dead,
        # but the read is fragile against future edits to the sweep logic)
        vis0 = vvm[...] if do_v else jnp.zeros_like(avm)
        A, vis = _sweep_body(K, pvm[...], arvm[...], a0, vis0, mode=mode)
        ch = jnp.zeros(a0.shape, bool)
        if do_A:
            ch = ch | (A != a0)
        if do_v:
            ch = ch | (vis != vis0)
        ch = ch[K:-K, :]
        changed = jnp.any(ch)
        edge_lo = jnp.any(ch[:K, :])
        edge_hi = jnp.any(ch[-K:, :])
        avm[...] = A
        if do_v:
            vvm[...] = vis
        interior = (pl.ds(K, band), slice(None))
        out_at = (pl.ds(r0 + K, band), slice(None))
        wpairs = ([(avm, aout)] if do_A else []) \
            + ([(vvm, vout)] if do_v else [])
        wcopies = [pltpu.make_async_copy(vm.at[interior], out.at[out_at],
                                         sem.at[n])
                   for n, (vm, out) in enumerate(wpairs)]
        for cp in wcopies:
            cp.start()
        for cp in wcopies:
            cp.wait()
        chg_ref[b] = (changed.astype(jnp.int32)
                      | (edge_lo.astype(jnp.int32) << 1)
                      | (edge_hi.astype(jnp.int32) << 2))

    @pl.when(jnp.logical_not(active))
    def _skip():
        chg_ref[b] = 0


def _sweep_body(K, packed, area, a0, vis0, shrink_x: bool = False,
                mode: str = "both"):
    """Up to K Jacobi sweeps of the (A, vis) relaxation on one padded block,
    with early exit: after sweep s, if every row in [s, rows-s) is
    unchanged, nothing valid is left to propagate — halo ring i is only
    valid for i sweeps, and rings shallower than s are already stale, so
    their churn can never reach the kept interior (depth K > s).  Most
    bands that run only because a neighbor was active converge in one
    sweep and exit immediately, which is where the convergence tail's
    wasted work lives.

    ``shrink_x`` applies the same stale-ring logic to columns — for
    non-periodic narrow windows whose x edges wrap garbage (the done test
    then ignores the outer s+1 columns).

    Shared by the banded kernels; all arrays have the same padded shape.
    Returns (A, vis) after <= K sweeps (fixpoint-identical to running
    all K)."""
    rows, W = area.shape
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)

    # unpack the 17 mask bits ONCE per visit into f32 multiplier fields:
    # the sweep then runs on fused multiply-adds instead of per-use
    # bit-test/select chains (explicit f32 values, not vmasks — 17 live
    # boolean vmasks blow the scoped-vmem budget, 17 f32 fields are ~13MB
    # and amortize over every sweep of the visit)
    do_A = mode in ("both", "A")
    do_v = mode in ("both", "vis")
    inc = [((packed >> i) & 1).astype(jnp.float32) for i in range(8)] \
        if do_A else None
    outm = [((packed >> (8 + i)) & 1).astype(jnp.float32) for i in range(8)] \
        if do_v else None
    mouthf = ((packed >> 16) & 1).astype(jnp.float32) if do_v else None

    def apply_sweep(A, vis):
        # 3 row slabs + shared lane rolls: 8 rolls per array per sweep
        # (row r reads r+dy <=> roll by (-dy) % rows; col c reads c+dx).
        # The lane-first alternative (2 lane + 6 sublane rolls) measured
        # slightly SLOWER (tools/flow_rollswap_race.py: 3.02 vs 2.96 ms)
        # — Mosaic's lane rotates are not the bottleneck here.
        newA, newvis = A, vis
        if do_A:
            Aslab = {dy: pltpu.roll(A, (-dy) % rows, 0) if dy else A
                     for dy in (-1, 0, 1)}
            newA = area
        if do_v:
            vslab = {dy: pltpu.roll(vis, (-dy) % rows, 0) if dy else vis
                     for dy in (-1, 0, 1)}
            newvis = mouthf
        for i, (dx, dy) in enumerate(_SCAN_ORDER):
            if do_A:
                Ad = Aslab[dy]
                if dx:
                    Ad = pltpu.roll(Ad, (-dx) % W, 1)
                newA = newA + inc[i] * Ad
            if do_v:
                vd = vslab[dy]
                if dx:
                    vd = pltpu.roll(vd, (-dx) % W, 1)
                newvis = jnp.maximum(newvis, outm[i] * vd)
        return newA, newvis

    def check_done(A, vis, newA, newvis, s_next):
        # ring s_next is the last sweep's validity window; A/vis are
        # monotone nondecreasing, so no-change between consecutive sweeps
        # (at any ring depth) certifies the local fixpoint
        live = (row_iota >= s_next) & (row_iota < rows - s_next)
        if shrink_x:
            live = live & (col_iota >= s_next) & (col_iota < W - s_next)
        ch = jnp.zeros_like(live)
        if do_A:
            ch = ch | (newA != A)
        if do_v:
            ch = ch | (newvis != vis)
        return jnp.logical_not(jnp.any(live & ch))

    if K % 2 == 0:
        # two sweeps per trip, one fixpoint check: halves the live-ring
        # bookkeeping (the extra sweep at a reached fixpoint is a bitwise
        # no-op, so results are identical)
        def sweep(carry):
            A, vis, s, _ = carry
            A1, vis1 = apply_sweep(A, vis)
            A2, vis2 = apply_sweep(A1, vis1)
            done = check_done(A1, vis1, A2, vis2, s + 2)
            return A2, vis2, s + 2, done
    else:
        def sweep(carry):
            A, vis, s, _ = carry
            newA, newvis = apply_sweep(A, vis)
            done = check_done(A, vis, newA, newvis, s + 1)
            return newA, newvis, s + 1, done

    def cond(carry):
        _, _, s, done = carry
        return (s < K) & jnp.logical_not(done)

    A, vis, _, _ = jax.lax.while_loop(
        cond, sweep, (a0, vis0, jnp.int32(0), jnp.asarray(False)))
    return A, vis


def _change_range(ch):
    """(lo, hi) column range of a 2D change mask; (BIG, -1) when empty."""
    rows, w = ch.shape
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    lo = jnp.min(jnp.where(ch, ci, jnp.int32(1 << 30)))
    hi = jnp.max(jnp.where(ch, ci, jnp.int32(-1)))
    return lo, hi


def _pick_band(H: int) -> int:
    # 128 edges out 64 for the split banded solves (fewer band flags and
    # launches per round; the in-sweep early exit keeps the deeper bands'
    # extra rows cheap) — tools/flow_tune.py
    for band in (128, 64, 32):
        if H % band == 0:
            return band
    return 0


def flow_solve_supported(grid: Grid) -> bool:
    return grid.wrap_x and _pick_band(grid.height) > 0


@functools.partial(jax.jit, static_argnames=("grid", "k", "band",
                                             "max_iters", "mode",
                                             "interpret"))
def flow_solve_pallas(code, area2d, mouth, grid: Grid, k: int = 16,
                      band: int = 0, max_iters: int = 1 << 20,
                      mode: str = "both", interpret: bool = False,
                      a0=None):
    """Drop-in for ops.flow.flow_solve_stencil (no lake connections, no
    root tracking — the jittable hot path).  Returns (A, vis bool).

    ``mode='A'``/``'vis'`` solve one half only (see _kernel); the other
    half passes through unchanged (vis stays the mouth seed / A stays
    area).

    ``a0``: optional warm start for A (e.g. the previous coupled step's
    fixpoint).  Valid from ANY initial state: the relaxation matrix is
    nilpotent (D8 flow is acyclic — strictly decreasing height), so
    A_k = sum_{j<k} M^j area + M^k a0 reaches the unique fixpoint once k
    exceeds the longest REMAINING path through any cell where a0 differs
    from it; when few directions changed since a0 was computed, only the
    downstream traces of the changed cells stay active and the band
    flags/early exits skip the rest."""
    H, W = grid.shape
    band = band or _pick_band(H)
    assert band > 0 and H % band == 0 and grid.wrap_x, (grid.shape, band)
    assert k <= band, (k, band)  # change propagates <= 1 band per round
    # Mosaic sublane alignment: DMA slice shapes AND offsets must be
    # 8-row-aligned — the interior writeback sits at row offset k
    assert (band + 2 * k) % 8 == 0 and k % 8 == 0, (k, band)
    nbands = H // band

    packed = pack_masks(code, mouth, grid)
    ppad = _pad_zero_rows(packed, k)
    areapad = _pad_zero_rows(area2d, k)
    apad0 = _pad_zero_rows(area2d if a0 is None else a0, k)
    vpad0 = _pad_zero_rows(jnp.where(mouth, 1.0, 0.0), k)
    flags0 = jnp.full((nbands,), 7, jnp.int32)

    fshape = jax.ShapeDtypeStruct((H + 2 * k, W), jnp.float32)
    call = pl.pallas_call(
        functools.partial(_kernel, k, band, nbands, mode),
        grid=(nbands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   # chg is one shared (nbands,) SMEM vector: each
                   # (sequential) grid step writes its own slot
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(fshape, fshape,
                   jax.ShapeDtypeStruct((nbands,), jnp.int32)),
        input_output_aliases={3: 0, 4: 1},  # apad -> aout, vpad -> vout
        scratch_shapes=[
            pltpu.VMEM((band + 2 * k, W), jnp.float32),
            pltpu.VMEM((band + 2 * k, W), jnp.float32),
            pltpu.VMEM((band + 2 * k, W), jnp.int32),
            pltpu.VMEM((band + 2 * k, W), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        # the sweep's live set exceeds the 16MB default scoped-vmem
        # budget at band=128, k=16; v5e has 128MB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def cond(carry):
        _, _, flags, it = carry
        return jnp.any(flags != 0) & (it < max_iters)

    def body(carry):
        apad, vpad, flags, it = carry
        aout, vout, chg = call(flags, ppad, areapad, apad, vpad)
        return aout, vout, chg, it + k

    apad, vpad, _, _ = jax.lax.while_loop(
        cond, body, (apad0, vpad0, flags0, 0))
    return apad[k:-k], vpad[k:-k] > 0.5
