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


def _windows(x, band, k, nbands):
    return jnp.stack([x[i * band:i * band + band + 2 * k]
                      for i in range(nbands)], 0)


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


@functools.partial(jax.jit, static_argnames=("grid", "k", "band", "narrow",
                                             "max_rounds", "mode",
                                             "interpret"))
def flow_solve_fused(code, area2d, mouth, grid: Grid, k: int = 16,
                     band: int = 0, narrow: int = 512,
                     max_rounds: int = 1 << 16, mode: str = "both",
                     interpret: bool = False):
    """Drop-in for flow_solve_pallas with the round loop fused on-core and
    narrow-window tail tracking (see _kernel_fused).  Returns (A, vis)."""
    H, W = grid.shape
    band = band or _pick_band(H)
    assert band > 0 and H % band == 0 and grid.wrap_x, (grid.shape, band)
    assert k <= band, (k, band)
    assert narrow % 128 == 0 and narrow >= 384, narrow
    nbands = H // band

    packed = pack_masks(code, mouth, grid)
    ppad = _pad_zero_rows(packed, k)
    areapad = _pad_zero_rows(area2d, k)
    apad0 = _pad_zero_rows(area2d, k)
    vpad0 = _pad_zero_rows(jnp.where(mouth, 1.0, 0.0), k)

    fshape = jax.ShapeDtypeStruct((H + 2 * k, W), jnp.float32)
    apad, vpad, _ = pl.pallas_call(
        functools.partial(_kernel_fused, k, band, nbands, W, narrow,
                          max_rounds, mode),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(fshape, fshape,
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        input_output_aliases={2: 0, 3: 1},  # apad -> aout, vpad -> vout
        scratch_shapes=[
            pltpu.VMEM((band + 2 * k, W), jnp.float32),
            pltpu.VMEM((band + 2 * k, W), jnp.float32),
            pltpu.VMEM((band + 2 * k, W), jnp.int32),
            pltpu.VMEM((band + 2 * k, W), jnp.float32),
            pltpu.VMEM((band + 2 * k, narrow), jnp.float32),
            pltpu.VMEM((band + 2 * k, narrow), jnp.float32),
            pltpu.VMEM((band + 2 * k, narrow), jnp.int32),
            pltpu.VMEM((band + 2 * k, narrow), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SMEM((nbands,), jnp.int32),
            pltpu.SMEM((nbands,), jnp.int32),
            pltpu.SMEM((nbands,), jnp.int32),
            pltpu.SMEM((nbands,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ppad, areapad, apad0, vpad0)
    return apad[k:-k], vpad[k:-k] > 0.5


# ---------------------------------------------------------------------------
# wave-propagation band solver (flow_solve_wave)
# ---------------------------------------------------------------------------
#
# The A-form relaxation above recomputes every cell's upstream sum each
# sweep, so ALL cells downstream of any still-unresolved source keep
# changing every sweep — the active set of the convergence tail is a whole
# river's downstream trace, and the narrow-window logic rarely applies.
# This kernel propagates the *delta* instead (a wave):
#
#   delta_0 = area;   per sweep:  delta' = sum_d inc_d * shift(delta, d)
#                                 A     += delta'
#                                 vis    = mouth | max_d out_d*shift(vis, d)
#
# After s sweeps A = sum_{j<=s} M^j area, the same fixpoint as the A-form
# (f32 summation order differs: arrivals add in hop-distance order).  The
# active set (delta != 0, plus newly-set vis bits) is exactly the
# wavefront, which *is* narrow in the tail — so per-sweep column-window
# tracking pays off where the A-form could not.
#
# Band decomposition without halos for delta (waves must be delivered
# exactly once, so the overlapped-window recompute trick of the A-form
# kernels is unsound here):
#   - each band visit drains its local wave completely (sweeps until
#     delta == 0 and vis stops changing) — delta never persists in HBM;
#   - wave mass crossing a band boundary accumulates into per-band VMEM
#     "outbox" rows (indexed by source column: the receiving band injects
#     the row as a virtual halo row, and the inc-bit gather of its edge
#     cells — which encodes the *source* cell's actual direction — routes
#     each crossing to exactly one destination);
#   - visits run sequentially (one core), so outbox accumulate/consume is
#     exactly-once by construction; rounds revisit bands with pending
#     inboxes or changed neighbors (vis halo rows are stale within a
#     visit, which is safe: vis is a monotone OR), serpentine order.
#
# x layout: arrays carry 128 duplicated wrap columns per side (refreshed
# after each sweep), so column windows never straddle the dateline seam;
# a wavefront that genuinely spans the seam falls back to full width via
# the range test.  y layout: 8-row zero halos at the global edges for DMA
# sublane alignment (contents masked off by pack_masks' y-clip rules).
#
# Measured verdict (2048x1024, v5e): the wave kernel converges in 8 rounds
# / ~4200 band-sweeps but does NOT beat the K-capped A-form kernel
# (flow_solve_pallas) — D8 activity is spatially DIFFUSE (cells with
# remaining depth >= 64 spread over every 64x128 tile), so window/bitmap
# skipping cannot track the real sparsity, and every sweep formulation
# pays ~(sum of per-band depths) x (band area) of vector work plus
# per-sweep scalar overhead.  Pointer doubling (the sub-linear
# alternative) measures 970 ms — TPU gathers run ~50x below HBM speed.
# flow_filter_device therefore stays on flow_solve_pallas; this kernel is
# kept as the better structure if hardware gathers ever get fast, and as
# the proof that the fixpoint tolerates stale halos (used by the sharded
# solver's amortized rounds).


BIGC = 1 << 30


def _delta_half(dvm, avm, pvm, band, ro, RH, o, NWW, W):
    """Delta propagation + A accumulation on the (RH rows x NWW cols)
    window at (ro, o) (padded coords; rows are window-local, columns
    include the duplicated wrap margins).

    Returns (rlo, rhi, lo, hi): the row/column change ranges (rows in
    band-local coords, columns in padded coords, canonical only)."""
    win = pl.ds(o, NWW)
    # one 8-aligned ref load; the +-1-row slabs are value slices (ref
    # slices at ro+8+dy would break Mosaic's sublane alignment rule)
    block = dvm[pl.ds(ro, RH + 16), win]
    dslab = {dy: jax.lax.slice_in_dim(block, 8 + dy, 8 + dy + RH, axis=0)
             for dy in (-1, 0, 1)}
    packed = pvm[pl.ds(ro, RH), win]

    dsh = {}
    for dy in (-1, 0, 1):
        d_s = dslab[dy]
        dsh[(-1, dy)] = pltpu.roll(d_s, 1, 1)       # reads col c-1
        dsh[(0, dy)] = d_s
        dsh[(1, dy)] = pltpu.roll(d_s, NWW - 1, 1)  # reads col c+1

    dnew = jnp.zeros((RH, NWW), jnp.float32)
    for i, (dx, dy) in enumerate(_SCAN_ORDER):
        dnew = dnew + jnp.where((packed & (1 << i)) != 0, dsh[(dx, dy)], 0.0)

    wi = jax.lax.broadcasted_iota(jnp.int32, (RH, NWW), 1)
    edge_ok = (wi >= 1) & (wi < NWW - 1)
    dnew = jnp.where(edge_ok, dnew, 0.0)
    ci = wi + o
    ch = (dnew != 0.0) & (ci >= 128) & (ci < W + 128)

    avm[pl.ds(ro, RH), win] = avm[pl.ds(ro, RH), win] + dnew
    dvm[pl.ds(ro + 8, RH), win] = dnew
    lo, hi = _change_range(ch)
    ri = jax.lax.broadcasted_iota(jnp.int32, (RH, NWW), 0)
    rlo = jnp.min(jnp.where(ch, ri, BIGC))
    rhi = jnp.max(jnp.where(ch, ri, -1))
    return (jnp.where(rhi >= 0, rlo + ro, BIGC),
            jnp.where(rhi >= 0, rhi + ro, -1),
            jnp.where(hi >= 0, lo + o, BIGC),
            jnp.where(hi >= 0, hi + o, -1))


def _vis_half(vvm, pvm, band, ro, RH, o, NWW, W):
    """Mouth-reachability OR-sweep on the window; same conventions as
    _delta_half.  Returns (rlo, rhi, lo, hi, edgeN, edgeS) where the edge
    flags say vis changed in the band's top/bottom interior row (what a
    neighbor band can observe through its halo)."""
    win = pl.ds(o, NWW)
    block = vvm[pl.ds(ro, RH + 16), win]
    vslab = {dy: jax.lax.slice_in_dim(block, 8 + dy, 8 + dy + RH, axis=0)
             for dy in (-1, 0, 1)}
    packed = pvm[pl.ds(ro, RH), win]

    vsh = {}
    for dy in (-1, 0, 1):
        v_s = vslab[dy]
        vsh[(-1, dy)] = pltpu.roll(v_s, 1, 1)
        vsh[(0, dy)] = v_s
        vsh[(1, dy)] = pltpu.roll(v_s, NWW - 1, 1)

    vnew = jnp.where((packed & (1 << 16)) != 0, 1.0, 0.0)
    for i, (dx, dy) in enumerate(_SCAN_ORDER):
        vnew = jnp.maximum(
            vnew, jnp.where((packed & (1 << (8 + i))) != 0, vsh[(dx, dy)], 0.0))

    vold = vslab[0]
    wi = jax.lax.broadcasted_iota(jnp.int32, (RH, NWW), 1)
    edge_ok = (wi >= 1) & (wi < NWW - 1)
    vnew = jnp.where(edge_ok, vnew, vold)
    vch = vnew != vold
    ci = wi + o
    ch = vch & (ci >= 128) & (ci < W + 128)
    ri = jax.lax.broadcasted_iota(jnp.int32, (RH, NWW), 0)
    edgeN = jnp.any(ch & (ri + ro == band - 1))
    edgeS = jnp.any(ch & (ri + ro == 0))

    vvm[pl.ds(ro + 8, RH), win] = vnew
    lo, hi = _change_range(ch)
    rlo = jnp.min(jnp.where(ch, ri, BIGC))
    rhi = jnp.max(jnp.where(ch, ri, -1))
    return (jnp.where(rhi >= 0, rlo + ro, BIGC),
            jnp.where(rhi >= 0, rhi + ro, -1),
            jnp.where(hi >= 0, lo + o, BIGC),
            jnp.where(hi >= 0, hi + o, -1),
            edgeN, edgeS)


def _pick_window(rlo, rhi, lo, hi, band, RH, NW, W):
    """Choose (tier, ro, o) from last sweep's change ranges: tier 0 =
    (RH rows x NW cols), 1 = (band x NW), 2 = (band x full width).
    Activity moves one cell per sweep, so a 2-cell interior margin keeps
    the window valid; rows snap to 8, columns to 128."""
    M = 128
    o = jnp.clip((lo - M) // 128 * 128, 0, W + 256 - NW)
    cols_ok = (hi >= 0) & (hi - lo < NW - 2 * M) \
        & (lo - o >= 8) & (o + NW - hi >= 8)
    ro = jnp.clip((rlo - 4) // 8 * 8, 0, band - RH)
    rows_ok = (rhi >= 0) & (rhi - rlo < RH - 4) \
        & (rlo - ro >= 2) & (ro + RH - rhi >= 3)
    tier = jnp.where(cols_ok & rows_ok, 0, jnp.where(cols_ok, 1, 2))
    return tier, ro, jnp.where(cols_ok, o, 0)


def _kernel_wave(band, nbands, W, NW, RH, max_rounds, max_sweeps,
                 ppad, areapad, apad, vpad, aout, vout, it_ref,
                 avm, vvm, pvm, arvm, dvm, obox, sem,
                 prevN, prevS, curN, curS, pend):
    """Whole solve in one launch; see the section comment above.

    The delta (A-accumulation) and vis (reachability) halves run as
    separate windowed passes per sweep, each with its own row/column
    activity range and a 3-tier window choice — a drained half costs
    nothing while the other's wavefront crawls.

    SMEM (nbands,) flags: prevN/prevS (curN/curS) — did the previous
    (current) round's visit change VIS in the band's north/south edge
    interior row (the only in-band change a neighbor can observe);
    pend (2*nbands,) — nonzero-outbox flags (row 2b = southward outbox of
    band b, 2b+1 = northward).  VMEM obox (2*nbands, W+256): the outbox
    rows themselves (persist across visits; accumulate-on-write,
    zero-on-consume, exactly-once since visits are sequential)."""
    i32 = jnp.int32
    PW = W + 256

    for b in range(nbands):
        prevN[b] = 1
        prevS[b] = 1
        curN[b] = 0
        curS[b] = 0
        pend[2 * b] = 0
        pend[2 * b + 1] = 0
    obox[...] = jnp.zeros((2 * nbands, PW), jnp.float32)

    def dma(copies):
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    def refresh_dups(vm, rows):
        vm[pl.ds(0, rows), 0:128] = vm[pl.ds(0, rows), W:W + 128]
        vm[pl.ds(0, rows), W + 128:W + 256] = vm[pl.ds(0, rows), 128:256]

    def accum_crossings(b):
        """Outgoing band crossings of the current delta (edge interior
        rows; full-width 1-D row ops)."""
        dN = dvm[band + 7, :]
        pN = pvm[band - 1, :]
        outN = jnp.zeros_like(dN)
        for i in (0, 1, 2):          # _SCAN_ORDER dirs with dy=+1
            outN = outN + jnp.where((pN & (1 << (8 + i))) != 0, dN, 0.0)
        dS = dvm[8, :]
        pS = pvm[0, :]
        outS = jnp.zeros_like(dS)
        for i in (5, 6, 7):          # dirs with dy=-1
            outS = outS + jnp.where((pS & (1 << (8 + i))) != 0, dS, 0.0)
        crossN = jnp.any(outN != 0.0)
        crossS = jnp.any(outS != 0.0)

        @pl.when(crossN)
        def _accN():
            obox[2 * b + 1, :] = obox[2 * b + 1, :] + outN
            pend[2 * b + 1] = 1

        @pl.when(crossS)
        def _accS():
            obox[2 * b, :] = obox[2 * b, :] + outS
            pend[2 * b] = 1

    def visit(b, rnd):
        r0 = b * band
        dma([pltpu.make_async_copy(aout.at[pl.ds(r0, band)], avm, sem.at[0]),
             pltpu.make_async_copy(vout.at[pl.ds(r0, band + 16)], vvm,
                                   sem.at[1]),
             pltpu.make_async_copy(ppad.at[pl.ds(r0, band)], pvm, sem.at[2])])

        # --- initial wave: round 0 -> full area field; later -> inboxes
        dvm[...] = jnp.zeros((band + 16, PW), jnp.float32)

        @pl.when(rnd == 0)
        def _virgin():
            dma([pltpu.make_async_copy(areapad.at[pl.ds(r0, band)], arvm,
                                       sem.at[3])])
            dvm[pl.ds(8, band), :] = arvm[...]

        if nbands > 1:
            bs = jnp.maximum(b - 1, 0)
            bn = jnp.minimum(b + 1, nbands - 1)

            @pl.when((b > 0) & (pend[2 * bs + 1] != 0))
            def _inj_s():
                dvm[7, :] = obox[2 * bs + 1, :]
                obox[2 * bs + 1, :] = jnp.zeros((PW,), jnp.float32)
                pend[2 * bs + 1] = 0

            @pl.when((b < nbands - 1) & (pend[2 * bn] != 0))
            def _inj_n():
                dvm[band + 8, :] = obox[2 * bn, :]
                obox[2 * bn, :] = jnp.zeros((PW,), jnp.float32)
                pend[2 * bn] = 0

        def sweep_step(carry):
            (s, drl, drh, dl, dh, vrl, vrh, vl, vh, eN, eS) = carry

            # ---- delta half
            d_act = dh >= 0
            if nbands > 1:
                @pl.when(d_act & ((drl <= 0) | (drh >= band - 1)))
                def _cross():
                    accum_crossings(b)

            def run_d(args):
                tier, ro, o = _pick_window(drl, drh, dl, dh, band, RH, NW, W)

                def t0(_):
                    return _delta_half(dvm, avm, pvm, band,
                                       pl.multiple_of(ro, 8), RH,
                                       pl.multiple_of(o, 128), NW, W)

                def t1(_):
                    return _delta_half(dvm, avm, pvm, band, 0, band,
                                       pl.multiple_of(o, 128), NW, W)

                def t2(_):
                    return _delta_half(dvm, avm, pvm, band, 0, band,
                                       0, W + 256, W)

                return jax.lax.switch(tier, (t0, t1, t2), 0)

            ndrl, ndrh, ndl, ndh = jax.lax.cond(
                d_act, run_d,
                lambda _: (i32(BIGC), i32(-1), i32(BIGC), i32(-1)), 0)

            # zero the injected halo rows after their single consumption
            @pl.when(s == 0)
            def _clear_inject():
                dvm[7, :] = jnp.zeros((PW,), jnp.float32)
                dvm[band + 8, :] = jnp.zeros((PW,), jnp.float32)

            @pl.when((ndh >= 0) & ((ndl < 256) | (ndh >= W)))
            def _ddups():
                refresh_dups(avm, band)
                refresh_dups(dvm, band + 16)

            # ---- vis half
            def run_v(args):
                tier, ro, o = _pick_window(vrl, vrh, vl, vh, band, RH, NW, W)

                def t0(_):
                    return _vis_half(vvm, pvm, band,
                                     pl.multiple_of(ro, 8), RH,
                                     pl.multiple_of(o, 128), NW, W)

                def t1(_):
                    return _vis_half(vvm, pvm, band, 0, band,
                                     pl.multiple_of(o, 128), NW, W)

                def t2(_):
                    return _vis_half(vvm, pvm, band, 0, band, 0, W + 256, W)

                return jax.lax.switch(tier, (t0, t1, t2), 0)

            nvrl, nvrh, nvl, nvh, veN, veS = jax.lax.cond(
                vh >= 0, run_v,
                lambda _: (i32(BIGC), i32(-1), i32(BIGC), i32(-1),
                           jnp.asarray(False), jnp.asarray(False)), 0)

            @pl.when((nvh >= 0) & ((nvl < 256) | (nvh >= W)))
            def _vdups():
                refresh_dups(vvm, band + 16)

            changed = (ndh >= 0) | (nvh >= 0)
            return (s + 1, ndrl, ndrh, ndl, ndh, nvrl, nvrh, nvl, nvh,
                    eN | veN, eS | veS)

        def sweep_cond(carry):
            s = carry[0]
            changed = (carry[4] >= 0) | (carry[8] >= 0)
            return changed & (s < max_sweeps)

        full0 = (i32(0), i32(band - 1), i32(0), i32(W + 255))
        nswept, _, _, _, _, _, _, _, _, eN, eS = jax.lax.while_loop(
            sweep_cond, sweep_step,
            (i32(0),) + full0 + full0 + (jnp.asarray(False),
                                         jnp.asarray(False)))

        @pl.when(eN)
        def _():
            curN[b] = 1

        @pl.when(eS)
        def _():
            curS[b] = 1

        @pl.when(nswept > 1)
        def _writeback():
            dma([pltpu.make_async_copy(avm, aout.at[pl.ds(r0, band)],
                                       sem.at[0]),
                 pltpu.make_async_copy(vvm.at[pl.ds(8, band)],
                                       vout.at[pl.ds(r0 + 8, band)],
                                       sem.at[1])])

        return nswept

    def band_step(i, carry):
        rnd, total = carry
        b = jnp.where(rnd % 2 == 0, i, nbands - 1 - i)
        bm = jnp.maximum(b - 1, 0)
        bp = jnp.minimum(b + 1, nbands - 1)
        # a band needs a visit iff a neighbor has (a) wave mass addressed
        # to it (pend) or (b) a vis change in the edge row this band reads
        # as its halo — from the previous round or from an already-visited
        # neighbor this round (serpentine)
        seed = (pend[2 * bm + 1] | pend[2 * bp]
                | prevN[bm] | curN[bm] | prevS[bp] | curS[bp])
        seed = jnp.where(b == bm, seed & ~(prevN[bm] | curN[bm]
                                           | pend[2 * bm + 1]), seed)
        seed = jnp.where(b == bp, seed & ~(prevS[bp] | curS[bp]
                                           | pend[2 * bp]), seed)

        def go(args):
            b, rnd = args
            return visit(b, rnd)

        nswept = jax.lax.cond((seed != 0) | (rnd == 0), go,
                              lambda a: i32(0), (b, rnd))
        return rnd, total + nswept

    def round_body(carry):
        rnd, total = carry
        _, total = jax.lax.fori_loop(0, nbands, band_step, (rnd, total))
        anyc = i32(0)
        for b in range(nbands):
            prevN[b] = curN[b]
            prevS[b] = curS[b]
            anyc = anyc | curN[b] | curS[b] | pend[2 * b] | pend[2 * b + 1]
            curN[b] = 0
            curS[b] = 0
        return rnd + 1, total, anyc

    def loop_cond(carry):
        rnd, _, anyc = carry
        return (anyc != 0) & (rnd < max_rounds)

    def loop_body(carry):
        rnd, total, _ = carry
        rnd, total, anyc = round_body((rnd, total))
        return rnd, total, anyc

    rnd, total, _ = jax.lax.while_loop(
        loop_cond, loop_body, (i32(0), i32(0), i32(1)))
    it_ref[0] = rnd
    it_ref[1] = total


def _pad_wave(x, grid: Grid):
    """(H, W) -> (H, W+256): 128 duplicated wrap columns each side."""
    return jnp.concatenate([x[:, -128:], x, x[:, :128]], 1)


def _pad_wave_rows(x, grid: Grid):
    """(H, W) -> (H+16, W+256): wrap columns + 8 zero halo rows each end
    (8 for DMA sublane alignment; contents masked off by pack_masks'
    y-clip range rules)."""
    xp = _pad_wave(x, grid)
    z = jnp.zeros((8, xp.shape[1]), x.dtype)
    return jnp.concatenate([z, xp, z], 0)


@functools.partial(jax.jit, static_argnames=("grid", "band", "narrow",
                                             "rows_narrow", "max_rounds",
                                             "max_sweeps", "interpret",
                                             "with_stats"))
def flow_solve_wave(code, area2d, mouth, grid: Grid, band: int = 0,
                    narrow: int = 512, rows_narrow: int = 16,
                    max_rounds: int = 1 << 10, max_sweeps: int = 1 << 20,
                    interpret: bool = False, with_stats: bool = False):
    """Drop-in for flow_solve_pallas: delta-wave band solver (see the
    section comment above).  Returns (A, vis bool); with_stats additionally
    returns an int32[2] of (rounds, total sweeps)."""
    H, W = grid.shape
    band = band or _pick_band(H)
    assert band > 0 and H % band == 0 and grid.wrap_x, (grid.shape, band)
    assert W % 128 == 0 and narrow % 128 == 0 and narrow >= 384
    nbands = H // band

    packed = pack_masks(code, mouth, grid)
    ppad = _pad_wave(packed, grid)
    areapad = _pad_wave(area2d, grid)
    apad0 = _pad_wave(area2d, grid)               # A starts at area
    vpad0 = _pad_wave_rows(jnp.where(mouth, 1.0, 0.0), grid)

    PW = W + 256
    apad, vpad, stats = pl.pallas_call(
        functools.partial(_kernel_wave, band, nbands, W, narrow,
                          rows_narrow, max_rounds, max_sweeps),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((H, PW), jnp.float32),
                   jax.ShapeDtypeStruct((H + 16, PW), jnp.float32),
                   jax.ShapeDtypeStruct((2,), jnp.int32)),
        input_output_aliases={2: 0, 3: 1},  # apad -> aout, vpad -> vout
        scratch_shapes=[
            pltpu.VMEM((band, PW), jnp.float32),        # avm
            pltpu.VMEM((band + 16, PW), jnp.float32),   # vvm
            pltpu.VMEM((band, PW), jnp.int32),          # pvm
            pltpu.VMEM((band, PW), jnp.float32),        # arvm
            pltpu.VMEM((band + 16, PW), jnp.float32),   # dvm
            pltpu.VMEM((2 * nbands, PW), jnp.float32),  # obox
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SMEM((nbands,), jnp.int32),
            pltpu.SMEM((nbands,), jnp.int32),
            pltpu.SMEM((nbands,), jnp.int32),
            pltpu.SMEM((nbands,), jnp.int32),
            pltpu.SMEM((2 * nbands,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ppad, areapad, apad0, vpad0)
    A = apad[:, 128:-128]
    vis = vpad[8:-8, 128:-128] > 0.5
    if with_stats:
        return A, vis, stats
    return A, vis


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


def flow_solve_2d_supported(grid: Grid, k: int = 16) -> bool:
    ty, tx = _pick_tiles(grid.height, grid.width)
    return bool(grid.wrap_x and ty and tx and k <= min(ty, tx)
                and grid.width // tx >= 2)


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
