"""Measured-dead-end flow kernels, kept for the record (docs/PERF.md).

Moved out of the production package in round 5: these are real, tested,
working kernels whose measured verdicts were negative on v5e —
``flow_solve_wave`` (delta-wave band solver with 3-tier windows: D8
activity is too spatially diffuse for window tracking),
``flow_solve_fused`` (whole solve in one launch: per-round launch overhead
was already negligible), and ``flow_solve_pallas_2d`` (2D tiles: extra DMA
latency exceeds the window savings).  They share helpers with the
production banded kernel and still pass their interpret-mode equivalence
tests (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.pallas_kernels.flow import (
    _SCAN_ORDER,
    _change_range,
    _pad_zero_rows,
    _pick_band,
    _sweep_body,
    pack_masks,
)


def _kernel2d(K, HX, ty, tx, nby, nbx, flags_ref, ppad, areapad, apad, vpad,
              aout, vout, chg_ref, avm, vvm, pvm, arvm, sem):
    """2D-tiled variant with manual DMA: tiles whose 3x3 neighborhood was
    quiet last round skip both the copies and the compute (the convergence
    frontier is local in x as well as y).  aout/vout alias apad/vpad, so a
    skipped tile's state simply stays in place; within one call, tiles run
    sequentially and later tiles see earlier tiles' writes (Gauss-Seidel
    ordering — converges to the same unique fixpoint, often in fewer
    rounds)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * nbx + j

    act = jnp.int32(0)
    for di in (-1, 0, 1):
        ii = jnp.clip(i + di, 0, nby - 1)
        for dj in (-1, 0, 1):
            jj = (j + dj + nbx) % nbx    # x wraps over the dateline
            act = act | flags_ref[ii * nbx + jj]

    @pl.when(act != 0)
    def _run():
        # x halo is HX=128 wide (DMA lane slices must be 128-aligned in
        # both shape and offset); y halo is the K rows the sweeps need
        r0 = i * ty
        c0 = j * tx
        win = (pl.ds(r0, ty + 2 * K), pl.ds(c0, tx + 2 * HX))
        copies = [pltpu.make_async_copy(src.at[win], dst, sem.at[n])
                  for n, (src, dst) in enumerate(
                      ((apad, avm), (vpad, vvm), (ppad, pvm),
                       (areapad, arvm)))]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()
        a0 = avm[...]
        vis0 = vvm[...]
        A, vis = _sweep_body(K, pvm[...], arvm[...], a0, vis0)
        changed = (jnp.any(A[K:-K, HX:-HX] != a0[K:-K, HX:-HX])
                   | jnp.any(vis[K:-K, HX:-HX] != vis0[K:-K, HX:-HX]))
        avm[...] = A
        vvm[...] = vis
        interior = (pl.ds(K, ty), pl.ds(HX, tx))
        out_at = (pl.ds(r0 + K, ty), pl.ds(c0 + HX, tx))
        wcopies = [pltpu.make_async_copy(vm.at[interior], out.at[out_at],
                                         sem.at[n])
                   for n, (vm, out) in enumerate(((avm, aout), (vvm, vout)))]
        for cp in wcopies:
            cp.start()
        for cp in wcopies:
            cp.wait()
        chg_ref[t] = changed.astype(jnp.int32)

    @pl.when(act == 0)
    def _skip():
        chg_ref[t] = 0


def _pad2d(x, ky, kx):
    """(H, W) -> (H+2ky, W+2kx): x halos dateline-wrapped, y halos zero
    (contents masked off by the range rules)."""
    xp = jnp.concatenate([x[:, -kx:], x, x[:, :kx]], 1)
    zr = jnp.zeros((ky, x.shape[1] + 2 * kx), x.dtype)
    return jnp.concatenate([zr, xp, zr], 0)


def _refresh_xwrap(xp, kx):
    """Re-mirror the dateline halo columns after in-place interior updates."""
    W = xp.shape[1] - 2 * kx
    xp = jax.lax.dynamic_update_slice(xp, xp[:, W:W + kx], (0, 0))
    xp = jax.lax.dynamic_update_slice(xp, xp[:, kx:2 * kx], (0, W + kx))
    return xp


def _pick_tiles(H: int, W: int):
    ty = next((b for b in (128, 64, 32) if H % b == 0), 0)
    tx = next((b for b in (512, 256, 128) if W % b == 0), 0)
    return ty, tx


@functools.partial(jax.jit, static_argnames=("grid", "k", "max_iters"))
def flow_solve_pallas_2d(code, area2d, mouth, grid: Grid, k: int = 16,
                         max_iters: int = 1 << 20):
    """2D-tiled flow solve (see _kernel2d).  TPU-only (manual DMA)."""
    H, W = grid.shape
    HX = 128   # x-halo width: DMA lane slices need 128-aligned shape/offset
    ty, tx = _pick_tiles(H, W)
    assert ty and tx and grid.wrap_x and k <= min(ty, tx), (H, W, ty, tx, k)
    assert k <= HX
    nby, nbx = H // ty, W // tx

    packed = pack_masks(code, mouth, grid)
    ppad = _pad2d(packed, k, HX)
    areapad = _pad2d(area2d, k, HX)

    apad0 = _pad2d(area2d, k, HX)
    vpad0 = _pad2d(jnp.where(mouth, 1.0, 0.0), k, HX)
    flags0 = jnp.ones((nby * nbx,), jnp.int32)

    fshape = jax.ShapeDtypeStruct((H + 2 * k, W + 2 * HX), jnp.float32)
    call = pl.pallas_call(
        functools.partial(_kernel2d, k, HX, ty, tx, nby, nbx),
        grid=(nby, nbx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(fshape, fshape,
                   jax.ShapeDtypeStruct((nby * nbx,), jnp.int32)),
        input_output_aliases={3: 0, 4: 1},  # apad -> aout, vpad -> vout
        scratch_shapes=[
            pltpu.VMEM((ty + 2 * k, tx + 2 * HX), jnp.float32),
            pltpu.VMEM((ty + 2 * k, tx + 2 * HX), jnp.float32),
            pltpu.VMEM((ty + 2 * k, tx + 2 * HX), jnp.int32),
            pltpu.VMEM((ty + 2 * k, tx + 2 * HX), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def cond(carry):
        _, _, flags, it = carry
        return jnp.any(flags != 0) & (it < max_iters)

    def body(carry):
        apad, vpad, flags, it = carry
        aout, vout, chg = call(flags, ppad, areapad, apad, vpad)
        return (_refresh_xwrap(aout, HX), _refresh_xwrap(vout, HX), chg,
                it + k)

    apad, vpad, _, _ = jax.lax.while_loop(
        cond, body, (apad0, vpad0, flags0, 0))
    A = apad[k:-k, HX:-HX]
    vis = vpad[k:-k, HX:-HX]
    return A, vis > 0.5


def _fused_change(A, a0, vis, vis0, mode):
    ch = jnp.zeros(A.shape, bool)
    if mode in ('both', 'A'):
        ch = ch | (A != a0)
    if mode in ('both', 'vis'):
        ch = ch | (vis != vis0)
    return ch


def _kernel_fused(K, band, nbands, W, NW, max_rounds, mode, ppad, areapad,
                  apad, vpad, aout, vout, it_ref,
                  avm, vvm, pvm, arvm, anv, vnv, pnv, arnv, sem,
                  plo, phi_, clo, chi_):
    """Whole solve in ONE kernel launch: the round loop, per-band active
    skipping, the convergence test, AND active-column tracking all run
    on-core.

    Two workload reducers on top of the banded relaxation:

    - **Active-range skipping** (SMEM ``plo/phi_`` per band): a band runs
      only if the merged change range of itself and its row neighbors from
      the previous round is nonempty (change moves <= K <= band rows per
      round).  Rounds walk the bands serpentine (even rounds south->north,
      odd reversed): Gauss-Seidel in both directions, so drainage running
      against the band order still moves multiple bands per round.
    - **Narrow windows**: the convergence tail is a handful of long rivers
      whose frontier spans ~K columns; when the merged range (padded by K
      propagation + M=128 DMA-alignment margin each side) fits in an
      NW-column window away from the dateline seam, the band is DMA'd,
      swept, and written back through that window — per-sweep cost drops
      by W/NW (4x at 2048).  A range touching the seam falls back to full
      width (the narrow window is not x-periodic).

    Correctness of the margins: A and vis are monotone nondecreasing under
    the sweep (sums/ORs of nonnegative contributions from below the
    fixpoint), so the final-vs-start change mask captures every cell that
    moved, and a cell can only move if an input within K columns moved
    last round.  aout/vout alias apad/vpad: the padded carries in HBM are
    read and written in place, later bands seeing earlier bands' same-
    round writes.
    """
    i32 = jnp.int32
    M = 128           # DMA lane-alignment margin (writeback offsets)
    BIG = 1 << 30

    for b in range(nbands):
        plo[b] = 0
        phi_[b] = W - 1

    def dma(copies):
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    def run_full(b, *_):
        r0 = b * band
        win = (pl.ds(r0, band + 2 * K), slice(None))
        dma([pltpu.make_async_copy(src.at[win], dst, sem.at[n])
             for n, (src, dst) in enumerate(
                 ((aout, avm), (vout, vvm), (ppad, pvm), (areapad, arvm)))])
        a0 = avm[...]
        vis0 = vvm[...]
        A, vis = _sweep_body(K, pvm[...], arvm[...], a0, vis0, mode=mode)
        ch = _fused_change(A, a0, vis, vis0, mode)[K:-K, :]
        avm[...] = A
        vvm[...] = vis
        interior = (pl.ds(K, band), slice(None))
        out_at = (pl.ds(r0 + K, band), slice(None))
        dma([pltpu.make_async_copy(vm.at[interior], out.at[out_at],
                                   sem.at[n])
             for n, (vm, out) in enumerate(((avm, aout), (vvm, vout)))])
        return _change_range(ch)

    def run_narrow(b, o):
        r0 = b * band
        o = pl.multiple_of(o, 128)  # Mosaic can't infer the alignment
        win = (pl.ds(r0, band + 2 * K), pl.ds(o, NW))
        dma([pltpu.make_async_copy(src.at[win], dst, sem.at[n])
             for n, (src, dst) in enumerate(
                 ((aout, anv), (vout, vnv), (ppad, pnv), (areapad, arnv)))])
        a0 = anv[...]
        vis0 = vnv[...]
        A, vis = _sweep_body(K, pnv[...], arnv[...], a0, vis0,
                             shrink_x=True, mode=mode)
        ch = _fused_change(A, a0, vis, vis0, mode)[K:-K, M:NW - M]
        anv[...] = A
        vnv[...] = vis
        interior = (pl.ds(K, band), pl.ds(M, NW - 2 * M))
        out_at = (pl.ds(r0 + K, band), pl.ds(o + M, NW - 2 * M))
        dma([pltpu.make_async_copy(vm.at[interior], out.at[out_at],
                                   sem.at[n])
             for n, (vm, out) in enumerate(((anv, aout), (vnv, vout)))])
        lo, hi = _change_range(ch)
        return jnp.where(hi >= 0, lo + o + M, BIG), \
            jnp.where(hi >= 0, hi + o + M, -1)

    def band_step(i, carry):
        rnd, anyhi = carry
        b = jnp.where(rnd % 2 == 0, i, nbands - 1 - i)
        bl = jnp.maximum(b - 1, 0)
        br = jnp.minimum(b + 1, nbands - 1)
        rlo = jnp.minimum(jnp.minimum(plo[bl], plo[b]), plo[br])
        rhi = jnp.maximum(jnp.maximum(phi_[bl], phi_[b]), phi_[br])
        active = rhi >= 0

        # narrow window [o, o+NW): changeable cells [rlo-K, rhi+K] must sit
        # inside the aligned writeback region [o+M, o+NW-M)
        if W > NW:  # narrow path statically possible
            o = jnp.maximum((rlo - K - M) // M * M, 0)
            narrow = active & (rlo - K - M >= 0) & (o + NW <= W) \
                & (rhi + K < o + NW - M)
            run = lambda b, o, narrow: jax.lax.cond(  # noqa: E731
                narrow, run_narrow, run_full, b, o)
        else:
            o = jnp.int32(0)
            narrow = jnp.asarray(False)
            run = lambda b, o, narrow: run_full(b, o)  # noqa: E731

        lo, hi = jax.lax.cond(
            active, run,
            lambda b, o, narrow: (i32(BIG), i32(-1)),
            b, o, narrow)
        clo[b] = lo
        chi_[b] = hi
        return rnd, jnp.maximum(anyhi, hi)

    def round_body(carry):
        rnd, _ = carry
        _, anyhi = jax.lax.fori_loop(0, nbands, band_step, (rnd, i32(-1)))
        for b in range(nbands):
            plo[b] = clo[b]
            phi_[b] = chi_[b]
        return rnd + 1, anyhi

    def round_cond(carry):
        rnd, anyhi = carry
        return (anyhi >= 0) & (rnd < max_rounds)

    rnd, _ = jax.lax.while_loop(round_cond, round_body, (i32(0), i32(0)))
    it_ref[0] = rnd


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


