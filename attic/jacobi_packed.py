"""Packed-obstacle resident Jacobi kernel — measured dead end (round 5).

Replaces the 5-6 per-pixel f32 coefficient arrays of
pallas_kernels.jacobi._kernel_resident with one int32 obstacle-bit field
plus per-row metric scalars, on the hypothesis that the resident sweeps
were VMEM-bandwidth-bound.  Measured on v5e at 2048x1024 (tools race,
same process): pressure 200 sweeps 2.18 -> 4.34 ms, viscosity 48x2
sweeps 1.11 -> 1.78 ms — the sweeps are VPU-op-bound, and the 4
bit-test/select pairs cost more than the 3-4 saved coefficient loads.
Results match the production kernel to ~2e-6 relative (interpret test at
the time of the move).  Kept for the record per docs/PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.core.topology import shift
from demiurge_tpu.pallas_kernels.jacobi import (
    _pad_rows,
    _pole_halo,
)


def _kernel_resident_packed(k, nrounds, rem, R, W, B, nfields, has_b,
                            sea_mask, wrapS, wrapN, negate, *refs):
    """Packed variant of _kernel_resident: instead of 5-6 per-pixel f32
    coefficient arrays, each sweep reads ONE int32 obstacle-bit field
    (bits 0..3 = N/S/E/W neighbor solid -> select center, bit 4 = land)
    plus per-ROW metric scalars (lane-minor (R, 8) table: col 0 = cx,
    1 = cy, 2 = c0).  Same fixpoint; cuts per-sweep VMEM traffic ~2x
    (the sweeps are VMEM-bandwidth-bound).  Pole-halo N/S role swap is
    baked into the padded obstacle bits (_pack_ob)."""
    ncoef = 2 + has_b  # ob, rowtab[, b]
    ins = refs[:ncoef]
    fins = refs[ncoef:ncoef + nfields]
    outs = refs[ncoef + nfields:ncoef + 2 * nfields]
    scr = refs[ncoef + 2 * nfields:]
    obvm = scr[0]
    rowvm = scr[1]
    bvm = scr[2] if has_b else None
    fbufs = scr[ncoef:ncoef + 2 * nfields]
    sem = scr[-1]

    def dma(pairs):
        copies = [pltpu.make_async_copy(src, dst, sem.at[n])
                  for n, (src, dst) in enumerate(pairs)]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    dma([(ins[i], scr[i]) for i in range(ncoef)]
        + [(fins[i], fbufs[2 * i].at[pl.ds(8, R)]) for i in range(nfields)])
    zrow = jnp.zeros((8, W), jnp.float32)
    for i in range(nfields):
        for buf in (fbufs[2 * i], fbufs[2 * i + 1]):
            buf[pl.ds(0, 8), :] = zrow
            buf[pl.ds(R + 8, 8), :] = zrow

    # uniform blocks under a fori_loop: only ONE block's temporaries are
    # live at a time (the fully unrolled form blew Mosaic's scoped-vmem
    # stack at 2 fields); B divides R and is 8-aligned (_pick_block)
    nblocks = R // B

    def one_sweep(src, dst):
        def blk_body(i, carry):
            p0 = pl.multiple_of(i * B, 8)
            slab = src[pl.ds(p0, B + 16), :]
            up = jax.lax.slice_in_dim(slab, 9, 9 + B, axis=0)
            dn = jax.lax.slice_in_dim(slab, 7, 7 + B, axis=0)
            ce = jax.lax.slice_in_dim(slab, 8, 8 + B, axis=0)
            pE = pltpu.roll(ce, W - 1, 1)   # reads col c+1
            pW = pltpu.roll(ce, 1, 1)       # reads col c-1
            ob = obvm[pl.ds(p0, B), :]
            upx = jnp.where((ob & 1) != 0, ce, up)
            dnx = jnp.where((ob & 2) != 0, ce, dn)
            pEx = jnp.where((ob & 4) != 0, ce, pE)
            pWx = jnp.where((ob & 8) != 0, ce, pW)
            cx = rowvm[pl.ds(p0, B), 0:1]
            cy = rowvm[pl.ds(p0, B), 1:2]
            out = cx * (pEx + pWx) + cy * (upx + dnx)
            if has_b:
                out = out + bvm[pl.ds(p0, B), :]
            else:
                out = out + rowvm[pl.ds(p0, B), 2:3] * ce
            if sea_mask:
                out = jnp.where((ob & 16) != 0, 0.0, out)
            dst[pl.ds(p0 + 8, B), :] = out
            return carry

        jax.lax.fori_loop(0, nblocks, blk_body, 0)

    sgn = -1.0 if negate else 1.0

    def _rev_halo(src):
        rev = jnp.concatenate(
            [jax.lax.slice_in_dim(src, k - 1 - j, k - j, axis=0)
             for j in range(k)], axis=0)
        return sgn * pltpu.roll(rev, W // 2, 1)

    def refresh(buf):
        if wrapS:
            slab = buf[pl.ds(8, 2 * k), :]
            src = jax.lax.slice_in_dim(slab, k, 2 * k, axis=0)
            buf[pl.ds(8, 2 * k), :] = jnp.concatenate(
                [_rev_halo(src), src], axis=0)
        if wrapN:
            slab = buf[pl.ds(8 + R - 2 * k, 2 * k), :]
            src = jax.lax.slice_in_dim(slab, 0, k, axis=0)
            buf[pl.ds(8 + R - 2 * k, 2 * k), :] = jnp.concatenate(
                [src, _rev_halo(src)], axis=0)

    def double_sweep(i, carry):
        for f in range(nfields):
            one_sweep(fbufs[2 * f], fbufs[2 * f + 1])
        for f in range(nfields):
            one_sweep(fbufs[2 * f + 1], fbufs[2 * f])
        return carry

    def round_body(r, carry):
        jax.lax.fori_loop(0, k // 2, double_sweep, 0)
        for f in range(nfields):
            refresh(fbufs[2 * f])
        return carry

    jax.lax.fori_loop(0, nrounds, round_body, 0)
    if rem:
        jax.lax.fori_loop(0, rem // 2, double_sweep, 0)

    dma([(fbufs[2 * i].at[pl.ds(8, R)], outs[i]) for i in range(nfields)])


def _pack_ob(terrain, grid: Grid, k: int, sea_bit: bool):
    """Padded (R, W) int32 obstacle bits for the packed resident kernel.

    bits: 1 = N solid, 2 = S solid, 4 = E solid, 8 = W solid, 16 = land.
    Clamp (non-pole-wrap) edges set the out-of-range direction's bit
    (GL_CLAMP_TO_EDGE: the missing neighbor IS the center).  Pole halo
    rows are flipped + half-world-rolled with the N/S bits swapped (the
    sphere's 'north' is the padded array's 'south' there)."""
    H, W = grid.shape
    oN = (shift(terrain, 0, 1, grid) > 0).astype(jnp.int32)
    oS = (shift(terrain, 0, -1, grid) > 0).astype(jnp.int32)
    oE = (shift(terrain, 1, 0, grid) > 0).astype(jnp.int32)
    oW = (shift(terrain, -1, 0, grid) > 0).astype(jnp.int32)
    ob = oN | (oS << 1) | (oE << 2) | (oW << 3)
    if sea_bit:
        ob = ob | jnp.where(terrain > 0, 16, 0)
    ob_sw = oS | (oN << 1) | (oE << 2) | (oW << 3)  # N/S roles swapped
    if sea_bit:
        ob_sw = ob_sw | jnp.where(terrain > 0, 16, 0)
    wrapS = grid.wrap_south and grid.wrap_x
    wrapN = grid.wrap_north and grid.wrap_x
    if wrapS:
        south = _pole_halo(ob_sw, k, grid, True)
    else:
        south = jnp.broadcast_to(ob[:1, :] | 2, (k, W))  # never read
    if wrapN:
        north = _pole_halo(ob_sw, k, grid, False)
    else:
        north = jnp.broadcast_to(ob[-1:, :] | 1, (k, W))
    obp = jnp.concatenate([south, ob, north], 0)
    if not wrapS:   # clamp: global row 0 has no southern neighbor
        obp = obp.at[k, :].set(obp[k, :] | 2)
    if not wrapN:
        obp = obp.at[k + H - 1, :].set(obp[k + H - 1, :] | 1)
    return obp


def _row_table(grid: Grid, k: int, mode: str):
    """Lane-minor (R, 8) per-row metric scalars, flip-padded: col 0 = cx,
    1 = cy, 2 = c0 (diffusion center weight)."""
    H, W = grid.shape
    dxr, dyr = grid.pixelsize_rows()   # (H,1), scalar
    if mode == "pressure":
        pw2x = (dxr / 420.0) ** 2
        pw2y = (dyr / 420.0) ** 2
        beta = 2 * (1 / pw2x + 1 / pw2y)
        cx = 1.0 / pw2x / beta
        cy = jnp.broadcast_to(1.0 / pw2y / beta, (H, 1))
        c0 = jnp.zeros((H, 1), jnp.float32)
    else:
        wx = (420.0 / dxr) ** 2
        wy = (420.0 / dyr) ** 2 * jnp.ones_like(wx)
        beta = 2 * (wx + wy) * (1 + 1 / (2 * (wx + wy)))
        cx = wx / beta
        cy = wy / beta
        c0 = 1.0 / beta
    tab = jnp.concatenate(
        [cx, cy, c0, jnp.zeros((H, 5), jnp.float32)], axis=1)
    return jnp.concatenate([jnp.flip(tab[:k], 0), tab,
                            jnp.flip(tab[-k:], 0)], 0)


def _pick_block(R: int, cap: int = 256) -> int:
    """Largest 8-aligned divisor of R up to ``cap`` (R is 8-aligned by
    _resident_ok)."""
    best = 8
    for b in range(8, cap + 1, 8):
        if R % b == 0:
            best = b
    return best


def _resident_call_packed(ob, rowtab, b, fields, grid: Grid, k: int,
                          iters: int, sea_mask: bool, negate: bool,
                          interpret: bool = False, block: int = 0):
    H, W = grid.shape
    R = H + 2 * k
    block = block or _pick_block(R)
    has_b = b is not None
    nfields = len(fields)
    nrounds = iters // k
    rem = iters - nrounds * k
    wrapS = bool(grid.wrap_south and grid.wrap_x)
    wrapN = bool(grid.wrap_north and grid.wrap_x)

    fshape = jax.ShapeDtypeStruct((R, W), jnp.float32)
    ins = [ob, rowtab] + ([b] if has_b else [])
    ncoef = len(ins)
    outs = pl.pallas_call(
        functools.partial(_kernel_resident_packed, k, nrounds, rem, R, W,
                          block, nfields, has_b, sea_mask, wrapS, wrapN,
                          negate),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (ncoef + nfields),
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * nfields),
        out_shape=tuple([fshape] * nfields),
        input_output_aliases={ncoef + i: i for i in range(nfields)},
        scratch_shapes=[pltpu.VMEM((R, W), jnp.int32),
                        pltpu.VMEM((R, 8), jnp.float32)]
        + ([pltpu.VMEM((R, W), jnp.float32)] if has_b else [])
        + [pltpu.VMEM((R + 16, W), jnp.float32)] * (2 * nfields)
        + [pltpu.SemaphoreType.DMA((max(ncoef + nfields, 2),))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins, *fields)
    outs = outs if isinstance(outs, (list, tuple)) else (outs,)
    return [o[k:-k] for o in outs]


