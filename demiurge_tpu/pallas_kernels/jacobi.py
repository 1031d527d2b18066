"""Fused multi-sweep Jacobi pressure solver (Pallas TPU kernel).

The XLA path (ops.ocean.pressure_solve) runs one 5-point sweep per HBM
round-trip (~66us/iteration floor at 2048x1024 on a v5e).  This kernel
performs K sweeps per HBM round-trip: row bands are staged into VMEM with a
K-deep halo, swept K times locally (the valid interior shrinks one ring per
sweep, exactly covering the halo), and written back — cutting HBM traffic
and loop overhead by ~K.

The sweep is algebraically identical to the reference formula
(OceanCurrents.cpp:450-481): obstacle masks and metric terms are folded
into 5 per-pixel coefficient fields + a constant term:

    p' = cN*pN + cS*pS + cE*pE + cW*pW + cC*p + b

with cN = (1-oN)/pw2y/beta etc (masked weight redirected onto the center:
Neumann walls), b = -div/beta, everything zeroed on land.

Topology handling:
- E/W neighbors are lane rolls — dateline-periodic, globally correct.
- N/S use the sublane dimension of the padded band.
- Polar rows: the beyond-pole neighbor is the antipodal same-latitude row,
  so the pole halo is the flipped, half-world-rolled copy of the edge rows
  — and because walking "north" across the pole turns into walking south,
  the halo rows' own sweep updates need their cN/cS coefficients swapped
  (their padded-space row adjacency is reversed).  Non-periodic (clamp)
  edges fold the out-of-range neighbor weight onto the center instead.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.grid import Grid
from ..core.topology import shift


def _coefficients(divw, terrain, grid: Grid):
    """Fold masks + metric into per-pixel sweep coefficients."""
    dxr, dyr = grid.pixelsize_rows()
    pw2x = jnp.broadcast_to((dxr / 420.0) ** 2, grid.shape)
    pw2y = jnp.broadcast_to((dyr / 420.0) ** 2 * jnp.ones_like(dxr),
                            grid.shape)
    beta = 2 * (1 / pw2x + 1 / pw2y)

    oN = (shift(terrain, 0, 1, grid) > 0).astype(jnp.float32)
    oS = (shift(terrain, 0, -1, grid) > 0).astype(jnp.float32)
    oE = (shift(terrain, 1, 0, grid) > 0).astype(jnp.float32)
    oW = (shift(terrain, -1, 0, grid) > 0).astype(jnp.float32)
    sea = (terrain <= 0).astype(jnp.float32)

    cx = 1.0 / pw2x / beta
    cy = 1.0 / pw2y / beta
    cN = (1 - oN) * cy * sea
    cS = (1 - oS) * cy * sea
    cE = (1 - oE) * cx * sea
    cW = (1 - oW) * cx * sea
    cC = (oN * cy + oS * cy + oE * cx + oW * cx) * sea
    b = -divw / beta * sea

    # clamp (non-pole-wrap) edges: the out-of-range neighbor is the center
    # itself (GL_CLAMP_TO_EDGE), so fold that weight into cC and zero the
    # neighbor coefficient — halo contents then never matter there.
    if not (grid.wrap_south and grid.wrap_x):
        cC = cC.at[0, :].add(cS[0, :])
        cS = cS.at[0, :].set(0.0)
    if not (grid.wrap_north and grid.wrap_x):
        cC = cC.at[-1, :].add(cN[-1, :])
        cN = cN.at[-1, :].set(0.0)
    return cN, cS, cE, cW, cC, b


def _pole_halo(x, k, grid: Grid, south: bool):
    W = grid.width
    if south:
        return jnp.roll(jnp.flip(x[:k, :], 0), -W // 2, 1)
    return jnp.roll(jnp.flip(x[-k:, :], 0), -W // 2, 1)


def _pad_rows(x, k, grid: Grid, negate: bool = False):
    """K halo rows at each end: pole-reflected antipodal rows on global
    grids, edge copies otherwise (contents irrelevant there after the
    clamp fold).  ``negate`` flips the sign of the pole halos — velocity
    components reverse when the geodesic walk crosses a pole
    (OceanCurrents.cpp:389/657)."""
    H, W = x.shape
    sgn = -1.0 if negate else 1.0
    if grid.wrap_south and grid.wrap_x:
        south = sgn * _pole_halo(x, k, grid, True)
    else:
        south = jnp.broadcast_to(x[:1, :], (k, W))
    if grid.wrap_north and grid.wrap_x:
        north = sgn * _pole_halo(x, k, grid, False)
    else:
        north = jnp.broadcast_to(x[-1:, :], (k, W))
    return jnp.concatenate([south, x, north], 0)


def _pad_coeff(cN, cS, other, k, grid: Grid):
    """Pad a (cN, cS) pair with the N/S roles swapped in reflected halos;
    'other' coefficients pad plainly."""
    H, W = cN.shape
    wrapS = grid.wrap_south and grid.wrap_x
    wrapN = grid.wrap_north and grid.wrap_x
    southN = _pole_halo(cS, k, grid, True) if wrapS else \
        jnp.broadcast_to(cN[:1, :], (k, W))
    southS = _pole_halo(cN, k, grid, True) if wrapS else \
        jnp.broadcast_to(cS[:1, :], (k, W))
    northN = _pole_halo(cS, k, grid, False) if wrapN else \
        jnp.broadcast_to(cN[-1:, :], (k, W))
    northS = _pole_halo(cN, k, grid, False) if wrapN else \
        jnp.broadcast_to(cS[-1:, :], (k, W))
    pN = jnp.concatenate([southN, cN, northN], 0)
    pS = jnp.concatenate([southS, cS, northS], 0)
    return pN, pS, [_pad_rows(c, k, grid) for c in other]


def _windows(x, band, k, nbands):
    """Stack overlapping (band+2k)-row windows -> (nbands, band+2k, W)."""
    return jnp.stack([x[i * band:i * band + band + 2 * k]
                      for i in range(nbands)], 0)


def _kernel(k, p_ref, cN_ref, cS_ref, cE_ref, cW_ref, cC_ref, b_ref,
            out_ref):
    p = p_ref[0]
    cN = cN_ref[0]
    cS = cS_ref[0]
    cE = cE_ref[0]
    cW = cW_ref[0]
    cC = cC_ref[0]
    b = b_ref[0]
    rows = p.shape[0]
    for _ in range(k):
        pN = pltpu.roll(p, rows - 1, 0)   # row r reads r+1
        pS = pltpu.roll(p, 1, 0)          # row r reads r-1
        pE = pltpu.roll(p, p.shape[1] - 1, 1)
        pW = pltpu.roll(p, 1, 1)
        p = cN * pN + cS * pS + cE * pE + cW * pW + cC * p + b
    out_ref[0] = p[k:-k, :]


def _kernel2(k, u_ref, v_ref, cN_ref, cS_ref, cE_ref, cW_ref, cC_ref,
             ou_ref, ov_ref):
    """Two fields through the same 5-point sweep (no constant term), the
    coefficient windows read from HBM once for both."""
    u = u_ref[0]
    v = v_ref[0]
    cN = cN_ref[0]
    cS = cS_ref[0]
    cE = cE_ref[0]
    cW = cW_ref[0]
    cC = cC_ref[0]
    rows, W = u.shape
    for _ in range(k):
        uN = pltpu.roll(u, rows - 1, 0)
        uS = pltpu.roll(u, 1, 0)
        uE = pltpu.roll(u, W - 1, 1)
        uW = pltpu.roll(u, 1, 1)
        u = cN * uN + cS * uS + cE * uE + cW * uW + cC * u
        vN = pltpu.roll(v, rows - 1, 0)
        vS = pltpu.roll(v, 1, 0)
        vE = pltpu.roll(v, W - 1, 1)
        vW = pltpu.roll(v, 1, 1)
        v = cN * vN + cS * vS + cE * vE + cW * vW + cC * v
    ou_ref[0] = u[k:-k, :]
    ov_ref[0] = v[k:-k, :]


def _kernel_resident(k, nrounds, rem, R, W, B, nfields, has_b, wrapS, wrapN,
                     negate, *refs):
    """Whole solve in ONE launch, everything VMEM-resident.

    The banded drivers re-read 6 coefficient windows from HBM every k-sweep
    round; here the coefficients are DMA'd to VMEM once and the full
    nrounds*k sweeps run on-core.  Field buffers are (R+16, W): 8 scratch
    margin rows at each end so every row block can read an 8-aligned slab
    and take +-1-row value slices (Mosaic sublane alignment rule).

    Pole halos (k rows each end) self-evolve for k sweeps via the
    N/S-swapped halo coefficients (_pad_coeff); after each round they are
    refreshed from the interior edge rows: halo row j <- interior row
    (2k-1-j) rolled half the world in longitude (crossing a pole adds pi
    to lambda; ``negate`` flips the sign for velocity fields).  Clamp
    (non-pole-wrap) edges skip the refresh — their halo contents are
    irrelevant after the coefficient fold.

    Ref layout: ins cN,cS,cE,cW,cC[,b] then fields x nfields (ANY, (R,W));
    outs fields x nfields (aliased); scratch: coeff VMEM x(5+has_b) (R,W),
    (ping, pong) VMEM x nfields (R+16, W), sem.
    """
    ncoef = 5 + has_b
    ins = refs[:ncoef]
    fins = refs[ncoef:ncoef + nfields]
    outs = refs[ncoef + nfields:ncoef + 2 * nfields]
    scr = refs[ncoef + 2 * nfields:]
    cvs = scr[:ncoef]
    fbufs = scr[ncoef:ncoef + 2 * nfields]
    sem = scr[-1]

    def dma(pairs):
        copies = [pltpu.make_async_copy(src, dst, sem.at[n])
                  for n, (src, dst) in enumerate(pairs)]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    dma([(ins[i], cvs[i]) for i in range(ncoef)]
        + [(fins[i], fbufs[2 * i].at[pl.ds(8, R)]) for i in range(nfields)])
    zrow = jnp.zeros((8, W), jnp.float32)
    for i in range(nfields):
        for buf in (fbufs[2 * i], fbufs[2 * i + 1]):
            buf[pl.ds(0, 8), :] = zrow
            buf[pl.ds(R + 8, 8), :] = zrow

    blocks = [(p0, min(B, R - p0)) for p0 in range(0, R, B)]

    def one_sweep(src, dst):
        for p0, rows_b in blocks:
            slab = src[pl.ds(p0, rows_b + 16), :]
            up = jax.lax.slice_in_dim(slab, 9, 9 + rows_b, axis=0)
            dn = jax.lax.slice_in_dim(slab, 7, 7 + rows_b, axis=0)
            ce = jax.lax.slice_in_dim(slab, 8, 8 + rows_b, axis=0)
            pE = pltpu.roll(ce, W - 1, 1)   # reads col c+1
            pW = pltpu.roll(ce, 1, 1)       # reads col c-1
            blk = (pl.ds(p0, rows_b), slice(None))
            out = (cvs[0][blk] * up + cvs[1][blk] * dn
                   + cvs[2][blk] * pE + cvs[3][blk] * pW
                   + cvs[4][blk] * ce)
            if has_b:
                out = out + cvs[5][blk]
            dst[pl.ds(p0 + 8, rows_b), :] = out

    sgn = -1.0 if negate else 1.0

    def _rev_halo(src):
        """(k, W) interior rows -> reversed-row, half-world-rolled halo.
        Row reversal = concat of k static single-row value slices (Mosaic
        has no sublane reverse); the lane roll is one static 2-D roll."""
        rev = jnp.concatenate(
            [jax.lax.slice_in_dim(src, k - 1 - j, k - j, axis=0)
             for j in range(k)], axis=0)
        return sgn * pltpu.roll(rev, W // 2, 1)

    def refresh(buf):
        # slab reads/stores at 8-aligned offsets only (sublane rule):
        # south block [8, 8+2k) = [halo rows | interior rows]; the store
        # rewrites the interior half with its own values.
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
        # trailing refresh only touches halo rows (the outputs slice them
        # off), so running it after the final round too is harmless
        for f in range(nfields):
            refresh(fbufs[2 * f])
        return carry

    jax.lax.fori_loop(0, nrounds, round_body, 0)
    if rem:
        # remainder sweeps (even, < k: the fresh halo covers them)
        jax.lax.fori_loop(0, rem // 2, double_sweep, 0)

    dma([(fbufs[2 * i].at[pl.ds(8, R)], outs[i]) for i in range(nfields)])


def _resident_ok(grid: Grid, k: int, iters: int, nfields: int,
                 has_b: bool) -> bool:
    if not grid.wrap_x:
        return False
    # k%4: R = H+2k must stay 8-row aligned (Mosaic slice-size tiling rule);
    # iters%2: the in-kernel ping-pong advances two sweeps per trip
    if k % 4 or iters % 2 or grid.height % 8:
        return False
    R = grid.height + 2 * k
    W = grid.width
    vmem = ((5 + has_b) * R * W + 2 * nfields * (R + 16) * W) * 4
    return vmem <= 88 * 1024 * 1024


def _resident_call(coeffs, fields, grid: Grid, k: int, iters: int,
                   negate: bool, interpret: bool = False, block: int = 128):
    """Shared driver for the resident kernel.  coeffs: 5 or 6 padded (R,W)
    arrays; fields: padded (R,W) arrays (updated in place via aliasing)."""
    H, W = grid.shape
    R = H + 2 * k
    has_b = len(coeffs) == 6
    nfields = len(fields)
    nrounds = iters // k
    rem = iters - nrounds * k
    wrapS = bool(grid.wrap_south and grid.wrap_x)
    wrapN = bool(grid.wrap_north and grid.wrap_x)

    fshape = jax.ShapeDtypeStruct((R, W), jnp.float32)
    ncoef = len(coeffs)
    outs = pl.pallas_call(
        functools.partial(_kernel_resident, k, nrounds, rem, R, W, block,
                          nfields, has_b, wrapS, wrapN, negate),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (ncoef + nfields),
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * nfields),
        out_shape=tuple([fshape] * nfields),
        input_output_aliases={ncoef + i: i for i in range(nfields)},
        scratch_shapes=[pltpu.VMEM((R, W), jnp.float32)] * ncoef
        + [pltpu.VMEM((R + 16, W), jnp.float32)] * (2 * nfields)
        + [pltpu.SemaphoreType.DMA((max(ncoef + nfields, 2),))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*coeffs, *fields)
    outs = outs if isinstance(outs, (list, tuple)) else (outs,)
    return [o[k:-k] for o in outs]


def _pick_kb(H: int, iters: int, kmax: int = 32):
    """(k, band) for the banded sweeps: the deepest halo k that divides
    ``iters`` (exact sweep count) against the widest band dividing H.
    Deeper k = fewer HBM round trips for the same sweeps; the (band+2k)/band
    halo recompute overhead stays <= 1.2."""
    band = next((b for b in (256, 128, 64) if H % b == 0), 0)
    if not band:
        return 0, 0
    for k in (25, 20, 16, 10, 8, 5, 4, 2, 1):
        if k <= min(kmax, band) and iters % k == 0:
            return k, band
    return 1, band  # k=1 always divides iters; keep the exact-divisor invariant


@functools.partial(jax.jit,
                   static_argnames=("grid", "iters", "k", "band",
                                    "interpret"))
def pressure_solve_pallas(divw, terrain, grid: Grid, iters: int = 5000,
                          k: int = 0, band: int = 0, p0=None,
                          interpret: bool = False):
    """Drop-in for ops.ocean.pressure_solve (same fixpoint; f32
    reassociation-level differences).  iters rounds up to a multiple of k;
    k/band default to _pick_kb's deepest exact-divisor choice."""
    H, W = grid.shape
    pk, pband = _pick_kb(H, iters)
    k = k or pk
    band = band or pband
    assert k and band and H % band == 0 and iters % k == 0, (
        grid.shape, iters, k, band)
    cN, cS, cE, cW, cC, b = _coefficients(divw, terrain, grid)
    pcN, pcS, others = _pad_coeff(cN, cS, (cE, cW, cC, b), k, grid)
    nbands = H // band
    coeff_windows = [_windows(c, band, k, nbands)
                     for c in [pcN, pcS] + others]

    p = jnp.zeros_like(divw) if p0 is None else p0

    blk = (1, band + 2 * k, W)
    spec = pl.BlockSpec(blk, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, band, W), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(_kernel, k),
        grid=(nbands,),
        in_specs=[spec] * 7,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nbands, band, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    n_rounds = (iters + k - 1) // k

    def round_fn(p, _):
        pw = _windows(_pad_rows(p, k, grid), band, k, nbands)
        out = call(pw, *coeff_windows)
        return out.reshape(H, W), None

    p, _ = jax.lax.scan(round_fn, p, None, length=n_rounds)
    return p


def pressure_resident_supported(grid: Grid, iters: int, k: int = 20) -> bool:
    return _resident_ok(grid, k, iters, nfields=1, has_b=True)


@functools.partial(jax.jit,
                   static_argnames=("grid", "iters", "k", "interpret"))
def pressure_solve_resident(divw, terrain, grid: Grid, iters: int = 200,
                            k: int = 20, p0=None, interpret: bool = False):
    """Single-launch VMEM-resident Jacobi pressure solve (_kernel_resident):
    same fixpoint/sweep count as pressure_solve_pallas, ~1 HBM round trip
    total instead of one per k sweeps."""
    assert pressure_resident_supported(grid, iters, k), (grid.shape, iters, k)
    cN, cS, cE, cW, cC, b = _coefficients(divw, terrain, grid)
    pcN, pcS, others = _pad_coeff(cN, cS, (cE, cW, cC, b), k, grid)
    p = jnp.zeros_like(divw) if p0 is None else p0
    ppad = _pad_rows(p, k, grid)
    (out,) = _resident_call([pcN, pcS] + others, [ppad], grid, k, iters,
                            negate=False, interpret=interpret)
    return out


def diffusion_resident_supported(grid: Grid, iters: int, k: int = 12) -> bool:
    return bool(grid.wrap_south and grid.wrap_north
                and _resident_ok(grid, k, iters, nfields=2, has_b=False))


@functools.partial(jax.jit,
                   static_argnames=("grid", "iters", "k", "interpret"))
def diffusion_solve_resident(u, v, terrain, grid: Grid, iters: int = 50,
                             k: int = 12, interpret: bool = False):
    """Single-launch VMEM-resident viscosity solve: both components on-core
    for all sweeps, coefficients read once; velocity pole halos sign-flip
    on refresh."""
    assert diffusion_resident_supported(grid, iters, k), (grid.shape, iters)
    cN, cS, cE, cW, cC = _diffusion_coefficients(terrain, grid)
    pcN, pcS, others = _pad_coeff(cN, cS, (cE, cW, cC), k, grid)
    upad = _pad_rows(u, k, grid, negate=True)
    vpad = _pad_rows(v, k, grid, negate=True)
    ou, ov = _resident_call([pcN, pcS] + others, [upad, vpad], grid, k,
                            iters, negate=True, interpret=interpret)
    return ou, ov


# ---------------------------------------------------------------------------
# implicit-viscosity diffusion — the same banded 5-point sweep with b = 0
# ---------------------------------------------------------------------------


def _diffusion_coefficients(terrain, grid: Grid):
    """Fold the viscosity sweep (ops.ocean.diffusion, OceanCurrents.cpp:
    625-708) into 5-point coefficients: newu = cN uN + ... + cC u, with
    obstacle-masked neighbor weights redirected onto the center."""
    dxr, dyr = grid.pixelsize_rows()
    wx = jnp.broadcast_to((420.0 / dxr) ** 2, grid.shape)
    wy = jnp.broadcast_to((420.0 / dyr) ** 2 * jnp.ones_like(dxr), grid.shape)
    beta = 2 * (wx + wy) * (1 + 1 / (2 * (wx + wy)))

    oN = (shift(terrain, 0, 1, grid) > 0).astype(jnp.float32)
    oS = (shift(terrain, 0, -1, grid) > 0).astype(jnp.float32)
    oE = (shift(terrain, 1, 0, grid) > 0).astype(jnp.float32)
    oW = (shift(terrain, -1, 0, grid) > 0).astype(jnp.float32)

    cN = (1 - oN) * wy / beta
    cS = (1 - oS) * wy / beta
    cE = (1 - oE) * wx / beta
    cW = (1 - oW) * wx / beta
    cC = (1 + (oN + oS) * wy + (oE + oW) * wx) / beta
    return cN, cS, cE, cW, cC


def diffusion_supported(grid: Grid, iters: int) -> bool:
    k, band = _pick_kb(grid.height, iters)
    return bool(grid.wrap_x and grid.wrap_south and grid.wrap_north
                and k and band and iters % k == 0)


@functools.partial(jax.jit,
                   static_argnames=("grid", "iters", "k", "band",
                                    "interpret"))
def diffusion_solve_pallas(u, v, terrain, grid: Grid, iters: int = 50,
                           k: int = 0, band: int = 0,
                           interpret: bool = False):
    """Drop-in for ops.ocean.diffusion (intent mode, full-globe grids):
    K sweeps per HBM round trip, both velocity components through one
    kernel so the coefficient windows are read once; velocity pole halos
    are sign-flipped and the N/S coefficients swapped there (crossing a
    pole reverses both the walk direction and the vector).  Same sweep
    count and masks as the XLA scan; f32 reassociation-level differences
    only."""
    H, W = grid.shape
    pk, pband = _pick_kb(H, iters)
    k = k or pk
    band = band or pband
    assert k and band and H % band == 0 and iters % k == 0, (
        grid.shape, iters, k, band)
    cN, cS, cE, cW, cC = _diffusion_coefficients(terrain, grid)
    pcN, pcS, others = _pad_coeff(cN, cS, (cE, cW, cC), k, grid)
    nbands = H // band
    coeff_windows = [_windows(c, band, k, nbands)
                     for c in [pcN, pcS] + others]

    blk = (1, band + 2 * k, W)
    spec = pl.BlockSpec(blk, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, band, W), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_kernel2, k),
        grid=(nbands,),
        in_specs=[spec] * 7,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((nbands, band, W), jnp.float32),
                   jax.ShapeDtypeStruct((nbands, band, W), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def round_fn(carry, _):
        u, v = carry
        uw = _windows(_pad_rows(u, k, grid, negate=True), band, k, nbands)
        vw = _windows(_pad_rows(v, k, grid, negate=True), band, k, nbands)
        nu, nv = call(uw, vw, *coeff_windows)
        return (nu.reshape(H, W), nv.reshape(H, W)), None

    (u, v), _ = jax.lax.scan(round_fn, (u, v), None, length=iters // k)
    return u, v
