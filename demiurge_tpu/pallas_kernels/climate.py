"""Fused multi-substep climate kernel (Pallas TPU).

ops.temperature.temperature_step runs each substep as its own HBM round
trip (read T + terrain, write T), and the 1/cos(phi)-stretched Laplacian
taps compile to a chain of materialized rolls.  This kernel advances K
substeps per HBM round trip: row bands staged into VMEM with a K-deep halo
(validity shrinks one ring per substep).

Numerics are identical to the XLA path (ops.temperature._substep,
reference src/filter/Temperature.cpp:52-134) with one algebraic
simplification: the model only consumes the SUM of the two spherical
Laplacian components (Temperature.cpp:127-128), and in that sum the
straight taps cancel:

    lx + ly = (2*(a + c + g + i) - 8*e) / (4*dy^2)

where a/c/g/i are the corner taps at (-+1/cos(phi) px, -+1 px) of
src/Shader.h:299-320 (NEAREST-snapped to integer column shifts, as in
core.stencils.texture_laplacian).  The corner taps share their per-row
column shift, so the kernel computes S = T[r-1] + T[r+1] once and applies
a per-row barrel roll (log2 W stages of static roll + per-row bit select)
left and right — all in VMEM.

Topology: full-globe grids only (x periodic, both poles).  Pole halos are
the flipped, half-world-rolled edge rows; because the corner-tap sum is
symmetric in +-dy, halo rows evolve as exact antipodal mirrors of their
physical counterparts with no coefficient swap, so the halo stays valid
for all K substeps.

The per-substep insolation ASR(phi, M) (orbital mechanics, per-row scalar)
is precomputed outside as a (K, rows) table; heat capacity dt/C is folded
into one padded field.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.grid import Grid

PI = math.pi


def _pole_halo(x, k, grid: Grid, south: bool):
    W = grid.width
    if south:
        return jnp.roll(jnp.flip(x[:k, :], 0), -W // 2, 1)
    return jnp.roll(jnp.flip(x[-k:, :], 0), -W // 2, 1)


def _pad_rows_reflect(x, k, grid: Grid):
    """K pole-reflected halo rows at each end (full-globe grids)."""
    south = _pole_halo(x, k, grid, True)
    north = _pole_halo(x, k, grid, False)
    return jnp.concatenate([south, x, north], 0)


def _pad_vec_reflect(v, k):
    """Per-row (H,) vector -> (H+2k,) with flipped (same-|phi|) halos."""
    return np.concatenate([v[:k][::-1], v, v[-k:][::-1]])


def _row_shifts(grid: Grid):
    """Integer column shifts of the stretched corner taps, per row (numpy).

    Matches core.stencils.texture_laplacian's fast path: column
    (c + floor(0.5 + sign/cos(phi))) mod W, computed in f32 like the
    GL fetch."""
    H, W = grid.height, grid.width
    r = np.arange(H, dtype=np.float32)
    t = (r + np.float32(0.5)) / np.float32(H)
    phi = t * np.float32(grid.phi1 - grid.phi0) + np.float32(grid.phi0)
    ic = np.float32(1.0) / np.cos(phi)
    kneg = np.floor(np.float32(0.5) - ic).astype(np.int64) % W
    kpos = np.floor(np.float32(0.5) + ic).astype(np.int64) % W
    return kneg, kpos


def _nstages(W: int) -> int:
    return max(1, int(math.ceil(math.log2(W))))


def _kernel(K, nstages, T_ref, cinv_ref, asr_ref, shifts_ref, dif_ref,
            out_ref):
    """One band: K substeps on a (band+2K, W) block.

    Per-row tables arrive lane-minor — shifts (rows, 2) int32 holding
    (kneg, kpos), asr (rows, K) — so the (rows, 1) slices broadcast along
    lanes without a relayout."""
    T = T_ref[0]
    cinv = cinv_ref[0]
    rows, W = T.shape
    kneg = shifts_ref[0][:, 0:1]
    kpos = shifts_ref[0][:, 1:2]
    diff_scale = dif_ref[0, 0]  # scalar: diffusivity / (4*dy^2)

    for s in range(K):
        asr = asr_ref[0][:, s:s + 1]
        S = pltpu.roll(T, rows - 1, 0) + pltpu.roll(T, 1, 0)
        left = S
        right = S
        for j in range(nstages):
            step = (1 << j) % W
            if step:
                lr = pltpu.roll(left, W - step, 1)   # col c reads c+step
                rr = pltpu.roll(right, W - step, 1)
                left = jnp.where(((kneg >> j) & 1) != 0, lr, left)
                right = jnp.where(((kpos >> j) & 1) != 0, rr, right)
        lap = 2.0 * (left + right) - 8.0 * T
        Tk = T + 273.15
        T2 = Tk * Tk
        olr = (210.0 * 0.93 / 273.4**4) * (T2 * T2)
        T = T + (asr - olr + diff_scale * lap) * cinv
    out_ref[0] = T[K:-K, :]


def climate_supported(grid: Grid, band: int = 128) -> bool:
    return bool(grid.wrap_x and grid.wrap_south and grid.wrap_north
                and grid.height % band == 0 and grid.width % 2 == 0)


@functools.partial(jax.jit,
                   static_argnames=("grid", "substeps", "band", "albedo",
                                    "diffusivity", "interpret"))
def climate_step_pallas(T, terrain, i0, grid: Grid, substeps: int = 10,
                        band: int = 128, albedo: float = 0.30,
                        diffusivity: float = 0.55e6,
                        interpret: bool = False):
    """Drop-in for ops.temperature.temperature_step on full-globe grids.

    Returns (T_new, i0 + substeps).  Same update as the XLA path; the
    Laplacian components are summed before (rather than after) the common
    normalization, an f32 reassociation-level difference.
    """
    from ..ops.temperature import SUBSTEPS_PER_YEAR, YEAR_SECONDS, qday

    H, W = grid.shape
    K = substeps
    assert climate_supported(grid, band) and K <= band, (grid.shape, K)
    nbands = H // band
    rows = band + 2 * K

    # --- per-row tables (static)
    kneg_np, kpos_np = _row_shifts(grid)
    kneg = jnp.asarray(_pad_vec_reflect(kneg_np, K), jnp.int32)
    kpos = jnp.asarray(_pad_vec_reflect(kpos_np, K), jnp.int32)

    r = np.arange(H, dtype=np.float32)
    t = (r + np.float32(0.5)) / np.float32(H)
    phi_np = t * np.float32(grid.phi1 - grid.phi0) + np.float32(grid.phi0)
    phi_pad = jnp.asarray(_pad_vec_reflect(phi_np, K))

    # --- per-substep insolation rows, lane-minor: (H+2K, K)
    i0 = jnp.asarray(i0, jnp.float32)
    M = (2.0 * PI / SUBSTEPS_PER_YEAR) * (i0 + jnp.arange(K, dtype=jnp.float32))
    asr = (1.0 - albedo) * qday(phi_pad.reshape(-1, 1), M.reshape(1, -1))

    # --- heat capacity field folded with dt (Temperature.cpp:131-133)
    atmosphere = 1e7
    C = atmosphere + jnp.where(terrain > 0, atmosphere * 0.5,
                               4 * 1.5 * atmosphere)
    cinv = _pad_rows_reflect(YEAR_SECONDS / SUBSTEPS_PER_YEAR / C, K, grid)

    _, dy = grid.pixelsize_rows()
    diff_scale = jnp.full((1, 1), diffusivity / (4.0 * dy * dy), jnp.float32)

    Tpad = _pad_rows_reflect(T, K, grid)

    def windows(x):
        return jnp.stack([x[i * band:i * band + rows] for i in range(nbands)])

    shifts = jnp.stack([kneg, kpos], axis=1)  # (H+2K, 2) int32

    Tw = windows(Tpad)
    cw = windows(cinv)
    asrw = jnp.stack([asr[i * band:i * band + rows] for i in range(nbands)])
    shw = jnp.stack([shifts[i * band:i * band + rows] for i in range(nbands)])

    # --- group bands by how many barrel-roll stages their rows need: the
    # column shift is 1/cos(phi), so mid-latitude bands need 2-3 stages
    # while only the polar bands need the full log2(W).  One pallas_call
    # per distinct stage count — the mid-latitude calls run ~4x fewer
    # roll+select passes per substep.
    shifts_pad = np.stack([np.asarray(_pad_vec_reflect(kneg_np, K)),
                           np.asarray(_pad_vec_reflect(kpos_np, K))], 1)

    def band_stages(b):
        s = shifts_pad[b * band:b * band + rows]
        m = int(s.max())
        return max(1, m.bit_length())

    stage_groups: dict = {}
    for b in range(nbands):
        stage_groups.setdefault(min(band_stages(b), _nstages(W)), []).append(b)

    outs = [None] * nbands
    for nst, bands_ in sorted(stage_groups.items()):
        sel = jnp.asarray(bands_, jnp.int32)
        Tg = Tw[sel]
        cg = cw[sel]
        ag = asrw[sel]
        sg = shw[sel]
        ng = len(bands_)
        spec2 = pl.BlockSpec((1, rows, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        og = pl.pallas_call(
            functools.partial(_kernel, K, nst),
            grid=(ng,),
            in_specs=[
                spec2, spec2,
                pl.BlockSpec((1, rows, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, band, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ng, band, W), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(Tg, cg, ag, sg, diff_scale)
        for k, b in enumerate(bands_):
            outs[b] = og[k]

    return jnp.concatenate(outs, 0), i0 + K
