"""Fused multi-iteration spherical blur (Pallas TPU).

ops.blur runs each sigma-decomposition iteration as a vertical + a
horizontal 13-tap pass; on the XLA path every stretched horizontal tap
materializes its banded static rolls in HBM, so the radius-0.5 pre-blur
of the flow filter costs ~80 HBM passes (~1.3 ms at 2048x1024).  This
kernel runs ALL iterations on VMEM-resident row bands:

- vertical: for the small per-iteration radii of the decomposition every
  tap offset is < 1 row, so the symmetric 13-tap pass COLLAPSES to
  alpha*f + beta*(f_up + f_dn) with scalar alpha/beta per iteration
  (2 sublane rolls + FMA).
- horizontal: the 1/cos(phi)-stretched taps are per-row fractional
  column offsets; the integer parts ride per-row barrel rolls (log2 W
  stages of static roll + bit select, split by tap sign) and the
  fractional parts one extra +-1 roll + lerp.  Bands are grouped by the
  barrel stage count their rows need — the equatorial bulk pays 1-2
  stages, only the polar bands the full log2(W).
- pole topology: bands carry 8 reflect-padded halo rows (flip +
  half-world roll).  The whole blur commutes with the antipodal mirror
  symmetry (vertical weights are +-dy symmetric, the stretch depends on
  |phi|, x rolls commute with the half-world roll), so halo rows evolve
  as exact mirrors of their physical counterparts and stay valid for
  every iteration with offsets < 1 (reference pass: BlurMenu.cpp:41-62;
  same argument as pallas_kernels.climate).

Numerics: identical tap positions and weights as ops.blur's fast path;
the vertical collapse and the shared rolls reassociate f32 arithmetic
(allclose, tested in tests/test_pallas.py).
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
from ..ops.blur import _OFFSETS, _W0, _WEIGHTS, sigma_list

_HALO = 8


def _row_cos(grid: Grid, pad: int) -> np.ndarray:
    H = grid.height
    r = np.arange(H, dtype=np.float32)
    t = (r + np.float32(0.5)) / np.float32(H)
    phi = t * np.float32(grid.phi1 - grid.phi0) + np.float32(grid.phi0)
    pf = np.cos(np.abs(phi)).astype(np.float32)
    return np.concatenate([pf[:pad][::-1], pf, pf[-pad:][::-1]])


def _tables(grid: Grid, rlist, pad: int):
    """Per-(iteration, magnitude) integer shifts + fracs, padded rows.

    Positive tap (+dx): reads c+n, c+n+1 with n = floor(dx), frac dx-n.
    Negative tap (-dx): reads c-m, c-m+1 with m = ceil(dx), frac m-dx.
    """
    W = grid.width
    pf = _row_cos(grid, pad)  # (H+2p,)
    npos, fpos, nneg, fneg = [], [], [], []
    for r in rlist:
        for off in _OFFSETS:
            dx = np.float32(off * r) / pf           # magnitude, >= 0
            n = np.floor(dx)
            npos.append(n.astype(np.int64) % W)
            fpos.append((dx - n).astype(np.float32))
            m = np.ceil(dx)
            nneg.append(m.astype(np.int64) % W)
            fneg.append((m - dx).astype(np.float32))
    return (np.stack(npos, 1), np.stack(fpos, 1),
            np.stack(nneg, 1), np.stack(fneg, 1))  # (H+2p, 3*n_iter)


def _kernel(n_iter, nstages, W, alpha, beta, T_ref, np_ref, fp_ref,
            nn_ref, fn_ref, out_ref):
    f = T_ref[0]
    rows = f.shape[0]

    def barrel(x, shifts, direction):
        # direction +1: result[c] = x[c + s] (reads to the right)
        # direction -1: result[c] = x[c - s]
        out = x
        for j in range(nstages):
            step = (1 << j) % W
            if step:
                rolled = pltpu.roll(out, (W - step) if direction > 0
                                    else step, 1)
                out = jnp.where(((shifts >> j) & 1) != 0, rolled, out)
        return out

    for i in range(n_iter):
        # vertical (collapsed 13-tap, offsets < 1)
        f = (alpha[i] * f
             + beta[i] * (pltpu.roll(f, 1, 0)
                          + pltpu.roll(f, rows - 1, 0)))
        # horizontal
        out = _W0 * f
        for t in range(3):
            col = i * 3 + t
            w = _WEIGHTS[t]
            n_p = np_ref[0][:, col:col + 1]
            f_p = fp_ref[0][:, col:col + 1]
            gp = barrel(f, n_p, +1)
            gp1 = pltpu.roll(gp, W - 1, 1)
            out = out + w * ((1.0 - f_p) * gp + f_p * gp1)
            n_n = nn_ref[0][:, col:col + 1]
            f_n = fn_ref[0][:, col:col + 1]
            gn = barrel(f, n_n, -1)
            gn1 = pltpu.roll(gn, W - 1, 1)
            out = out + w * ((1.0 - f_n) * gn + f_n * gn1)
        f = out
    out_ref[0] = f[_HALO:-_HALO, :]


def blur_resident_supported(grid: Grid, radius: float,
                            band: int = 128) -> bool:
    if not (grid.wrap_x and grid.wrap_south and grid.wrap_north):
        return False
    if grid.height % band or grid.width % 128:
        return False
    rlist = sigma_list(radius)
    if not rlist or len(rlist) > _HALO:
        return False
    return max(rlist) * _OFFSETS[-1] < 1.0  # vertical collapse valid


@functools.partial(jax.jit, static_argnames=("grid", "radius", "band",
                                             "interpret"))
def blur_pallas(field, grid: Grid, radius: float, band: int = 128,
                interpret: bool = False):
    """Drop-in for ops.blur.blur on full-globe grids with small
    per-iteration radii (the flow pre-blur regime)."""
    H, W = grid.shape
    rlist = sigma_list(radius)
    assert blur_resident_supported(grid, radius, band), (grid.shape, radius)
    n_iter = len(rlist)
    nbands = H // band
    rows = band + 2 * _HALO

    # vertical collapse coefficients
    alpha, beta = [], []
    for r in rlist:
        a = _W0
        b = 0.0
        for off, w in zip(_OFFSETS, _WEIGHTS):
            oy = off * r
            a += 2.0 * w * (1.0 - oy)
            b += w * oy
        alpha.append(np.float32(a))
        beta.append(np.float32(b))

    npos, fpos, nneg, fneg = _tables(grid, rlist, _HALO)

    # reflect-pad rows (pole halo: flip + half-world roll)
    head = jnp.roll(jnp.flip(field[:_HALO, :], 0), -(W // 2), 1)
    tail = jnp.roll(jnp.flip(field[-_HALO:, :], 0), -(W // 2), 1)
    fpad = jnp.concatenate([head, field, tail], 0)

    def windows(x):
        return jnp.stack([x[i * band:i * band + rows] for i in
                          range(nbands)])

    Tw = windows(fpad)
    tabs = [windows(jnp.asarray(t, jnp.int32 if t.dtype == np.int64
                                else jnp.float32))
            for t in (npos, fpos, nneg, fneg)]

    # group bands by barrel stage count (equatorial bulk: 1-2 stages)
    full = max(1, int(math.ceil(math.log2(W))))
    shifts_all = np.concatenate([npos, nneg], 1)

    def band_stages(b):
        s = shifts_all[b * band:b * band + rows]
        return min(max(1, int(s.max()).bit_length()), full)

    groups: dict = {}
    for b in range(nbands):
        groups.setdefault(band_stages(b), []).append(b)

    outs = [None] * nbands
    spec = pl.BlockSpec((1, rows, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, rows, 3 * n_iter), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    for nst, bands_ in sorted(groups.items()):
        sel = jnp.asarray(bands_, jnp.int32)
        og = pl.pallas_call(
            functools.partial(_kernel, n_iter, nst, W, alpha, beta),
            grid=(len(bands_),),
            in_specs=[spec, tspec, tspec, tspec, tspec],
            out_specs=pl.BlockSpec((1, band, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((len(bands_), band, W),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(Tw[sel], tabs[0][sel], tabs[1][sel], tabs[2][sel], tabs[3][sel])
        for k, b in enumerate(bands_):
            outs[b] = og[k]
    return jnp.concatenate(outs, 0)
