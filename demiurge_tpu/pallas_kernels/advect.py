"""Fused semi-Lagrangian tap sampler (Pallas TPU kernel).

The XLA path (ops.ocean._advect_sample_fast) materializes one rolled array
per tap — (2Rx+1)*(2Ry+1) taps × 2 fields of HBM traffic.  This kernel runs
the whole tap loop in VMEM: row bands of (u, v) are staged in with an
Ry-deep halo, every tap is a VMEM lane-roll, and only the final interpolated
fields travel back to HBM.  HBM traffic drops from ~170 arrays to 6.

Semantics identical to the XLA fast path (ops/ocean.py): bilinear as
hat-weighted integer taps, exact for displacements within (Rx, Ry) pixels
and clamped beyond; x periodic over the dateline, y clamp-to-edge
(reference GL_CLAMP_TO_EDGE fetch, src/filter/OceanCurrents.cpp:42-45 —
the backtraced point is always in range, only taps straddle the edge).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_clamp_rows(x, k):
    """k edge-replicated halo rows at each end (GL_CLAMP_TO_EDGE in y)."""
    H, W = x.shape
    top = jnp.broadcast_to(x[:1, :], (k, W))
    bot = jnp.broadcast_to(x[-1:, :], (k, W))
    return jnp.concatenate([top, x, bot], 0)


def _windows(x, band, k, nbands):
    return jnp.stack([x[i * band:i * band + band + 2 * k]
                      for i in range(nbands)], 0)


def _kernel(Rx, Ry, band, u_ref, v_ref, dx_ref, dy_ref, ou_ref, ov_ref):
    dx = dx_ref[0]
    dy = dy_ref[0]
    W = dx.shape[1]

    # incremental static rolls: tap k+1's window is tap k's rolled one more
    # lane, so each tap costs one static single-step roll (a dynamic-shift
    # roll lowers to a full log2(W) barrel) and only one rolled copy is
    # ever live (a fully materialized tap stack blows scoped vmem).
    out_u = jnp.zeros_like(dx)
    out_v = jnp.zeros_like(dx)
    for ky in range(-Ry, Ry + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - ky))
        u_y = u_ref[0, Ry + ky:Ry + ky + band, :]
        v_y = v_ref[0, Ry + ky:Ry + ky + band, :]
        ru0 = pltpu.roll(u_y, Rx % W, 1)    # reads col c - Rx
        rv0 = pltpu.roll(v_y, Rx % W, 1)

        def tap(i, acc, wy=wy):
            ru, rv, ou, ov = acc
            kx = (i - Rx).astype(jnp.float32)
            w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - kx))
            ou = ou + w * ru
            ov = ov + w * rv
            # static single-column advance (dynamic-shift rolls lower to a
            # full log2(W) barrel; a fully unrolled chain OOMs scoped vmem)
            return pltpu.roll(ru, W - 1, 1), pltpu.roll(rv, W - 1, 1), ou, ov

        _, _, out_u, out_v = jax.lax.fori_loop(
            0, 2 * Rx + 1, tap, (ru0, rv0, out_u, out_v))
    ou_ref[0] = out_u
    ov_ref[0] = out_v


def _kernel_polar(Rf, stride, Q, Ry, band, u_ref, v_ref, dx_ref, dy_ref,
                  ou_ref, ov_ref):
    """Polar-strip hybrid: exact hat taps for |dx| <= Rf, stride-``stride``
    coarse hat taps (bilinear on the subsampled lattice) out to
    Q*stride columns beyond.  Polar rows are massively oversampled in x
    (pixel width ~ cos(phi)), so the coarse branch's low-pass is confined
    to sub-physical scales there."""
    dx = dx_ref[0]
    dy = dy_ref[0]
    W = dx.shape[1]
    fine = jnp.abs(dx) <= float(Rf)

    out_u = jnp.zeros_like(dx)
    out_v = jnp.zeros_like(dx)
    for ky in range(-Ry, Ry + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - ky))
        u_y = u_ref[0, Ry + ky:Ry + ky + band, :]
        v_y = v_ref[0, Ry + ky:Ry + ky + band, :]
        # fine taps: incremental single-lane static rolls
        ru0 = pltpu.roll(u_y, (Rf + 1) % W, 1)
        rv0 = pltpu.roll(v_y, (Rf + 1) % W, 1)

        def ftap(i, acc, wy=wy):
            ru, rv, ou, ov = acc
            kx = (i - (Rf + 1)).astype(jnp.float32)
            w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - kx))
            w = jnp.where(fine, w, 0.0)
            ou = ou + w * ru
            ov = ov + w * rv
            return pltpu.roll(ru, W - 1, 1), pltpu.roll(rv, W - 1, 1), ou, ov

        _, _, out_u, out_v = jax.lax.fori_loop(
            0, 2 * (Rf + 1) + 1, ftap, (ru0, rv0, out_u, out_v))

        # coarse taps: incremental static stride rolls
        ru0 = pltpu.roll(u_y, (Q * stride) % W, 1)
        rv0 = pltpu.roll(v_y, (Q * stride) % W, 1)

        def ctap(i, acc, wy=wy):
            ru, rv, ou, ov = acc
            kx = ((i - Q) * stride).astype(jnp.float32)
            w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - kx) / stride)
            w = jnp.where(fine, 0.0, w)
            ou = ou + w * ru
            ov = ov + w * rv
            return (pltpu.roll(ru, (W - stride) % W, 1),
                    pltpu.roll(rv, (W - stride) % W, 1), ou, ov)

        _, _, out_u, out_v = jax.lax.fori_loop(
            0, 2 * Q + 1, ctap, (ru0, rv0, out_u, out_v))
    ou_ref[0] = out_u
    ov_ref[0] = out_v


def _kernel_dyn(Rf, stride, Ry, band, meta_ref, u_ref, v_ref, dx_ref,
                dy_ref, ou_ref, ov_ref):
    """One program per strip, tap bounds from SMEM — a single pallas_call
    covers every radius tier (the per-tier calls each paid a fixed launch
    cost).  meta per strip: (rx, q) — rx <= 16: exact hat taps over
    [-rx, rx] via a dynamic-bound fori of incremental single-lane rolls;
    rx > 16 (polar): exact taps over [-Rf, Rf] plus 2q+1 coarse
    stride-taps (bilinear on the subsampled lattice), same math as
    _kernel_polar."""
    i = pl.program_id(0)
    rx = meta_ref[i, 0]
    q = meta_ref[i, 1]          # 0 = pure fine strip; >0 = polar hybrid
    dx = dx_ref[0]
    dy = dy_ref[0]
    W = dx.shape[1]
    polar = q > 0
    fine_r = jnp.where(polar, Rf, rx)
    fine = jnp.abs(dx) <= fine_r.astype(jnp.float32)

    out_u = jnp.zeros_like(dx)
    out_v = jnp.zeros_like(dx)
    for ky in range(-Ry, Ry + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - ky))
        u_y = u_ref[0, Ry + ky:Ry + ky + band, :]
        v_y = v_ref[0, Ry + ky:Ry + ky + band, :]

        # fine taps: start at -fine_r (one dynamic-amount roll), then
        # advance one lane per tap
        ru0 = pltpu.roll(u_y, fine_r % W, 1)
        rv0 = pltpu.roll(v_y, fine_r % W, 1)

        def ftap(t, acc, wy=wy):
            ru, rv, ou, ov = acc
            kx = (t - fine_r).astype(jnp.float32)
            w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - kx))
            w = jnp.where(fine, w, 0.0)
            ou = ou + w * ru
            ov = ov + w * rv
            return pltpu.roll(ru, W - 1, 1), pltpu.roll(rv, W - 1, 1), ou, ov

        _, _, out_u, out_v = jax.lax.fori_loop(
            0, 2 * fine_r + 1, ftap, (ru0, rv0, out_u, out_v))

        # coarse taps: for non-polar strips q=0 and dx is pre-clamped to
        # |dx| <= rx, so 'fine' covers every pixel and the single masked
        # tap contributes zero — the loop is a no-op, no branch needed
        cu0 = pltpu.roll(u_y, (q * stride) % W, 1)
        cv0 = pltpu.roll(v_y, (q * stride) % W, 1)

        def ctap(t, acc, wy=wy):
            ru, rv, ou, ov = acc
            kx = ((t - q) * stride).astype(jnp.float32)
            w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - kx) / stride)
            w = jnp.where(fine, 0.0, w)
            ou = ou + w * ru
            ov = ov + w * rv
            return (pltpu.roll(ru, (W - stride) % W, 1),
                    pltpu.roll(rv, (W - stride) % W, 1), ou, ov)

        _, _, out_u, out_v = jax.lax.fori_loop(
            0, 2 * q + 1, ctap, (cu0, cv0, out_u, out_v))

    ou_ref[0] = out_u
    ov_ref[0] = out_v


def _pick_band(H: int) -> int:
    for band in (64, 32, 16, 8):
        if H % band == 0:
            return band
    return 0


def advect_sample_supported(H: int) -> bool:
    return _pick_band(H) > 0


def strip_radii(grid, vmax: float, timestep: float, strip: int = 32,
                rx_cap: int = 256):
    """Static per-strip x-tap radii: the backtrace displacement is bounded
    by vmax*dt worth of arclength, stretched 1/cos(phi) into columns
    (ops.ocean.advect geometry).  Mid-latitude strips need Rx=2; only the
    polar strips pay wide taps.  Returns a list of per-strip radii,
    south to north."""
    import math

    import numpy as np

    H, W = grid.shape
    arc = 2 * 3.14159 / grid.circumference * vmax * timestep  # radians
    r = np.arange(H, dtype=np.float64)
    phi = (r + 0.5) / H * (grid.phi1 - grid.phi0) + grid.phi0
    need = arc / (2 * math.pi / W) / np.maximum(np.cos(phi), 1e-9)
    radii = []
    for s0 in range(0, H, strip):
        n = int(math.ceil(need[s0:s0 + strip].max()))
        # snap to a small set of radii (fewer distinct kernels)
        for r in (2, 4, 8, 16):
            if n <= r:
                radii.append(r)
                break
        else:
            radii.append(rx_cap)
    return radii


@functools.partial(jax.jit, static_argnames=("grid", "vmax", "timestep",
                                             "Ry", "interpret"))
def advect_sample_tiered(u, v, dx, dy, grid, vmax: float = 1.0,
                         timestep: float = 24.0, Ry: int = 2,
                         interpret: bool = False):
    """Velocity-aware tiered tap sampler: 32-row strips grouped by their
    static x-radius (strip_radii), ONE pallas_call over all strips — the
    per-strip radius arrives as SMEM metadata and bounds a dynamic tap
    loop, so mid-latitude strips run few taps and polar strips many.
    dx must already be clamped per row to the strip radius
    (ops.ocean does this with the same strip table); dy to Ry.

    Exact bilinear wherever |dx| <= strip radius — at vmax=1.0 that is
    every row except the 1-2 outermost polar rows, where the 256-column
    cap clamps gracefully (the reference's GL fetch has no such cap, but
    those rows are 500x oversampled in x)."""
    H, W = u.shape
    strip = 32
    assert H % strip == 0, H
    radii = strip_radii(grid, vmax, timestep, strip)
    nstrips = len(radii)

    # per-strip (rx, q) for the dynamic-bound kernel: one pallas_call for
    # every tier (each per-tier call used to pay a fixed launch cost)
    import numpy as np

    Rf, stride = 6, 8
    meta_np = np.zeros((nstrips, 2), np.int32)
    for i, r in enumerate(radii):
        if r > 16:
            meta_np[i] = (r, min((r + stride - 1) // stride, W // 16))
        else:
            meta_np[i] = (r, 0)
    meta = jnp.asarray(meta_np)

    up = _pad_clamp_rows(u, Ry)
    vp = _pad_clamp_rows(v, Ry)
    uw_all = jnp.stack([up[i * strip:i * strip + strip + 2 * Ry]
                        for i in range(nstrips)])
    vw_all = jnp.stack([vp[i * strip:i * strip + strip + 2 * Ry]
                        for i in range(nstrips)])
    dxw_all = dx.reshape(nstrips, strip, W)
    dyw_all = dy.reshape(nstrips, strip, W)

    pad_spec = pl.BlockSpec((1, strip + 2 * Ry, W), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((1, strip, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    ou, ov = pl.pallas_call(
        functools.partial(_kernel_dyn, Rf, stride, Ry, strip),
        grid=(nstrips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pad_spec, pad_spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((nstrips, strip, W), jnp.float32),
                   jax.ShapeDtypeStruct((nstrips, strip, W), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(meta, uw_all, vw_all, dxw_all, dyw_all)
    return ou.reshape(H, W), ov.reshape(H, W)


@functools.partial(jax.jit, static_argnames=("Rx", "Ry", "interpret"))
def advect_sample_pallas(u, v, dx, dy, Rx: int = 8, Ry: int = 2,
                         interpret: bool = False):
    """Drop-in for the tap loop of ops.ocean._advect_sample_fast.

    dx, dy: per-pixel displacement in pixels, already clamped to the radii.
    """
    H, W = u.shape
    band = _pick_band(H)
    assert band > 0, H
    nbands = H // band

    uw = _windows(_pad_clamp_rows(u, Ry), band, Ry, nbands)
    vw = _windows(_pad_clamp_rows(v, Ry), band, Ry, nbands)
    dxw = dx.reshape(nbands, band, W)
    dyw = dy.reshape(nbands, band, W)

    pad_spec = pl.BlockSpec((1, band + 2 * Ry, W), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((1, band, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    ou, ov = pl.pallas_call(
        functools.partial(_kernel, Rx, Ry, band),
        grid=(nbands,),
        in_specs=[pad_spec, pad_spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((nbands, band, W), jnp.float32),
                   jax.ShapeDtypeStruct((nbands, band, W), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(uw, vw, dxw, dyw)
    return ou.reshape(H, W), ov.reshape(H, W)
