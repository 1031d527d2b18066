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

    # fori_loop over the x taps with a dynamic roll shift: a fully unrolled
    # value chain makes Mosaic keep all ~85 rolled copies live on the VMEM
    # stack (scoped-vmem OOM) and blows up compile time.
    out_u = jnp.zeros_like(dx)
    out_v = jnp.zeros_like(dx)
    for ky in range(-Ry, Ry + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - ky))
        u_y = u_ref[0, Ry + ky:Ry + ky + band, :]
        v_y = v_ref[0, Ry + ky:Ry + ky + band, :]

        def body(i, acc, wy=wy, u_y=u_y, v_y=v_y):
            ou, ov = acc
            kx = i - Rx
            w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - kx.astype(jnp.float32)))
            sh = jnp.mod(-kx, W)
            ou = ou + w * pltpu.roll(u_y, sh, 1)
            ov = ov + w * pltpu.roll(v_y, sh, 1)
            return ou, ov

        out_u, out_v = jax.lax.fori_loop(0, 2 * Rx + 1, body, (out_u, out_v))
    ou_ref[0] = out_u
    ov_ref[0] = out_v


def _pick_band(H: int) -> int:
    for band in (64, 32, 16, 8):
        if H % band == 0:
            return band
    return 0


def advect_sample_supported(H: int) -> bool:
    return _pick_band(H) > 0


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
