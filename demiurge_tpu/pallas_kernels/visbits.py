"""Bit-packed mouth-reachability (vis) solver (Pallas TPU).

The vis half of the flow fixpoint is purely boolean:

    vis' = mouth | OR_d out_d & shift_d(vis)

(ops.flow.flow_solve_stencil's visited relaxation; reference recursion
src/filter/FlowFilter.cpp:597-717 marks visited cells while accumulating).
On the f32 banded kernel this costs the same rolls/fma as the area half.
Packing 32 ROWS per uint32 lane turns the whole (H, W) field into a
(H/32, W) word grid — 256 KB at 2048x1024, entirely VMEM-resident — and
every sweep into ~8 bitwise ops per word = 1/30th the vector work of the
f32 half:

  - y-neighbor reads are bit shifts with a carry word from the adjacent
    group row (group rolls on the sublane dim),
  - x-neighbor reads are lane rolls (dateline-periodic),
  - the 8 outgoing one-hot masks and the mouth seed are packed the same
    way; the row-clip range rules live in the masks, so shift garbage at
    the grid edges never contributes (same argument as the f32 kernel).

The whole solve runs in ONE kernel launch: an on-core while loop sweeps
to the fixpoint with an exact no-change early exit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.grid import Grid
from ..core.topology import DIR_CODE

#: must match ops.flow._SCAN_ORDER
_SCAN_ORDER = ((1, 1), (0, 1), (-1, 1), (1, 0), (-1, 0), (1, -1), (0, -1), (-1, -1))


def _pack_y(m):
    """bool (H, W) -> uint32 (H//32, W); bit b of word (g, c) = m[g*32+b, c]."""
    H, W = m.shape
    b = m.reshape(H // 32, 32, W).astype(jnp.uint32)
    w = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)).reshape(1, 32, 1)
    return jnp.sum(b * w, axis=1, dtype=jnp.uint32)


def _unpack_y(p, H):
    """uint32 (H//32, W) -> bool (H, W)."""
    G, W = p.shape
    bits = (p.reshape(G, 1, W)
            >> jnp.arange(32, dtype=jnp.uint32).reshape(1, 32, 1)) & jnp.uint32(1)
    return bits.reshape(H, W) != 0


def _kernel(G, W, max_sweeps, mouth_ref, o0, o1, o2, o3, o4, o5, o6, o7,
            vout_ref, it_ref):
    m = mouth_ref[...]
    o = [o0[...], o1[...], o2[...], o3[...], o4[...], o5[...], o6[...],
         o7[...]]
    one = jnp.uint32(1)

    def shift_bits(v, dx, dy):
        # reads the (dx, dy) neighbor: out[r] = v[r+dy], out[c] = v[c+dx]
        if dy == 1:
            nxt = pltpu.roll(v, G - 1, 0)        # group g reads g+1
            v2 = (v >> one) | (nxt << jnp.uint32(31))
        elif dy == -1:
            prv = pltpu.roll(v, 1, 0)            # group g reads g-1
            v2 = (v << one) | (prv >> jnp.uint32(31))
        else:
            v2 = v
        if dx:
            v2 = pltpu.roll(v2, (-dx) % W, 1)
        return v2

    def body(carry):
        v, s, _ = carry
        nv = m
        for i, (dx, dy) in enumerate(_SCAN_ORDER):
            nv = nv | (o[i] & shift_bits(v, dx, dy))
        return nv, s + 1, jnp.all(nv == v)

    def cond(carry):
        _, s, done = carry
        return jnp.logical_not(done) & (s < max_sweeps)

    v, s, _ = jax.lax.while_loop(
        cond, body, (m, jnp.int32(0), jnp.asarray(False)))
    vout_ref[...] = v
    it_ref[0] = s


def vis_bits_supported(grid: Grid) -> bool:
    return bool(grid.wrap_x and grid.height % 32 == 0)


@functools.partial(jax.jit, static_argnames=("grid", "max_sweeps",
                                             "interpret", "with_stats"))
def vis_solve_bits(code, mouth, grid: Grid, max_sweeps: int = 1 << 20,
                   interpret: bool = False, with_stats: bool = False):
    """Drop-in for the vis half of flow_solve_pallas.  Returns vis bool
    (H, W); with_stats additionally returns the sweep count (int32[1])."""
    H, W = grid.shape
    assert vis_bits_supported(grid), grid.shape
    G = H // 32

    rows = jnp.arange(H).reshape(-1, 1)
    outs = []
    for (dx, dy) in _SCAN_ORDER:
        m = code == DIR_CODE[(dx, dy)]
        if dy > 0:
            m = m & (rows < H - dy)
        elif dy < 0:
            m = m & (rows >= -dy)
        outs.append(_pack_y(m))
    mouth32 = _pack_y(mouth)

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    v, it = pl.pallas_call(
        functools.partial(_kernel, G, W, max_sweeps),
        in_specs=[spec] * 9,
        out_specs=(spec, pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((G, W), jnp.uint32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        interpret=interpret,
    )(mouth32, *outs)
    vis = _unpack_y(v, H)
    if with_stats:
        return vis, it
    return vis
