"""Amortized distributed semi-Lagrangian sampling: ONE halo exchange for
the whole tap loop.

Under GSPMD the gather-free tap formulation of ops.ocean's advection
(hat-weighted sum over (2Rx+1)*(2Ry+1) integer taps) emits a collective
per x tap — 17+ per velocity component at the default radius.  Here the
(2k)-wide halo is exchanged once (k = max(Rx, Ry)) and the taps become
local slices of the padded block.

Semantics match the XLA fallback `_advect_sample_fast` exactly: x taps
periodic over the dateline (the E/W halos ride the ring ppermute), y taps
clamp at the grid edge (GL_CLAMP_TO_EDGE — edge='clamp' halos), dx/dy
clipped to the static radii; sums run in the same tap order (residual
1-ulp differences come from XLA fusing the two programs differently).  (Reference: src/filter/OceanCurrents.cpp:
235-360 samples with a hardware bilinear fetch; the cap is this
framework's documented CFL-style deviation.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.grid import Grid
from .halo import exchange_halo

_SPEC = P("y", "x")


def _exchange_clamped(block, k: int, grid: Grid, mesh: Mesh):
    """(h+2k, w+2k) halo pad: x ring-periodic, y CLAMPED at the global
    edges (advection samples with GL_CLAMP_TO_EDGE, not pole wrap)."""
    ny = mesh.shape["y"]
    yi = jax.lax.axis_index("y")
    # reuse the ring/band machinery with pole caps disabled, then repair
    # the global-edge rows to clamp semantics
    import dataclasses

    g_flat = dataclasses.replace(grid, coords=(grid.coords[0] + 1e-3,
                                               grid.coords[1] - 1e-3,
                                               grid.coords[2],
                                               grid.coords[3]))
    padded = exchange_halo(block, k, g_flat, mesh)
    h2 = padded.shape[0]
    rows = jnp.arange(h2).reshape(-1, 1)
    south_edge = (yi == 0) & (rows < k)
    north_edge = (yi == ny - 1) & (rows >= h2 - k)
    padded = jnp.where(south_edge, padded[k:k + 1, :], padded)
    padded = jnp.where(north_edge, padded[h2 - k - 1:h2 - k, :], padded)
    return padded


@partial(jax.jit, static_argnames=("grid", "mesh", "Rx", "Ry"))
def advect_sample_sharded(u, v, s2, t2, grid: Grid, mesh: Mesh,
                          Rx: int = 8, Ry: int = 2):
    """Bilinear fetch of (u, v) at backtraced tex coords (s2, t2) without
    gathers, distributed: one halo exchange then local taps."""
    H, W = grid.shape
    k = max(Rx, Ry)

    def body(u_b, v_b, s2_b, t2_b):
        h, w = u_b.shape
        yi = jax.lax.axis_index("y")
        xi = jax.lax.axis_index("x")
        c0 = xi * w
        r0 = yi * h
        c = c0 + jnp.arange(w, dtype=jnp.float32).reshape(1, -1)
        r = r0 + jnp.arange(h, dtype=jnp.float32).reshape(-1, 1)
        dx = jnp.clip(s2_b * W - 0.5 - c, -Rx, Rx)
        dy = jnp.clip(t2_b * H - 0.5 - r, -Ry, Ry)

        up = _exchange_clamped(u_b, k, grid, mesh)
        vp = _exchange_clamped(v_b, k, grid, mesh)
        uv = jnp.stack([up, vp])  # share tap weights between components

        out = jnp.zeros((2, h, w), jnp.float32)
        for ky in range(-Ry, Ry + 1):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - ky))
            for kx in range(-Rx, Rx + 1):
                wgt = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - kx))
                tapv = jax.lax.slice(
                    uv, (0, k + ky, k + kx), (2, k + ky + h, k + kx + w))
                out = out + wgt * tapv
        return out[0], out[1]

    fn = shard_map(body, mesh=mesh, in_specs=(_SPEC,) * 4,
                   out_specs=(_SPEC, _SPEC))
    return fn(u, v, s2, t2)
