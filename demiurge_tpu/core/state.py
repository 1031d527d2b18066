"""The simulation state pytree.

The reference keeps all prognostic fields as named GL textures in a registry
(Project::add_texture, src/Project.cpp:294-317) and ping-pongs them through
fragment passes.  The TPU-native equivalent is a functional pytree of
``(H, W)`` float32 ``jax.Array`` fields carried through jitted step
functions; double-buffering becomes state-in/state-out.

Only ``height`` is mandatory (the terrain heightfield, km above sea level;
sea level = 0, reference convention throughout, e.g. FlowFilter.cpp:138).
Everything else is created on demand by the op that needs it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .grid import Grid


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class State:
    """Prognostic fields on the lat-lon grid. All (H, W) float32.

    height      — terrain height (km); >0 land, <=0 ocean
    sel         — selection mask in [0,1] (reference 'sel' texture)
    u, v        — ocean velocity tangent components (east, north)
    pressure    — ocean pressure (projection scratch kept for warm starts)
    temperature — surface temperature (deg C)
    flow        — last computed flow/discharge map (FlowFilter output)
    """

    height: jax.Array
    sel: Optional[jax.Array] = None
    u: Optional[jax.Array] = None
    v: Optional[jax.Array] = None
    pressure: Optional[jax.Array] = None
    temperature: Optional[jax.Array] = None
    flow: Optional[jax.Array] = None

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)

    @property
    def shape(self):
        return self.height.shape

    def sel_or_ones(self) -> jax.Array:
        if self.sel is None:
            return jnp.ones_like(self.height)
        return self.sel


def new_state(grid: Grid, dtype=jnp.float32) -> State:
    """Fresh project state — terrain 0, selection 1 (Project::file_new,
    reference src/Project.cpp:95-104)."""
    z = jnp.zeros(grid.shape, dtype)
    return State(height=z, sel=jnp.ones(grid.shape, dtype))
