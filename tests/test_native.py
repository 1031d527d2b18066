"""Native C++ lake solver vs the NumPy reference implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from demiurge_tpu.core.grid import Grid
from demiurge_tpu.ops import flow
from demiurge_tpu.ops.blur import blur
from demiurge_tpu.ops.noise import NoiseParams, fbm

native = pytest.importorskip("demiurge_tpu.native")

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native toolchain unavailable")


def _inputs(g, seed):
    h = fbm(g, NoiseParams(octaves=4, scale=2.0, min=-2.0, max=3.0,
                           seed=seed))
    sel = jnp.ones(g.shape)
    hb = blur(h, g, 0.5)
    code = flow.flow_directions(hb, sel, g)
    mask, mouth, _ = flow.incoming_mask(code, g)
    parent = flow.parent_pointers(code, g)
    return (np.asarray(mask).reshape(-1), np.asarray(mouth).reshape(-1),
            np.asarray(h).reshape(-1), np.asarray(parent), h, sel)


@pytest.mark.parametrize("seed", [3, 7, 11])
def test_native_matches_numpy(seed):
    g = Grid(48, 24)
    mask, mouth, height, parent, h, sel = _inputs(g, seed)
    a = flow.solve_lakes_numpy(mask, mouth, height, parent, g)
    b = native.solve_lakes_native(mask, mouth, height, parent, g)
    np.testing.assert_array_equal(a.conn_from, b.conn_from)
    np.testing.assert_array_equal(a.conn_to, b.conn_to)
    np.testing.assert_allclose(a.conn_h, b.conn_h)
    np.testing.assert_allclose(np.nan_to_num(a.lake_wh, nan=-1),
                               np.nan_to_num(b.lake_wh, nan=-1))


def test_flow_filter_uses_native_equivalently():
    g = Grid(48, 24)
    *_, h, sel = _inputs(g, 5)
    cfg = flow.FlowConfig(exponent=1.0, lakes=True)
    fa = flow.flow_filter(h, sel, g, cfg, lake_solver=flow.solve_lakes_numpy)
    fb = flow.flow_filter(h, sel, g, cfg,
                          lake_solver=native.solve_lakes_native)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), rtol=1e-6)
