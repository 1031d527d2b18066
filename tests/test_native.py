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


# ---------------------------------------------------------------------------
# snapshot codec (native/snapc — the zfp analog, Texture.cpp:123-181)
# ---------------------------------------------------------------------------


def _edit_diff(seed=0):
    rng = np.random.default_rng(seed)
    a = np.zeros((128, 256), np.float32)
    a[30:60, 40:120] = rng.normal(0, 0.5, (30, 80)).astype(np.float32)
    return a


def test_snapc_roundtrip_accuracy():
    from demiurge_tpu.native import snapc

    a = _edit_diff()
    for acc in (1e-6, 1e-3):
        back = snapc.decompress(snapc.compress(a, acc), a.shape)
        assert np.abs(back - a).max() <= acc * 0.5 + 1e-7


def test_snapc_lossless_mode():
    from demiurge_tpu.native import snapc

    a = _edit_diff(1)
    back = snapc.decompress(snapc.compress(a, 0.0), a.shape)
    np.testing.assert_array_equal(back, a)


def test_snapc_beats_plain_zlib_on_sparse_diffs():
    import zlib

    from demiurge_tpu.native import snapc

    a = _edit_diff(2)
    assert len(snapc.compress(a, 1e-6)) < len(zlib.compress(a.tobytes(), 3))


def test_snapc_fallback_format_readable():
    """The numpy fallback writer must round-trip without the native lib."""
    from demiurge_tpu.native import snapc

    a = _edit_diff(3)
    orig = snapc._lib
    try:
        snapc._lib = lambda: None
        blob = snapc.compress(a, 1e-6)
        back = snapc.decompress(blob, a.shape)
    finally:
        snapc._lib = orig
    assert np.abs(back - a).max() <= 5e-7 + 1e-7


def test_snapshot_history_is_compressed():
    from demiurge_tpu.api.project import SnapshotHistory

    a = _edit_diff(4)
    s = SnapshotHistory("terrain", a)
    assert s.nbytes < a.nbytes / 4
    np.testing.assert_allclose(np.asarray(s.diff()), a, atol=1e-6)
