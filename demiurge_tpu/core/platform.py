"""Single predicate for "may I take a single-core Pallas fast path".

Every Pallas kernel in this package is written for ONE TensorCore: inside a
jitted function running over a multi-chip mesh, an un-shard_mapped
``pallas_call`` would force the sharded operands to replicate (or fail to
lower).  Round-3/4 reviews each found one op gating only on
``default_backend() == "tpu"`` and forgetting the device-count check, so
the predicate now lives here and every op imports it — a unit test
(tests/test_dist.py) greps the package to keep it that way.
"""

from __future__ import annotations

import jax


def single_core_pallas() -> bool:
    """True iff single-TensorCore Pallas fast paths are safe to dispatch:
    the backend is TPU and this process drives exactly one device."""
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def tpu_backend() -> bool:
    """True iff the TPU backend is active — for code that is ALREADY
    per-device (inside a shard_map body), where a Pallas call is safe
    regardless of device count.  Anywhere else use single_core_pallas()."""
    return jax.default_backend() == "tpu"
