"""Native (C++) runtime components, bound via ctypes.

Build on demand with ``python -m demiurge_tpu.native.build`` (or lazily at
first use).  Currently:

- lake_solver: the flow-routing host stages (basin flood fill, saddle
  search, lowest-pass merge, lake fill) — the counterpart of the
  reference's CPU threadpool code in FlowFilter.cpp.
"""

from .build import load_library  # noqa: F401
from .lakes import solve_lakes_native, native_available  # noqa: F401

__all__ = ["load_library", "solve_lakes_native", "native_available"]
