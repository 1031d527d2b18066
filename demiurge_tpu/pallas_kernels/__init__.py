"""Pallas TPU kernels for the hot solver paths (VMEM-fused multi-sweep
iterations).  XLA-only fallbacks live in demiurge_tpu.ops; these kernels are
opt-in drop-ins validated against them."""

from . import jacobi

__all__ = ["jacobi"]
