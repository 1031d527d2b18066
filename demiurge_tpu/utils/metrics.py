"""Structured step metrics + logging + profiling.

The reference's only observability is printf timing (SURVEY §5); this
module provides what a production framework needs: per-step physical
diagnostics (mass, energy, divergence), throughput counters
(grid-points/s — the BASELINE metric), JSONL logging, and a jax.profiler
trace flag.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.grid import Grid


def mass(height, grid: Grid):
    """Area-weighted land volume (conservation diagnostic)."""
    area = grid.cell_area_rows()
    return jnp.sum(jnp.maximum(height, 0.0) * area)


def divergence_norm(u, v, terrain, grid: Grid, cfg=None):
    from ..ops import ocean as _ocean

    cfg = cfg or _ocean.OceanConfig()
    d = _ocean.divergence(u, v, terrain, grid, cfg)
    return jnp.sqrt(jnp.mean(jnp.where(terrain <= 0, d * d, 0.0)))


def mean_temperature(T, grid: Grid):
    area = grid.cell_area_rows()
    return jnp.sum(T * area) / jnp.sum(area * jnp.ones_like(T))


class StepLogger:
    """JSONL step logger with throughput accounting."""

    def __init__(self, grid: Grid, path: Optional[str] = None,
                 stream=None):
        self.grid = grid
        self.file = open(path, "a") if path else None
        self.stream = stream if stream is not None else sys.stderr
        self._t_last = time.perf_counter()

    def log(self, step: int, **scalars):
        now = time.perf_counter()
        dt = now - self._t_last
        self._t_last = now
        rec = {
            "step": step,
            "wall_s": round(dt, 4),
            "grid_points_per_s": round(
                self.grid.width * self.grid.height / max(dt, 1e-9), 1),
        }
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        line = json.dumps(rec)
        if self.file:
            self.file.write(line + "\n")
            self.file.flush()
        if self.stream:
            print(line, file=self.stream)
        return rec

    def close(self):
        if self.file:
            self.file.close()


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler trace when a directory is given (the --xprof flag)."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
