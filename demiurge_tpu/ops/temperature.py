"""Seasonal surface-temperature (climate / energy-balance) model.

Reproduces the reference Temperature filter (src/filter/Temperature.cpp):

- initialization: T = 50 C everywhere (Temperature.cpp:27-45).
- per substep (Temperature.cpp:52-134):
    ASR  = (1 - albedo) * QDay(phi, M)          with albedo fixed at 0.30
    OLR  = 210 * (T + 273.15)^4 / 273.4^4 * 0.93
    diff = 0.55e6 * (laplacian.x + laplacian.y)  (spherical 9-point, on T)
    C    = 1e7 + (land ? 0.5e7 : 6e7)            (land C=1.5e7, ocean C=7e7)
    T   += (ASR - OLR + diff) * 3.154e7/15000 / C
  M advances 2*pi/15000 per substep (Temperature.cpp:146); the reference
  dispatches 10 substeps per GPU round (Temperature.cpp:140-150) inside a
  500k-iteration loop (i.e. ~33 simulated years; one year = 15000 substeps).

QDay is the daily-mean insolation from orbital mechanics
(Temperature.cpp:56-96): S0=1365, eccentricity 0.017, obliquity 23.44 deg,
omega=0, omega2=77.05 deg.  NOTE (faithful quirk): the reference's
equation-of-center series reads ``M + (2e - e^3/4*sin M + 5/4 e^2 sin 2M +
13/12 e^3 sin 3M)`` — by C operator precedence the ``2e`` term is a
*constant* (the intended ``(2e - e^3/4) sin M`` parenthesization is absent).
We reproduce the code as written.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core.stencils import texture_laplacian

PI = math.pi

S0 = 1365.0
ECC = 0.017
GAMMA = 23.44 / 180.0 * PI
OMEGA = 0.0
OMEGA2 = 77.05 / 180.0 * PI
YEAR_SECONDS = 3.154e7
SUBSTEPS_PER_YEAR = 15000


def _S(A):
    return S0 * (1 + 2 * ECC * jnp.cos(A - OMEGA))


def _A(M):
    # Temperature.cpp:73-75 — parenthesization reproduced as written.
    return M + (
        2 * ECC
        - ECC**3 / 4 * jnp.sin(M)
        + 5.0 / 4 * ECC**2 * jnp.sin(2 * M)
        + 13.0 / 12 * ECC**3 * jnp.sin(3 * M)
    )


def _Ls(A):
    return A - OMEGA2


def _delta(Ls):
    return jnp.arcsin(jnp.sin(GAMMA) * jnp.sin(Ls))


def _h0(phi, delta):
    """Sunset hour angle (Temperature.cpp:85-89)."""
    polar = jnp.where(jnp.sign(phi) == jnp.sign(delta), PI, 0.0)
    interior = jnp.abs(phi) <= PI / 2 - jnp.abs(delta)
    arg = jnp.clip(-jnp.tan(phi) * jnp.tan(delta), -1.0, 1.0)
    return jnp.where(interior, jnp.arccos(arg), polar)


def qday(phi, M):
    """Daily-mean insolation (Temperature.cpp:91-95)."""
    A = _A(M)
    delt = _delta(_Ls(A))
    h = _h0(phi, delt)
    return _S(A) / PI * (
        h * jnp.sin(phi) * jnp.sin(delt) + jnp.cos(phi) * jnp.cos(delt) * jnp.sin(h)
    )


def init_temperature(grid: Grid):
    """T = 50 C (Temperature.cpp:27-45)."""
    return jnp.full(grid.shape, 50.0, jnp.float32)


def _substep(T, terrain, M, grid: Grid, albedo: float, diffusivity: float):
    phi = jnp.broadcast_to(grid.row_phi(), grid.shape)
    ASR = (1 - albedo) * qday(phi, M)
    OLR = 210.0 * (T + 273.15) ** 4 / 273.4**4 * 0.93
    lx, ly = texture_laplacian(T, grid)
    change = ASR - OLR + diffusivity * (lx + ly)
    atmosphere = 1e7
    C = atmosphere + jnp.where(terrain > 0, atmosphere * 0.5, 4 * 1.5 * atmosphere)
    return T + change * YEAR_SECONDS / SUBSTEPS_PER_YEAR / C


@partial(jax.jit, static_argnames=("grid", "substeps", "mesh"))
def temperature_step(T, terrain, i0, grid: Grid, substeps: int = 10,
                     albedo: float = 0.30, diffusivity: float = 0.55e6,
                     mesh=None):
    """Advance the climate model by ``substeps`` substeps starting at substep
    index ``i0`` (mean anomaly M = 2 pi i / 15000 — Temperature.cpp:146).

    ``mesh``: optional Mesh('y','x') — runs all substeps per ONE row-halo
    exchange in the full-width row layout (dist.climate) instead of
    per-substep GSPMD collectives.  Returns (T_new, i0 + substeps).
    """
    from ..core.platform import single_core_pallas

    if mesh is not None:
        from ..dist.climate import (climate_sharded_supported,
                                    climate_step_sharded)

        if climate_sharded_supported(grid, mesh, substeps):
            return climate_step_sharded(T, terrain, i0, grid, mesh,
                                        substeps=substeps, albedo=albedo,
                                        diffusivity=diffusivity)

    if single_core_pallas():
        from ..pallas_kernels.climate import (climate_step_pallas,
                                              climate_supported)

        if climate_supported(grid) and substeps <= 128:
            return climate_step_pallas(T, terrain, i0, grid,
                                       substeps=substeps, albedo=albedo,
                                       diffusivity=diffusivity)

    def body(carry, _):
        T, i = carry
        M = 2.0 * PI / SUBSTEPS_PER_YEAR * i
        return (_substep(T, terrain, M, grid, albedo, diffusivity), i + 1.0), None

    (T, i), _ = jax.lax.scan(body, (T, jnp.asarray(i0, jnp.float32)), None,
                             length=substeps)
    return T, i


def run_years(T, terrain, grid: Grid, years: float = 1.0, i0: float = 0.0,
              substeps_per_dispatch: int = 250, progress=None):
    """Convenience driver: simulate ``years`` annual cycles (the reference's
    outer loop, Temperature.cpp:48, runs ~33 years and never terminates; we
    terminate — SURVEY §7 'non-goals').  ``progress``: optional
    :class:`demiurge_tpu.utils.progress.Progress` (reported per dispatch;
    cancellation stops at the next dispatch boundary)."""
    n = int(years * SUBSTEPS_PER_YEAR)
    i = i0
    done = 0
    while done < n:
        k = min(substeps_per_dispatch, n - done)
        T, i = temperature_step(T, terrain, i, grid, substeps=k)
        done += k
        if progress is not None and not progress(done - 1, n):
            break
    return T, i
