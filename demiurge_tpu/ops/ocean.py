"""Shallow-water-style ocean currents on the sphere.

Reproduces the reference OceanCurrents filter (src/filter/OceanCurrents.cpp)
as a pure, terminating, jittable solver.  One outer step
(OceanCurrents.cpp:151-211) is:

  1. advect    — semi-Lagrangian backtrace along great circles with parallel
                 transport of the sampled velocity (OceanCurrents.cpp:235-360)
                 + zonal wind-stress forcing and exponential drag (341-349)
  2. diffusion — 50 Jacobi sweeps of implicit viscosity with land-obstacle
                 Neumann handling (625-708)
  3. divergence— area-weighted velocity divergence with obstacles and
                 antipodal sign flip across the poles (363-435)
  4. pressure  — Poisson solve by Jacobi iteration from zero initial guess
                 (437-509; reference runs 5000 iterations)
  5. project   — subtract the pressure gradient; coastal free-slip redirect
                 of boundary-adjacent velocity toward the nearest open
                 direction of 8 (511-622)

Reference WIP quirks, reproduced only under ``exact_quirks=True``:

  - Coriolis force multiplied by 0.0 (OceanCurrents.cpp:327); the intent mode
    applies the reference's own formula un-zeroed (BASELINE requires
    Coriolis).
  - the diffusion rhs uses the *x component* of the center velocity as a
    scalar added to both components (``float bC = texture(v,st).r``,
    OceanCurrents.cpp:687-693); intent mode uses the per-component center
    velocity.
  - the wind profile's hemisphere-fix threshold typo ``3.1459*2/3``
    (OceanCurrents.cpp:344) is kept in both modes (it is a parameter choice,
    not a numerical error).

The reference never terminates (``while(true)``, OceanCurrents.cpp:212) and
downsamples mid-run (207); this implementation simply steps a configured
number of times at full resolution.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core.topology import (
    grid_st,
    offset_coords,
    sample_bilinear,
    shift,
)

PI = math.pi
REF_PI = 3.14159  # the reference's truncated pi literal, used where it does


@dataclasses.dataclass(frozen=True)
class OceanConfig:
    pressurefactor: float = 100.0       # OceanCurrents.h:22 menu default
    timestep: float = 24.0              # hours (OceanCurrents.cpp:294)
    dissipation: float = 1.0            # (OceanCurrents.cpp:296)
    diffusion_iters: int = 50           # (OceanCurrents.cpp:701)
    jacobi_iters: int = 5000            # (OceanCurrents.cpp:50)
    coriolis: float = 1.0               # reference formula scale; 0.0 = quirk
    exact_quirks: bool = False
    # semi-Lagrangian sampling: 'fast' is gather-free — bilinear written as
    # a sum over (2*tap_radius_x+1)*(2*tap_radius_y+1) integer taps with
    # per-pixel hat weights (exact bilinear for displacements within the tap
    # radii, clamped beyond — a CFL-style cap; the x radius is larger since
    # the longitude displacement stretches as 1/cos(phi) toward the poles).
    # Seam behavior: periodic in x where the GL-parity 'exact' path clamps
    # the dateline subpixel (documented deviation; 'exact' = pure-gather
    # parity).  On TPU the tap loop runs as a fused Pallas kernel
    # (pallas_kernels.advect); elsewhere as XLA rolls.
    advect_method: str = "fast"
    tap_radius_x: int = 8
    tap_radius_y: int = 2
    # static velocity bound used to size the per-latitude-strip tap radii
    # of the TPU tiered sampler (pallas_kernels.advect.strip_radii): the
    # x backtrace stretches as 1/cos(phi), so mid-latitude strips tap
    # narrow (Rx=2) while polar strips tap wide (up to 256 columns) —
    # both faster than one global radius AND exact at wind-driven speeds.
    # None (default) = derive from the wind forcing's drag equilibrium
    # (vmax_from_wind); a StepLogger diagnostic (advect_clamped_fraction)
    # counts pixels the cap would distort
    vmax_hint: Optional[float] = None
    # pressure Poisson solver backend: 'xla' = one 5-point sweep per HBM
    # round trip (reference-exact order), 'pallas' = fused K-sweep VMEM
    # bands (pallas_kernels.jacobi, same fixpoint, f32 reassociation-level
    # differences), 'auto' = pallas on TPU when the grid is band-divisible,
    # 'cg' = performance mode: spectrally-preconditioned conjugate
    # gradient (ops.pressure_cg) — converges across config-5 basins where
    # no affordable Jacobi sweep count can (SURVEY §7 hard parts #5).
    pressure_method: str = "auto"
    cg_iters: int = 200
    cg_rtol: float = 1e-4


# ---------------------------------------------------------------------------
# tangent-frame helpers in stacked-component form
# ---------------------------------------------------------------------------


def _v_to_cartesian(vx, vy, lam, phi):
    """OceanCurrents.cpp:251-258 (east/north tangent basis)."""
    ex, ey = -jnp.sin(lam), jnp.cos(lam)
    nx = -jnp.sin(phi) * jnp.cos(lam)
    ny = -jnp.sin(phi) * jnp.sin(lam)
    nz = jnp.cos(phi)
    return (vx * ex + vy * nx, vx * ey + vy * ny, vy * nz)


def _cartesian_to_v(cx, cy, cz, lam, phi):
    """OceanCurrents.cpp:260-268."""
    ex, ey = -jnp.sin(lam), jnp.cos(lam)
    nx = -jnp.sin(phi) * jnp.cos(lam)
    ny = -jnp.sin(phi) * jnp.sin(lam)
    nz = jnp.cos(phi)
    return (cx * ex + cy * ey, cx * nx + cy * ny + cz * nz)


def _rotate(theta, ux, uy, uz, px, py, pz):
    """Axis-angle rotate (px,py,pz) by theta about unit axis u (Shader.h:33-41)."""
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    omc = 1.0 - c
    rx = (c + ux * ux * omc) * px + (ux * uy * omc - uz * s) * py + (ux * uz * omc + uy * s) * pz
    ry = (uy * ux * omc + uz * s) * px + (c + uy * uy * omc) * py + (uy * uz * omc - ux * s) * pz
    rz = (uz * ux * omc - uy * s) * px + (uz * uy * omc + ux * s) * py + (c + uz * uz * omc) * pz
    return rx, ry, rz


# ---------------------------------------------------------------------------
# the five passes
# ---------------------------------------------------------------------------


def wind_profile(grid: Grid):
    """Zonal wind forcing profile (OceanCurrents.cpp:341-345). Shape (H,1) x2."""
    t = grid.row_t()
    phi = 2 * (t - 0.5) * REF_PI
    wx = -10 * jnp.cos(phi * 1.5)
    wy = 10 * jnp.sin(phi * 1.5)
    wx = jnp.where(jnp.abs(phi * 1.5) > REF_PI, -wx, wx)
    wy = jnp.where(
        (jnp.abs(phi) > REF_PI / 3) & (jnp.abs(phi) < 3.1459 * 2 / 3), -wy, wy
    )
    wy = jnp.where(phi < 0, -wy, wy)
    return wx, wy


def vmax_from_wind(timestep: float = 24.0, dissipation: float = 1.0,
                   safety: float = 1.4) -> float:
    """Static bound on |v| from the wind forcing's drag equilibrium.

    Iterates the per-step scalar update v <- D*v + w*(1 - s^(-2/24)) -
    v*drag at the profile's peak |w| = 10*sqrt(2)
    (OceanCurrents.cpp:341-348) to its fixpoint and applies a safety
    factor for transient/advective overshoot.  The scalar model is itself
    conservative (it assumes the peak wind fully aligned): the measured
    equilibrium max |v| at an evolved 512x256 state is 0.184 while this
    returns 0.80 (4.3x margin), and the clamped-pixel diagnostic reads
    zero there (tests/test_advect_fast.py).  safety = 1.4 keeps the
    implied y displacement under ONE pixel at 2048x1024, which makes the
    tiered sampler's Ry = 1 (3 tap rows instead of 5) exact.  Replaces
    the untested constant hint flagged by the round-4 review."""
    w = 10.0 * math.sqrt(2.0)
    drag = 1.0 - 0.4 ** (1.0 / 24.0)
    v = 0.0
    for _ in range(500):
        s = 1.0 + 1e-4 * (w - v) ** 2
        v = dissipation * v
        v = v + w * (1.0 - s ** (-2.0 / 24.0)) - v * drag
    return max(safety * v, 0.25)


def resolved_vmax(cfg: OceanConfig) -> float:
    if cfg.vmax_hint is not None:
        return cfg.vmax_hint
    return vmax_from_wind(cfg.timestep, cfg.dissipation)


def tap_radius_y(grid: Grid, cfg: OceanConfig) -> int:
    """y tap radius implied by the velocity bound: the backtrace moves at
    most arc/(pixel height) rows, so hat taps beyond ceil(that) carry
    zero weight — Ry = 1 is EXACT at the derived bound (|dy| < 1)."""
    arc = 2 * REF_PI / grid.circumference * resolved_vmax(cfg) * cfg.timestep
    dy_pix = arc * grid.height / (grid.phi1 - grid.phi0)
    return max(1, min(int(math.ceil(dy_pix)), cfg.tap_radius_y))


def _advect_sample_fast(u, v, s2, t2, grid: Grid, Rx: int, Ry: int,
                        cfg: Optional[OceanConfig] = None):
    """Bilinear fetch of (u, v) at backtraced coords without a gather.

    Writes the bilinear interpolation as a sum over (2Rx+1)*(2Ry+1) integer
    taps with per-pixel hat weights: w = hat(dx-kx)*hat(dy-ky); only the 4
    taps bracketing the displacement are nonzero, so the result is EXACTLY
    bilinear for displacements within (Rx, Ry) pixels (clamped beyond — a
    CFL-style cap; Rx > Ry because the longitude displacement stretches as
    1/cos(phi) toward the poles while the latitude displacement has no
    metric blowup).

    x taps are periodic rolls (dateline-seamless); y taps beyond the grid
    edge clamp to the edge row, matching the GL_CLAMP_TO_EDGE fetch of the
    exact path (the backtraced point itself is always in range since
    phi2 in [-pi/2, pi/2]).  Everything is fused slice/select work at HBM
    speed — ~10x faster than the hardware gather at 2048x1024.
    """
    from ..core.topology import _clamped_shift

    H, W = u.shape
    c = jnp.arange(W, dtype=jnp.float32).reshape(1, -1)
    r = jnp.arange(H, dtype=jnp.float32).reshape(-1, 1)

    from ..core.platform import single_core_pallas

    if single_core_pallas() and H % 32 == 0:
        from ..pallas_kernels.advect import (advect_sample_tiered,
                                             strip_radii)

        vmax = resolved_vmax(cfg) if cfg is not None else 1.0
        ts = cfg.timestep if cfg is not None else 24.0
        ry = tap_radius_y(grid, cfg) if cfg is not None else Ry
        radii = strip_radii(grid, vmax, ts)
        import numpy as np

        rxrow = jnp.asarray(np.repeat(np.asarray(radii, np.float32), 32)
                            ).reshape(-1, 1)
        dx = jnp.clip(s2 * W - 0.5 - c, -rxrow, rxrow)
        dy = jnp.clip(t2 * H - 0.5 - r, -ry, ry)
        return advect_sample_tiered(u, v, dx, dy, grid, vmax=vmax,
                                    timestep=ts, Ry=ry)

    dx = jnp.clip(s2 * W - 0.5 - c, -Rx, Rx)
    dy = jnp.clip(t2 * H - 0.5 - r, -Ry, Ry)

    uv = jnp.stack([u, v])  # share the tap weights between components
    out = jnp.zeros_like(uv)
    for ky in range(-Ry, Ry + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - ky))
        row = _clamped_shift(uv, ky, axis=1) if ky else uv
        for kx in range(-Rx, Rx + 1):
            w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - kx))
            out = out + w * jnp.roll(row, -kx, axis=-1)
    return out[0], out[1]


def _departure(u, v, grid: Grid, cfg: OceanConfig):
    """Great-circle backtrace of every pixel (OceanCurrents.cpp:235-260):
    sample coords (s2, t2), rotated point q, rotation axis, arclength,
    and the departure tangent basis.  Shared by advect and the
    cap-clamp diagnostic."""
    lam1d, phi1d = grid.lam_phi()      # (1,W), (H,1)
    sin_lam = jnp.sin(lam1d)
    cos_lam = jnp.cos(lam1d)
    sin_phi = jnp.sin(phi1d)
    cos_phi = jnp.cos(phi1d)

    speed = jnp.sqrt(u * u + v * v)
    arclength = 2 * REF_PI / grid.circumference * speed * cfg.timestep

    px = cos_phi * cos_lam
    py = cos_phi * sin_lam
    pz = jnp.broadcast_to(sin_phi, grid.shape)
    # tangent basis at the departure pixel (OceanCurrents.cpp:251-258)
    ex, ey = -sin_lam, cos_lam                       # east (z comp 0)
    nx = -sin_phi * cos_lam
    ny = -sin_phi * sin_lam
    nz = cos_phi
    cx = u * ex + v * nx
    cy = u * ey + v * ny
    cz = v * nz

    # rotation axis = normalize(cross(pos, v_cart)); eps-normalized so that
    # zero velocity yields arclength 0 -> identity (reference NaN-guards to 0)
    ax = py * cz - pz * cy
    ay = pz * cx - px * cz
    az = px * cy - py * cx
    an = jnp.sqrt(ax * ax + ay * ay + az * az)
    safe = jnp.maximum(an, 1e-30)
    ax, ay, az = ax / safe, ay / safe, az / safe

    qx, qy, qz = _rotate(-arclength, ax, ay, az, px, py, pz)
    lam2 = jnp.arctan2(qy, qx)
    phi2 = jnp.arcsin(jnp.clip(qz, -1.0, 1.0))
    s2, t2 = grid.spheric_to_tex(lam2, phi2)
    return (s2, t2, qx, qy, qz, ax, ay, az, arclength,
            ex, ey, nx, ny, nz)


@partial(jax.jit, static_argnames=("grid", "cfg"))
def advect_clamped_fraction(u, v, terrain, grid: Grid, cfg: OceanConfig):
    """Fraction of ocean pixels whose backtraced displacement exceeds the
    tiered tap radii — i.e. pixels the fast sampler's CFL-style cap would
    distort.  Logged per step by the CLI (StepLogger 'advect_clamped');
    nonzero values mean vmax_hint/the derived bound is too small for the
    flow regime."""
    from ..pallas_kernels.advect import strip_radii

    H, W = grid.shape
    out = _departure(u, v, grid, cfg)
    s2, t2 = out[0], out[1]
    c = jnp.arange(W, dtype=jnp.float32).reshape(1, -1)
    r = jnp.arange(H, dtype=jnp.float32).reshape(-1, 1)
    dx = s2 * W - 0.5 - c
    dx = jnp.mod(dx + W / 2.0, float(W)) - W / 2.0   # shortest wrap
    dy = t2 * H - 0.5 - r
    radii = strip_radii(grid, resolved_vmax(cfg), cfg.timestep)
    import numpy as np

    strip = H // len(radii)
    rxrow = jnp.asarray(np.repeat(np.asarray(radii, np.float32), strip)
                        ).reshape(-1, 1)
    ry = tap_radius_y(grid, cfg)
    clamped = (jnp.abs(dx) > rxrow) | (jnp.abs(dy) > ry)
    water = terrain <= 0
    return jnp.sum(jnp.where(water & clamped, 1.0, 0.0)) \
        / jnp.maximum(jnp.sum(jnp.where(water, 1.0, 0.0)), 1.0)


def advect(u, v, terrain, grid: Grid, cfg: OceanConfig, mesh=None):
    """Semi-Lagrangian advection + wind forcing (OceanCurrents.cpp:235-360).

    Transcendental-light formulation: the departure-point trig (lam/phi of
    every pixel) is computed on the 1D row/column axes and broadcast; the
    landing point's tangent basis is derived algebraically from the rotated
    Cartesian point q (cos(phi2) = hypot(qx, qy), east = (-qy, qx, 0)/...),
    so only atan2/asin for the sample coords and sin/cos of the arclength
    remain per-pixel.  Algebraically identical to evaluating the basis at
    (lam2, phi2)."""
    (s2, t2, qx, qy, qz, ax, ay, az, arclength,
     ex, ey, nx, ny, nz) = _departure(u, v, grid, cfg)

    use_fast = cfg.advect_method == "fast" and grid.wrap_x
    if use_fast and mesh is not None:
        # amortized sharded tap loop: ONE halo exchange instead of one
        # collective per tap (dist.advect); same taps/weights as the XLA
        # fallback below — bitwise-equal sums
        from ..dist.advect import advect_sample_sharded

        nu, nv = advect_sample_sharded(u, v, s2, t2, grid, mesh,
                                       Rx=cfg.tap_radius_x,
                                       Ry=cfg.tap_radius_y)
    elif use_fast:
        nu, nv = _advect_sample_fast(u, v, s2, t2, grid,
                                     cfg.tap_radius_x, cfg.tap_radius_y,
                                     cfg=cfg)
    else:
        nu = sample_bilinear(u, s2, t2)
        nv = sample_bilinear(v, s2, t2)

    # parallel transport back (rotate sampled vector by +arclength); the
    # landing-point basis comes from q directly: cos(phi2) = hypot(qx, qy)
    cp2 = jnp.sqrt(qx * qx + qy * qy)
    inv_cp2 = 1.0 / jnp.maximum(cp2, 1e-30)
    cl2 = qx * inv_cp2                               # cos(lam2)
    sl2 = qy * inv_cp2                               # sin(lam2)
    e2x, e2y = -sl2, cl2
    n2x = -qz * cl2                                  # -sin(phi2) cos(lam2)
    n2y = -qz * sl2
    n2z = cp2
    tx = nu * e2x + nv * n2x
    ty = nu * e2y + nv * n2y
    tz = nv * n2z
    tx, ty, tz = _rotate(arclength, ax, ay, az, tx, ty, tz)
    nu = tx * ex + ty * ey
    nv = tx * nx + ty * ny + tz * nz

    bad = jnp.isnan(nu) | jnp.isnan(nv)
    nu = jnp.where(bad, 0.0, nu)
    nv = jnp.where(bad, 0.0, nv)

    # Coriolis (OceanCurrents.cpp:325-327); reference multiplies by 0.0
    cor = 0.0 if cfg.exact_quirks else cfg.coriolis
    if cor != 0.0:
        wz_ = 1.0 / 24.0  # planetary rotation (rev/h); omega = (0, 0, wz)
        vcx = nu * ex + nv * nx
        vcy = nu * ey + nv * ny
        vcz = nv * nz
        acx = -2 * (-wz_ * vcy)
        acy = -2 * (wz_ * vcx)
        acz = jnp.zeros_like(vcz)
        du = acx * ex + acy * ey
        dv = acx * nx + acy * ny + acz * nz
        nu = nu + du * cfg.timestep / 5000 * cor
        nv = nv + dv * cfg.timestep / 5000 * cor

    nu = cfg.dissipation * nu
    nv = cfg.dissipation * nv

    # wind stress + drag (OceanCurrents.cpp:341-348)
    wx, wy = wind_profile(grid)
    sx = 1.0 + 0.0001 * jnp.abs(wx - nu) ** 2
    sy = 1.0 + 0.0001 * jnp.abs(wy - nv) ** 2
    drag = 1.0 - 0.4 ** (1.0 / 24.0)
    nu = nu + wx * (1 - sx ** (-2.0 / 24.0)) - nu * drag
    nv = nv + wy * (1 - sy ** (-2.0 / 24.0)) - nv * drag

    # solid cells hold zero velocity (OceanCurrents.cpp:284-288; the early
    # return also skips wind forcing on land)
    land = terrain > 0
    nu = jnp.where(land, 0.0, nu)
    nv = jnp.where(land, 0.0, nv)
    return nu, nv


def _use_pallas_pressure(grid: Grid, cfg: OceanConfig) -> bool:
    if cfg.pressure_method == "xla":
        return False
    bandable = grid.height % 128 == 0 and grid.width % 128 == 0
    if cfg.pressure_method == "pallas":
        if not bandable:
            raise ValueError(
                f"pressure_method='pallas' needs 128-divisible grid, got "
                f"{grid.shape}")
        return True
    # auto: pallas only on a SINGLE TPU (the CPU pallas lowering is slower
    # than XLA, and the single-core kernel would force replication of
    # sharded arrays on a multi-chip mesh — distributed runs route through
    # dist.halo via the ``mesh`` argument instead)
    from ..core.platform import single_core_pallas

    return bandable and single_core_pallas()


def _pole_flip_mask(dy: int, grid: Grid):
    """Rows whose (0, dy) neighbor crossed a pole -> velocity sign flip
    (the |d lambda| ~ pi test, OceanCurrents.cpp:389/657)."""
    H = grid.height
    mask = jnp.zeros((H, 1), bool)
    if dy < 0 and grid.wrap_south:
        mask = mask.at[:-dy].set(True)
    if dy > 0 and grid.wrap_north:
        mask = mask.at[H - dy :].set(True)
    return mask


def _neighbor_vec(u, v, dx, dy, grid: Grid):
    """Velocity of the (dx,dy) neighbor with pole sign flip."""
    nu = shift(u, dx, dy, grid)
    nv = shift(v, dx, dy, grid)
    if dx == 0 and dy != 0:
        flip = _pole_flip_mask(dy, grid)
        nu = jnp.where(flip, -nu, nu)
        nv = jnp.where(flip, -nv, nv)
    return nu, nv


def diffusion(u, v, terrain, grid: Grid, cfg: OceanConfig, mesh=None):
    """Implicit-viscosity Jacobi sweeps (OceanCurrents.cpp:625-708).

    Under a ``mesh`` (and intent mode), routes to the amortized
    halo-exchange solver (dist.halo.diffusion_solve_sharded)."""
    if mesh is not None and not cfg.exact_quirks and grid.wrap_x:
        from ..dist.halo import diffusion_solve_sharded

        return diffusion_solve_sharded(u, v, terrain, grid, mesh,
                                       iters=cfg.diffusion_iters)
    from ..core.platform import single_core_pallas

    if not cfg.exact_quirks and single_core_pallas():
        from ..pallas_kernels.jacobi import (diffusion_resident_supported,
                                             diffusion_solve_pallas,
                                             diffusion_solve_resident,
                                             diffusion_supported)

        if diffusion_resident_supported(grid, cfg.diffusion_iters):
            return diffusion_solve_resident(u, v, terrain, grid,
                                            iters=cfg.diffusion_iters)
        if diffusion_supported(grid, cfg.diffusion_iters):
            return diffusion_solve_pallas(u, v, terrain, grid,
                                          iters=cfg.diffusion_iters)

    dxr, dyr = grid.pixelsize_rows()
    wx = (420.0 / dxr) ** 2          # 1/pow(pixelsize,2)*420^2  (H,1)
    wy = (420.0 / dyr) ** 2          # scalar
    beta = 2 * (wx + wy) * (1 + 1 / (2 * (wx + wy)))

    oN = shift(terrain, 0, 1, grid) > 0
    oS = shift(terrain, 0, -1, grid) > 0
    oE = shift(terrain, 1, 0, grid) > 0
    oW = shift(terrain, -1, 0, grid) > 0

    def sweep(carry, _):
        cu, cv = carry
        nu_, nv_ = _neighbor_vec(cu, cv, 0, 1, grid)
        su_, sv_ = _neighbor_vec(cu, cv, 0, -1, grid)
        eu_, ev_ = _neighbor_vec(cu, cv, 1, 0, grid)
        wu_, wv_ = _neighbor_vec(cu, cv, -1, 0, grid)
        nu_ = jnp.where(oN, cu, nu_); nv_ = jnp.where(oN, cv, nv_)
        su_ = jnp.where(oS, cu, su_); sv_ = jnp.where(oS, cv, sv_)
        eu_ = jnp.where(oE, cu, eu_); ev_ = jnp.where(oE, cv, ev_)
        wu_ = jnp.where(oW, cu, wu_); wv_ = jnp.where(oW, cv, wv_)
        if cfg.exact_quirks:
            bu = bv = cu  # float bC = v.x broadcast to both components
        else:
            bu, bv = cu, cv
        newu = ((wu_ + eu_) * wx + (su_ + nu_) * wy + bu) / beta
        newv = ((wv_ + ev_) * wx + (sv_ + nv_) * wy + bv) / beta
        return (newu, newv), None

    (u, v), _ = jax.lax.scan(sweep, (u, v), None, length=cfg.diffusion_iters)
    return u, v


def divergence(u, v, terrain, grid: Grid, cfg: OceanConfig):
    """Area-weighted divergence (OceanCurrents.cpp:363-435)."""
    dxr, dyr = grid.pixelsize_rows()
    area = dxr * dyr  # (H,1)

    def gv(dx, dy):
        # get_velocity: neighbor v * (its pixel area) * pressurefactor
        au = u * area * cfg.pressurefactor
        av = v * area * cfg.pressurefactor
        nu, nv = _neighbor_vec(au, av, dx, dy, grid)
        return nu, nv

    _, vNy = gv(0, 1)
    _, vSy = gv(0, -1)
    vEx, _ = gv(1, 0)
    vWx, _ = gv(-1, 0)

    vNy = jnp.where(shift(terrain, 0, 1, grid) > 0, 0.0, vNy)
    vSy = jnp.where(shift(terrain, 0, -1, grid) > 0, 0.0, vSy)
    vEx = jnp.where(shift(terrain, 1, 0, grid) > 0, 0.0, vEx)
    vWx = jnp.where(shift(terrain, -1, 0, grid) > 0, 0.0, vWx)

    pwx = dxr / 420.0
    pwy = dyr / 420.0
    return 0.5 * ((vEx - vWx) / pwx + (vNy - vSy) / pwy)


def pressure_solve(divw, terrain, grid: Grid, cfg: OceanConfig,
                   p0=None, mesh=None):
    """Jacobi Poisson solve for pressure (OceanCurrents.cpp:437-509).

    Starts from zero (the reference zeroes pressure each step); pass ``p0``
    to warm-start (intent-mode speedup, identical fixed point).  Under a
    ``mesh``, routes to the amortized halo-exchange solver
    (dist.halo.pressure_solve_sharded).
    """
    if cfg.pressure_method == "cg" and mesh is None:
        from .pressure_cg import pressure_solve_cg

        return pressure_solve_cg(divw, terrain, grid, iters=cfg.cg_iters,
                                 rtol=cfg.cg_rtol, p0=p0)
    if mesh is not None and grid.wrap_x and p0 is None:
        from ..dist.halo import pressure_solve_sharded

        return pressure_solve_sharded(divw, terrain, grid, mesh,
                                      iters=cfg.jacobi_iters)
    dxr, dyr = grid.pixelsize_rows()
    pw2x = (dxr / 420.0) ** 2
    pw2y = (dyr / 420.0) ** 2
    beta = 2 * (1 / pw2x + 1 / pw2y)

    oN = shift(terrain, 0, 1, grid) > 0
    oS = shift(terrain, 0, -1, grid) > 0
    oE = shift(terrain, 1, 0, grid) > 0
    oW = shift(terrain, -1, 0, grid) > 0
    oC = terrain > 0

    if _use_pallas_pressure(grid, cfg):
        from ..pallas_kernels.jacobi import (pressure_resident_supported,
                                             pressure_solve_pallas,
                                             pressure_solve_resident)

        if pressure_resident_supported(grid, cfg.jacobi_iters):
            return pressure_solve_resident(divw, terrain, grid,
                                           iters=cfg.jacobi_iters, p0=p0)
        return pressure_solve_pallas(divw, terrain, grid,
                                     iters=cfg.jacobi_iters, p0=p0)

    p = jnp.zeros_like(divw) if p0 is None else p0

    def sweep(p, _):
        pN = shift(p, 0, 1, grid)
        pS = shift(p, 0, -1, grid)
        pE = shift(p, 1, 0, grid)
        pW = shift(p, -1, 0, grid)
        pN = jnp.where(oN, p, pN)
        pS = jnp.where(oS, p, pS)
        pE = jnp.where(oE, p, pE)
        pW = jnp.where(oW, p, pW)
        pnew = ((pW + pE) / pw2x + (pS + pN) / pw2y - divw) / beta
        return jnp.where(oC, 0.0, pnew), None

    p, _ = jax.lax.scan(sweep, p, None, length=cfg.jacobi_iters)
    return p


def project(u, v, p, terrain, grid: Grid, cfg: OceanConfig):
    """Subtract pressure gradient + coastal free-slip redirect
    (OceanCurrents.cpp:511-622)."""
    dxr, dyr = grid.pixelsize_rows()
    pwx = dxr / 420.0
    pwy = dyr / 420.0
    area = dxr * dyr

    oN = shift(terrain, 0, 1, grid) > 0
    oS = shift(terrain, 0, -1, grid) > 0
    oE = shift(terrain, 1, 0, grid) > 0
    oW = shift(terrain, -1, 0, grid) > 0

    pN = shift(p, 0, 1, grid)
    pS = shift(p, 0, -1, grid)
    pE = shift(p, 1, 0, grid)
    pW = shift(p, -1, 0, grid)
    pN = jnp.where(oN, p, pN)
    pS = jnp.where(oS, p, pS)
    pE = jnp.where(oE, p, pE)
    pW = jnp.where(oW, p, pW)

    fu = u - 0.5 * (pE - pW) / pwx / area / cfg.pressurefactor
    fv = v - 0.5 * (pN - pS) / pwy / area / cfg.pressurefactor

    # coastal free-slip redirect (OceanCurrents.cpp:583-606)
    offsets = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]
    o_arr = [shift(terrain, dx, dy, grid) > 0 for (dx, dy) in offsets]

    theta = jnp.mod((jnp.arctan2(fv, fu) / PI + 1) / 2 * 8 + 4, 8.0)
    lower = jnp.mod(jnp.floor(theta), 8).astype(jnp.int32)
    upper = jnp.mod(jnp.ceil(theta), 8).astype(jnp.int32)
    # per-pixel pick of o_arr[lower]/o_arr[upper]: 8-way select instead of a
    # gather over the stacked (8,H,W) array — fuses into the surrounding
    # elementwise work on TPU (gathers run at ~1/6 HBM speed here)
    o_lower = jnp.zeros_like(o_arr[0])
    o_upper = jnp.zeros_like(o_arr[0])
    for i in range(8):
        o_lower = o_lower | ((lower == i) & o_arr[i])
        o_upper = o_upper | ((upper == i) & o_arr[i])
    is_border = o_lower | o_upper

    mag = jnp.sqrt(fu * fu + fv * fv)
    best_u, best_v = fu, fv
    difference = jnp.full_like(fu, 2 * PI)  # reference compares 1/8-turn units
    for i, (dx, dy) in enumerate(offsets):
        thetai = float(i)  # == mod((atan2(dy,dx)/pi+1)/2*8+4, 8) for this order
        ang = jnp.minimum((2 * PI) - jnp.abs(thetai - theta),
                          jnp.abs(thetai - theta))
        open_dir = ~o_arr[i]
        better = (ang < difference) & open_dir
        norm = math.sqrt(dx * dx + dy * dy)
        best_u = jnp.where(better, dx / norm * mag, best_u)
        best_v = jnp.where(better, dy / norm * mag, best_v)
        difference = jnp.where(better, ang, difference)

    fu = jnp.where(is_border, best_u, fu)
    fv = jnp.where(is_border, best_v, fv)

    land = terrain > 0
    fu = jnp.where(land, 0.0, fu)
    fv = jnp.where(land, 0.0, fv)
    return fu, fv


@partial(jax.jit, static_argnames=("grid", "cfg", "mesh"))
def ocean_step(u, v, terrain, grid: Grid, cfg: OceanConfig = OceanConfig(),
               mesh=None):
    """One full outer step (OceanCurrents.cpp:155-211). Returns (u, v, p, div).

    ``mesh``: optional jax.sharding.Mesh('y','x') — the iterative solvers
    then run through the amortized explicit-halo path (dist.halo) instead
    of one GSPMD collective per sweep; the single-pass ops stay GSPMD."""
    u, v = advect(u, v, terrain, grid, cfg, mesh=mesh)
    u, v = diffusion(u, v, terrain, grid, cfg, mesh=mesh)
    div = divergence(u, v, terrain, grid, cfg)
    p = pressure_solve(div, terrain, grid, cfg, mesh=mesh)
    u, v = project(u, v, p, terrain, grid, cfg)
    return u, v, p, div


def init_ocean(grid: Grid):
    """v = 0 (OceanCurrents.cpp:89-102)."""
    z = jnp.zeros(grid.shape, jnp.float32)
    return z, z
