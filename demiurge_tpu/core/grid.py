"""Lat-lon grid specification for the spherical heightfield.

The reference (Kuhlwein/Demiurge) represents the planet as a single-channel
float32 texture over an equirectangular grid, with the geographic extent kept
in a 4-float uniform ``cornerCoords`` and the planet size in ``circumference``
(see reference src/Shader.h:46-79 and src/menus/edit.cpp:21-45).

This module is the TPU-native equivalent: a static (hashable) grid spec that
jitted operators close over.  Arrays are laid out ``(H, W)`` float32 with
**row 0 = southernmost row** (matching GL texture row 0 at t=0 =
``cornerCoords[0]``) and column 0 at ``cornerCoords[2]`` (west edge).

Coordinate conventions (mirroring reference src/Shader.h:49-79):
  - tex coords (s, t) in [0,1]^2, pixel centers at ((c+0.5)/W, (r+0.5)/H)
  - ``tex_to_spheric``: lambda = s*(lam1-lam0)+lam0 ; phi = t*(phi1-phi0)+phi0
  - ``pixelsize``: physical pixel extent in km (for the default 42,000 km
    circumference), x scaled by cos(phi).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PI = math.pi


@dataclasses.dataclass(frozen=True)
class Grid:
    """Static description of the lat-lon grid.

    coords = (phi0, phi1, lam0, lam1) — same index order as the reference's
    ``cornerCoords`` uniform (src/Shader.h:46): [0]=south lat, [1]=north lat,
    [2]=west lon, [3]=east lon (radians).  circumference in km
    (default 42,000 — reference src/menus/edit.cpp:33-45).
    """

    width: int
    height: int
    coords: Tuple[float, float, float, float] = (-PI / 2, PI / 2, -PI, PI)
    circumference: float = 42000.0

    # ---- basic derived facts -------------------------------------------------

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.height, self.width)

    @property
    def phi0(self) -> float:
        return self.coords[0]

    @property
    def phi1(self) -> float:
        return self.coords[1]

    @property
    def lam0(self) -> float:
        return self.coords[2]

    @property
    def lam1(self) -> float:
        return self.coords[3]

    @property
    def wrap_x(self) -> bool:
        """Dateline-periodic in x (reference src/Shader.h:85 condition)."""
        return self.lam0 < -PI + 1e-4 and self.lam1 > PI - 1e-3

    @property
    def wrap_south(self) -> bool:
        """South pole included -> reflect rows below row 0 (src/Shader.h:86)."""
        return self.phi0 < -PI / 2 + 1e-4

    @property
    def wrap_north(self) -> bool:
        """North pole included -> reflect rows above row H-1 (src/Shader.h:91)."""
        return self.phi1 > PI / 2 - 1e-4

    @property
    def radius(self) -> float:
        return self.circumference / (2 * PI)

    # ---- coordinate transforms (src/Shader.h:49-67) --------------------------

    def tex_to_spheric(self, s, t):
        """(s,t) in [0,1]^2 -> (lambda, phi) radians."""
        lam = s * (self.lam1 - self.lam0) + self.lam0
        phi = t * (self.phi1 - self.phi0) + self.phi0
        return lam, phi

    def spheric_to_tex(self, lam, phi):
        s = (lam - self.lam0) / (self.lam1 - self.lam0)
        t = (phi - self.phi0) / (self.phi1 - self.phi0)
        return s, t

    # ---- per-row geometry ----------------------------------------------------

    def row_t(self):
        """t coordinate of each row center, shape (H, 1)."""
        r = jnp.arange(self.height, dtype=jnp.float32).reshape(-1, 1)
        return (r + 0.5) / self.height

    def col_s(self):
        """s coordinate of each column center, shape (1, W)."""
        c = jnp.arange(self.width, dtype=jnp.float32).reshape(1, -1)
        return (c + 0.5) / self.width

    def row_phi(self):
        """Latitude of each row center, shape (H, 1) float32."""
        _, phi = self.tex_to_spheric(jnp.float32(0.0), self.row_t())
        return phi

    def col_lam(self):
        """Longitude of each column center, shape (1, W) float32."""
        lam, _ = self.tex_to_spheric(self.col_s(), jnp.float32(0.0))
        return lam

    def lam_phi(self):
        """Broadcastable (lambda (1,W), phi (H,1)) pair of pixel centers."""
        return self.col_lam(), self.row_phi()

    def pixelsize_rows(self):
        """Physical pixel size (dx, dy) per row — reference src/Shader.h:71-79.

        Returns (dx (H,1), dy scalar) in circumference units (km by default).
        dx varies with latitude as cos(phi); dy is constant.
        """
        phi = self.row_phi()
        scale = self.circumference / (2 * PI)
        dx = (self.lam1 - self.lam0) * jnp.cos(phi) * scale / self.width
        dy = jnp.float32((self.phi1 - self.phi0) * scale / self.height)
        return dx, dy

    def cell_area_rows(self):
        """Per-row pixel area dx*dy, shape (H,1) (used by flow accumulation —
        reference src/filter/FlowFilter.cpp:607-613 uses cos(phi at row lower
        edge); see ops/flow.py for that variant)."""
        dx, dy = self.pixelsize_rows()
        return dx * dy

    # ---- great-circle distance (src/Shader.h:345-355) ------------------------

    def geodistance_tex(self, p1, p2):
        """Haversine distance between two tex-coord points, in x-pixel units
        (matches GLSL ``geodistance`` which scales by size.x/(lam1-lam0))."""
        l1, f1 = self.tex_to_spheric(p1[0], p1[1])
        l2, f2 = self.tex_to_spheric(p2[0], p2[1])
        inner = (
            jnp.sin(jnp.abs(f2 - f1) / 2) ** 2
            + jnp.cos(f1) * jnp.cos(f2) * jnp.sin((l1 - l2) / 2) ** 2
        )
        delta_sigma = 2 * jnp.arcsin(jnp.sqrt(inner))
        return delta_sigma / (self.lam1 - self.lam0) * self.width


def spheric_to_cartesian(lam, phi):
    """(lambda, phi) -> unit vector (x,y,z) — reference src/Shader.h:61-63."""
    return (
        jnp.cos(phi) * jnp.cos(lam),
        jnp.cos(phi) * jnp.sin(lam),
        jnp.sin(phi),
    )


def cartesian_to_spheric(x, y, z):
    """Unit vector -> (lambda, phi) — reference src/Shader.h:65-67."""
    return jnp.arctan2(y, x), jnp.arcsin(jnp.clip(z, -1.0, 1.0))


def rotation_matrix(theta, u):
    """Axis-angle rotation matrix (3x3) — reference src/Shader.h:33-41.

    ``u`` is a 3-vector (tuple or array of shape (3,) or broadcastable field
    components); returns rows as nested tuples for broadcast-friendly matvec.
    GLSL mat3 columns are specified; this returns R such that
    ``apply_rotation(R, v)`` equals the GLSL ``rotation_matrix(theta,u)*v``.
    """
    ux, uy, uz = u
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    omc = 1.0 - c
    # GLSL mat3(c0, c1, c2) stores columns; M*v = sum_j c_j * v_j.
    # Row-major equivalent:
    return (
        (c + ux * ux * omc, ux * uy * omc - uz * s, ux * uz * omc + uy * s),
        (uy * ux * omc + uz * s, c + uy * uy * omc, uy * uz * omc - ux * s),
        (uz * ux * omc - uy * s, uz * uy * omc + ux * s, c + uz * uz * omc),
    )


def apply_rotation(R, v):
    """R @ v for the nested-tuple matrix layout of rotation_matrix."""
    vx, vy, vz = v
    return (
        R[0][0] * vx + R[0][1] * vy + R[0][2] * vz,
        R[1][0] * vx + R[1][1] * vy + R[1][2] * vz,
        R[2][0] * vx + R[2][1] * vy + R[2][2] * vz,
    )


def normalize3(v, eps=0.0):
    vx, vy, vz = v
    n = jnp.sqrt(vx * vx + vy * vy + vz * vz + eps)
    return (vx / n, vy / n, vz / n)


def cross3(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def tangent_basis(lam, phi):
    """East/north unit tangent vectors at (lambda, phi).

    Matches the reference's ``cartesian_to_v`` basis (src/Shader.h:101-117 and
    src/filter/OceanCurrents.cpp:251-268): ``parallel_comp`` = normalize(
    cross(z_hat, r_hat)) = east; ``y_comp`` = north.
    """
    east = (-jnp.sin(lam), jnp.cos(lam), jnp.zeros_like(lam) * jnp.ones_like(phi))
    north = (
        -jnp.sin(phi) * jnp.cos(lam),
        -jnp.sin(phi) * jnp.sin(lam),
        jnp.cos(phi) * jnp.ones_like(lam),
    )
    return east, north


def v_to_cartesian(vx, vy, lam, phi):
    """Tangent (east,north) components -> 3D vector (OceanCurrents.cpp:251-258)."""
    east, north = tangent_basis(lam, phi)
    return (
        vx * east[0] + vy * north[0],
        vx * east[1] + vy * north[1],
        vx * east[2] + vy * north[2],
    )


def cartesian_to_v(v, lam, phi, subtract_radial=False):
    """3D vector -> tangent (east,north) components.

    With ``subtract_radial=True`` matches src/Shader.h:104-116 (projects out
    the radial component first — a no-op for the dot products but kept for
    bit-parity of intermediate rounding).
    """
    if subtract_radial:
        r = spheric_to_cartesian(lam, phi)
        v = tuple(vi - dot3(v, r) / dot3(r, r) * ri for vi, ri in zip(v, r))
    east, north = tangent_basis(lam, phi)
    return dot3(v, east), dot3(v, north)
