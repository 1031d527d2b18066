"""Seamless spherical gradient noise (simplex fBm on the unit sphere).

Reproduces the reference GradientNoise filter (src/filter/GradientNoise.cpp):
the Ashima/stegu textureless 3D simplex noise with analytic gradient
(GradientNoise.cpp:66-177) evaluated on the unit sphere (no seams), and the
seven fBm variants (GradientNoise.cpp:184-435):

  default   — rotation-matrix domain warp on the sphere + plain fBm
  ridged    — sum of (1 - |n|)
  billowy   — sum of |n|
  iq        — gradient-suppressed (IQ-style) fBm
  swiss     — gradient-rotated ridged fBm with slope-damped amplitude
  jordan    — warped n^2 fBm with damped amplitude
  plateaus  — gradient-rotated fBm with 1/(1+5 fc^2) compression

Seed handling: the reference seeds std::mt19937 and draws 3 uniform floats in
[0, 10000) for ``seed_offset`` (GradientNoise.cpp:490-494).  We derive the
offset from jax PRNG instead (documented deviation: the C++ draw depends on
libstdc++'s uniform_real_distribution internals); pass ``seed_offset``
explicitly for bit-level control.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from .blend import blend

PI = math.pi


# ---------------------------------------------------------------------------
# Ashima 3D simplex noise with analytic gradient (GradientNoise.cpp:79-177)
# ---------------------------------------------------------------------------


def _mod289(x):
    return x - jnp.floor(x * (1.0 / 289.0)) * 289.0


def _permute(x):
    return _mod289(((x * 34.0) + 1.0) * x)


def _taylor_inv_sqrt(r):
    return 1.79284291400159 - 0.85373472095314 * r


def snoise_grad(v):
    """3D simplex noise + analytic gradient.

    v: (..., 3) float32. Returns (value (...,), gradient (..., 3)).
    Direct transliteration of GradientNoise.cpp:96-177.
    """
    Cx, Cy = 1.0 / 6.0, 1.0 / 3.0
    Dy, Dz, Dw = 0.5, 1.0, 2.0

    i = jnp.floor(v + jnp.sum(v * Cy, axis=-1, keepdims=True))
    x0 = v - i + jnp.sum(i * Cx, axis=-1, keepdims=True)

    g = (x0[..., [0, 1, 2]] >= x0[..., [1, 2, 0]]).astype(v.dtype)
    l = 1.0 - g
    lzxy = l[..., [2, 0, 1]]
    i1 = jnp.minimum(g, lzxy)
    i2 = jnp.maximum(g, lzxy)

    x1 = x0 - i1 + Cx
    x2 = x0 - i2 + Cy
    x3 = x0 - Dy

    i = _mod289(i)
    iz, iy, ix = i[..., 2], i[..., 1], i[..., 0]

    def four(a0, a1, a2):
        # vec4(0, i1.c, i2.c, 1) for component c
        return jnp.stack([jnp.zeros_like(a0), a1, a2, jnp.ones_like(a0)], -1)

    p = _permute(
        _permute(
            _permute(iz[..., None] + four(iz, i1[..., 2], i2[..., 2]))
            + iy[..., None]
            + four(iy, i1[..., 1], i2[..., 1])
        )
        + ix[..., None]
        + four(ix, i1[..., 0], i2[..., 0])
    )

    n_ = 0.142857142857
    ns_x = n_ * Dw - 0.0  # D.w * n_ - D.x
    ns_y = n_ * Dy - Dz   # D.y * n_ - D.z
    ns_z = n_ * Dz - 0.0  # D.z * n_ - D.x

    j = p - 49.0 * jnp.floor(p * ns_z * ns_z)

    x_ = jnp.floor(j * ns_z)
    y_ = jnp.floor(j - 7.0 * x_)

    x = x_ * ns_x + ns_y
    y = y_ * ns_x + ns_y
    h = 1.0 - jnp.abs(x) - jnp.abs(y)

    b0 = jnp.concatenate([x[..., 0:2], y[..., 0:2]], -1)
    b1 = jnp.concatenate([x[..., 2:4], y[..., 2:4]], -1)

    s0 = jnp.floor(b0) * 2.0 + 1.0
    s1 = jnp.floor(b1) * 2.0 + 1.0
    sh = -(h <= 0.0).astype(v.dtype)

    a0 = b0[..., [0, 2, 1, 3]] + s0[..., [0, 2, 1, 3]] * sh[..., [0, 0, 1, 1]]
    a1 = b1[..., [0, 2, 1, 3]] + s1[..., [0, 2, 1, 3]] * sh[..., [2, 2, 3, 3]]

    p0 = jnp.stack([a0[..., 0], a0[..., 1], h[..., 0]], -1)
    p1 = jnp.stack([a0[..., 2], a0[..., 3], h[..., 1]], -1)
    p2 = jnp.stack([a1[..., 0], a1[..., 1], h[..., 2]], -1)
    p3 = jnp.stack([a1[..., 2], a1[..., 3], h[..., 3]], -1)

    norm = _taylor_inv_sqrt(
        jnp.stack(
            [
                jnp.sum(p0 * p0, -1),
                jnp.sum(p1 * p1, -1),
                jnp.sum(p2 * p2, -1),
                jnp.sum(p3 * p3, -1),
            ],
            -1,
        )
    )
    p0 = p0 * norm[..., 0:1]
    p1 = p1 * norm[..., 1:2]
    p2 = p2 * norm[..., 2:3]
    p3 = p3 * norm[..., 3:4]

    m = jnp.maximum(
        0.6
        - jnp.stack(
            [
                jnp.sum(x0 * x0, -1),
                jnp.sum(x1 * x1, -1),
                jnp.sum(x2 * x2, -1),
                jnp.sum(x3 * x3, -1),
            ],
            -1,
        ),
        0.0,
    )
    m2 = m * m
    m4 = m2 * m2
    pdotx = jnp.stack(
        [
            jnp.sum(p0 * x0, -1),
            jnp.sum(p1 * x1, -1),
            jnp.sum(p2 * x2, -1),
            jnp.sum(p3 * x3, -1),
        ],
        -1,
    )

    temp = m2 * m * pdotx
    gradient = -8.0 * (
        temp[..., 0:1] * x0
        + temp[..., 1:2] * x1
        + temp[..., 2:3] * x2
        + temp[..., 3:4] * x3
    )
    gradient = gradient + (
        m4[..., 0:1] * p0 + m4[..., 1:2] * p1 + m4[..., 2:3] * p2 + m4[..., 3:4] * p3
    )
    gradient = gradient * 42.0

    value = 42.0 * jnp.sum(m4 * pdotx, -1)
    return value, gradient


# ---------------------------------------------------------------------------
# fBm variants
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NoiseParams:
    """GradientNoiseMenu parameters (GradientNoise.cpp:17-45)."""

    mode: str = "default"
    seed: int = 0
    scale: float = 5.0
    octaves: int = 8
    lacunarity: float = 2.0
    persistence: float = 0.5
    warp: float = 0.0
    min: float = 0.0      # lower_limit
    max: float = 1.0      # higher_limit


def seed_offset_from(seed: int) -> jnp.ndarray:
    """3 offsets in [0, 10000) from an integer seed (see module docstring)."""
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(key, (3,), jnp.float32, 0.0, 10000.0)


def _norm3(p):
    return jnp.sqrt(jnp.sum(p * p, -1, keepdims=True))


def _radial(tmp, p):
    """Radial component of tmp along p: dot(tmp,p)/|p| * p/|p|."""
    return jnp.sum(tmp * p, -1, keepdims=True) / jnp.sum(p * p, -1, keepdims=True) * p


def _rotate(p, theta, u):
    """Axis-angle rotation of (...,3) vectors; u need not be unit (matches the
    reference's use of rotation_matrix with non-unit axes)."""
    c = jnp.cos(theta)[..., None]
    s = jnp.sin(theta)[..., None]
    omc = 1.0 - c
    ux, uy, uz = u[..., 0:1], u[..., 1:2], u[..., 2:3]
    px, py, pz = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    rx = (c + ux * ux * omc) * px + (ux * uy * omc - uz * s) * py + (ux * uz * omc + uy * s) * pz
    ry = (uy * ux * omc + uz * s) * px + (c + uy * uy * omc) * py + (uy * uz * omc - ux * s) * pz
    rz = (uz * ux * omc - uy * s) * px + (uz * uy * omc + ux * s) * py + (c + uz * uz * omc) * pz
    return jnp.concatenate([rx, ry, rz], -1)


def _warp(p, warp_factor, seed_off=None):
    """The shared domain warp (GradientNoise.cpp:195-209 etc.): rotate p
    about axis (p+tangential-gradient)/|..|^2 by warp*0.1*|grad|."""
    if seed_off is None:
        _, tmp = snoise_grad(p)
    else:
        _, tmp = snoise_grad(p + seed_off)
    tmp = tmp - _radial(tmp, p)
    u = p + tmp
    u = u / jnp.sum(u * u, -1, keepdims=True)
    theta = warp_factor * 0.1 * jnp.squeeze(_norm3(tmp), -1)
    return _rotate(p, theta, u)


def sphere_points(grid: Grid):
    """(H, W, 3) unit sphere points of all pixel centers."""
    lam, phi = grid.lam_phi()
    x = jnp.cos(phi) * jnp.cos(lam)
    y = jnp.cos(phi) * jnp.sin(lam)
    z = jnp.sin(phi) * jnp.ones_like(lam)
    return jnp.stack([jnp.broadcast_to(x, grid.shape),
                      jnp.broadcast_to(y, grid.shape),
                      jnp.broadcast_to(z, grid.shape)], -1)


@partial(jax.jit, static_argnames=("grid", "params"))
def fbm(grid: Grid, params: NoiseParams, seed_offset=None):
    """Evaluate the configured fBm over the whole grid -> (H, W) raw noise
    mapped into [min, max] per the reference's final mapping."""
    if seed_offset is None:
        seed_offset = seed_offset_from(params.seed)
    seed_offset = jnp.asarray(seed_offset, jnp.float32)
    p = sphere_points(grid)
    lo, hi = params.min, params.max
    n_oct = params.octaves
    lac, per = params.lacunarity, params.persistence

    if params.mode == "default":
        # GradientNoise.cpp:185-220
        p = p * params.scale
        p = _warp(p, params.warp)
        fc = jnp.zeros(grid.shape, jnp.float32)
        amp, total = 1.0, 0.0
        for i in range(n_oct):
            v, _ = snoise_grad(p + seed_offset * (i + 1))
            fc = fc + v * amp
            p = p * lac
            total += amp
            amp *= per
        fc = fc / total
        return (fc + 1) * 0.5 * (hi - lo) + lo

    if params.mode == "ridged":
        # GradientNoise.cpp:224-241
        p = p * params.scale
        fc = jnp.zeros(grid.shape, jnp.float32)
        amp, total = 1.0, 0.0
        for _ in range(n_oct):
            v, _ = snoise_grad(p + seed_offset)
            fc = fc + (1 - jnp.abs(v)) * amp
            p = p * lac
            total += amp
            amp *= per
        return fc / total * (hi - lo) + lo

    if params.mode == "billowy":
        # GradientNoise.cpp:244-261
        p = p * params.scale
        fc = jnp.zeros(grid.shape, jnp.float32)
        amp, total = 1.0, 0.0
        for _ in range(n_oct):
            v, _ = snoise_grad(p + seed_offset)
            fc = fc + jnp.abs(v) * amp
            p = p * lac
            total += amp
            amp *= per
        return fc / total * (hi - lo) + lo

    if params.mode == "iq":
        # GradientNoise.cpp:264-285
        p = p * params.scale
        fc = jnp.zeros(grid.shape, jnp.float32)
        dsum = jnp.zeros_like(p)
        amp = 1.0
        total = jnp.zeros(grid.shape, jnp.float32)
        for _ in range(n_oct):
            v, tmp = snoise_grad(p + seed_offset)
            dsum = dsum + (tmp - _radial(tmp, p))
            d2 = jnp.sum(dsum * dsum, -1)
            fc = fc + v * amp / (1.0 + d2)
            p = p * lac
            total = total + amp / (1.0 + d2)
            amp *= per
        fc = fc / total
        return (fc + 1) * 0.5 * (hi - lo) + lo

    if params.mode == "swiss":
        # GradientNoise.cpp:288-329
        freq = params.scale
        p = _warp(p, params.warp)
        fc = jnp.zeros(grid.shape, jnp.float32)
        dsum = jnp.zeros_like(p)
        amp = jnp.ones(grid.shape, jnp.float32)
        total = jnp.zeros(grid.shape, jnp.float32)
        for _ in range(n_oct):
            u = p + jnp.cross(p, dsum)
            u = u / jnp.sum(u * u, -1, keepdims=True)
            theta = 2 * 0.1 * jnp.squeeze(_norm3(dsum), -1)
            p_ = _rotate(p, theta, u)
            v, tmp = snoise_grad(freq * p_ + seed_offset)
            dsum = dsum + (tmp - _radial(tmp, p)) * (-v[..., None]) * amp[..., None]
            fc = fc + (1 - jnp.abs(v)) * amp
            freq *= lac
            total = total + amp
            # smoothstep(-1, 1, fc*fc)
            tt = jnp.clip((fc * fc + 1) / 2, 0.0, 1.0)
            amp = amp * per * (tt * tt * (3 - 2 * tt))
        return fc / total * (hi - lo) + lo

    if params.mode == "jordan":
        # GradientNoise.cpp:333-382
        freq = params.scale
        p = _warp(p, params.warp, seed_offset)
        v, tmp = snoise_grad(freq * p + seed_offset)
        amp = 1.0
        total = amp
        fc = v * v * amp
        tmp = tmp * v[..., None]
        tang = tmp - _radial(tmp, p)
        dsum_warp = 0.4 * tang
        dsum_damp = 1.0 * tang
        damped_amp = jnp.full(grid.shape, amp * per, jnp.float32)
        for _ in range(1, n_oct):
            u = p + jnp.cross(p, dsum_warp)
            u = u / jnp.sum(u * u, -1, keepdims=True)
            theta = 2 * 0.1 * jnp.squeeze(_norm3(dsum_warp), -1)
            p_ = _rotate(p, theta, u)
            v, tmp = snoise_grad(freq * p_ + seed_offset)
            fc = fc + damped_amp * v * v
            tmp = tmp * v[..., None]
            tang = tmp - _radial(tmp, p)
            dsum_warp = dsum_warp + 0.35 * tang
            dsum_damp = dsum_damp + 0.8 * tang
            freq *= lac
            total += amp
            amp *= per
            d2 = jnp.sum(dsum_damp * dsum_damp, -1)
            damped_amp = amp * (1 - 1.0 / (1 + d2))
        return fc / total * (hi - lo) + lo

    if params.mode == "plateaus":
        # GradientNoise.cpp:385-434
        freq = params.scale
        p = _warp(p, params.warp)
        fc = jnp.zeros(grid.shape, jnp.float32)
        amp, total = 1.0, 0.0
        for i in range(n_oct):
            v, tmp = snoise_grad(freq * p + seed_offset * (i + 1))
            radial = _radial(tmp, p)
            dsum = (tmp - radial) * ((1 - jnp.abs(v)) * v * 2)[..., None]
            u = p + jnp.cross(p, dsum)
            u = u / jnp.sum(u * u, -1, keepdims=True)
            theta = 2 * 0.1 * jnp.squeeze(_norm3(dsum), -1)
            p_ = _rotate(p, theta, u)
            v, tmp = snoise_grad(freq * p_ + seed_offset * (i + 1))
            fc = fc + v * amp / (1 + jnp.abs(fc) * jnp.abs(fc) * 5)
            freq *= lac
            total += amp
            amp *= per
        fc = fc / total
        return (fc + 1) * 0.5 * (hi - lo) + lo

    raise ValueError(f"unknown noise mode {params.mode!r}")


@partial(jax.jit, static_argnames=("grid", "params", "blend_mode"))
def gradient_noise(height, sel, grid: Grid, params: NoiseParams,
                   blend_mode: str = "replace"):
    """Full GradientNoise filter: fBm blended into the terrain through the
    selection (GradientNoise.cpp:453-455)."""
    noise = fbm(grid, params)
    return blend(height, noise, sel, blend_mode)
