"""Plate tectonics.

Reproduces the reference Tectonics filter (src/filter/tectonics/): N plates,
each a 4-channel field in its own *plate-local frame* (crust height, crust
age, ridge/type, spare — Plate.h:20-25) plus an accumulated rotation and a
constant angular velocity (Plate.cpp:26-28, 46-48).  One step
(Tectonics.cpp:156-272):

  1. rotate every plate by its angular velocity (Plate::rotate)
  2. fold      — resample all plates into the world frame via their rotation
                 matrices and depth-sort (age/land rules), marking
                 subduction overlaps (Tectonics.cpp:112-153, 278-293)
  3. oceanSpreading — multi-scale (radius 2^i up then down, 16 directions)
                 distance propagation from plate borders; z becomes the
                 new-ocean-crust / ridge flag (295-397)
  4. collision — per-plate velocity field; convergence magnitude+direction
                 at plate boundaries; 10 propagation sweeps of the collision
                 distance field (399-614)
  5. render    — the reference writes the *plate index* channel to the
                 terrain (WIP debug state, Tectonics.cpp:199);
                 ``render_mode='height'`` applies the evident intent instead:
                 world crust height plus collision-driven orogeny uplift
  6. unfold    — inverse-rotate the world state into each plate frame:
                 increment age, delete crust claimed by other plates, create
                 new ridge crust at divergent boundaries (216-268)

World-frame work fields are (H, W, 4); the reference uses square W x W
textures for these (Tectonics.cpp:22-24) — resolution only affects sampling
density, not semantics (documented deviation).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core.topology import grid_st, sample_nearest, shift
from ..core.fastroll import row_sample_nearest_x

PI = math.pi


# ---------------------------------------------------------------------------
# plates
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Plate:
    """field: (H, W, 4) = [crust height, age (<0 = absent), type, spare]."""

    field: jax.Array
    rotation: np.ndarray                 # (3,3) accumulated
    angular_velocity: np.ndarray         # (3,)

    def rotate(self):
        w = self.angular_velocity
        n = np.linalg.norm(w)
        if n > 0:
            self.rotation = self.rotation @ _axis_angle(w / n, n)


def _axis_angle(u, theta) -> np.ndarray:
    c, s = math.cos(theta), math.sin(theta)
    ux, uy, uz = u
    omc = 1 - c
    return np.array([
        [c + ux * ux * omc, ux * uy * omc - uz * s, ux * uz * omc + uy * s],
        [uy * ux * omc + uz * s, c + uy * uy * omc, uy * uz * omc - ux * s],
        [uz * ux * omc - uy * s, uz * uy * omc + ux * s, c + uz * uz * omc],
    ], np.float32)


def init_plates(height, grid: Grid) -> List[Plate]:
    """The reference's two-plate setup (Tectonics.cpp:15-58): east half /
    west half of the current terrain, angular velocities ±0.01 about
    (-1,0,0)."""
    s, _ = grid_st(grid)
    s = jnp.broadcast_to(s, grid.shape)
    h = height

    f0 = jnp.where(
        (s > 0.5)[..., None],
        jnp.stack([jnp.where(h > 0, h, -1.0), jnp.full_like(h, 1.0),
                   jnp.zeros_like(h), jnp.zeros_like(h)], -1),
        jnp.stack([jnp.zeros_like(h), jnp.full_like(h, -1.0),
                   jnp.zeros_like(h), jnp.zeros_like(h)], -1))
    f1 = jnp.where(
        (s < 0.5)[..., None],
        jnp.stack([jnp.where(h > 0, h, -2.0), jnp.full_like(h, 0.5),
                   jnp.zeros_like(h), jnp.zeros_like(h)], -1),
        jnp.stack([jnp.zeros_like(h), jnp.full_like(h, -1.0),
                   jnp.zeros_like(h), jnp.zeros_like(h)], -1))

    p0 = Plate(f0, np.eye(3, dtype=np.float32),
               0.01 * np.array([-1.0, 0, 0], np.float32))
    p1 = Plate(f1, np.eye(3, dtype=np.float32),
               -0.01 * np.array([-1.0, 0, 0], np.float32))
    return [p0, p1]


# ---------------------------------------------------------------------------
# frame resampling (tectonicSamplingShader, Tectonics.cpp:61-93)
# ---------------------------------------------------------------------------


def _rotated_sample(field4, R, grid: Grid):
    """Sample a 4-channel field at the rotation-transformed position of
    every world pixel (NEAREST, like the reference's unfiltered textures)."""
    lam, phi = grid.lam_phi()
    x = jnp.cos(phi) * jnp.cos(lam)
    y = jnp.cos(phi) * jnp.sin(lam)
    z = jnp.sin(phi) * jnp.ones_like(lam)
    rx = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z
    ry = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z
    rz = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z
    lam2 = jnp.arctan2(ry, rx)
    phi2 = jnp.arcsin(jnp.clip(rz, -1.0, 1.0))
    s2, t2 = grid.spheric_to_tex(lam2, phi2)
    s2 = jnp.broadcast_to(s2, grid.shape)
    t2 = jnp.broadcast_to(t2, grid.shape)
    return jnp.stack([sample_nearest(field4[..., c], s2, t2)
                      for c in range(field4.shape[-1])], -1)


# ---------------------------------------------------------------------------
# the passes
# ---------------------------------------------------------------------------


def fold(plates: List[Plate], grid: Grid):
    """World state [plate index, height, age, collision] (Tectonics.cpp:
    99-153, 278-293)."""
    return _fold_impl([p.field for p in plates],
                      [jnp.asarray(p.rotation) for p in plates], grid)


def _fold_impl(fields, rotations, grid: Grid):
    H, W = grid.shape
    world = jnp.broadcast_to(
        jnp.asarray([0.0, -1.0, -1.0, -1.1e6], jnp.float32), (H, W, 4))

    for index, (field, R) in enumerate(zip(fields, rotations), start=1):
        p = _rotated_sample(field, R, grid)
        plate_h = p[..., 0]
        plate_age = p[..., 1]
        prev_h = world[..., 1]
        prev_age = world[..., 2]
        fa = world[..., 3]

        overlap = (plate_age >= 0) & (prev_age >= 0)
        fa = jnp.where(overlap, plate_h, fa)
        world = world.at[..., 3].set(fa)

        take_new = (plate_age >= 0) & ~overlap
        new_vals = jnp.stack([jnp.full_like(plate_h, index), plate_h,
                              plate_age, fa], -1)
        world = jnp.where(take_new[..., None], new_vals, world)

        land_on_ocean = (plate_h > 0) & (prev_h <= 0)
        younger = plate_age < prev_age
        on_top = ((younger & (plate_h <= 0) & (prev_h <= 0))
                  | (~younger & (plate_h > 0) & (prev_h > 0))
                  | land_on_ocean)
        top_vals = jnp.stack([jnp.full_like(plate_h, index), plate_h,
                              plate_age, prev_h], -1)
        world = jnp.where((overlap & on_top)[..., None], top_vals, world)
    return world


def _circle_sample4(field4, grid: Grid, radius: float, i: int, n: int = 16,
                    stretch: bool = True):
    """One of the 16 circle taps with optional 1/cos(phi) x stretch
    (NEAREST through the wrap topology)."""
    ang = 2 * 3.14159 * i / n
    dy = math.sin(ang) * radius
    ky = math.floor(0.5 + dy)
    phi = grid.row_phi()
    if stretch:
        dx = math.cos(ang) * radius / jnp.cos(jnp.abs(phi))
    else:
        dx = jnp.full_like(phi, math.cos(ang) * radius)
    out = []
    for c in range(field4.shape[-1]):
        tap = shift(field4[..., c], 0, ky, grid)
        tap = row_sample_nearest_x(tap, dx)
        out.append(tap)
    return jnp.stack(out, -1)


def _geodist_const(grid: Grid, dx_pix, dy_pix):
    """geodistance(st, offset(st,(dx,dy))) per row, in x-pixel units
    (Shader.h:345-355).  dx_pix may be per-row (stretched)."""
    phi1 = grid.row_phi()
    dlam = dx_pix * (grid.lam1 - grid.lam0) / grid.width
    dphi = dy_pix * (grid.phi1 - grid.phi0) / grid.height
    phi2 = phi1 + dphi
    inner = (jnp.sin(jnp.abs(dphi) / 2) ** 2
             + jnp.cos(phi1) * jnp.cos(phi2) * jnp.sin(dlam / 2) ** 2)
    ds = 2 * jnp.arcsin(jnp.sqrt(jnp.clip(inner, 0.0, 1.0)))
    return ds / (grid.lam1 - grid.lam0) * grid.width


def ocean_spreading(world, grid: Grid):
    """Distance propagation from plate borders (Tectonics.cpp:295-397)."""
    world = world.at[..., 2].set(0.0)

    radii = [2.0 ** i for i in range(5)] + [2.0 ** i for i in range(5, 0, -1)]
    phi = grid.row_phi()
    for radius in radii:
        fc = world
        for i in range(16):
            a = _circle_sample4(world, grid, radius, i)
            ang = 2 * 3.14159 * i / 16
            dxp = math.cos(ang) * radius / jnp.cos(jnp.abs(phi))
            dyp = math.sin(ang) * radius
            dist = jnp.broadcast_to(_geodist_const(grid, dxp, dyp),
                                    grid.shape)
            nz = a[..., 2] + dist
            better = ((nz < fc[..., 2]) | (fc[..., 0] == 0)) & (a[..., 0] != 0)
            cand = jnp.stack([a[..., 0], jnp.full_like(nz, -1.1), nz,
                              jnp.full_like(nz, -1.1e6)], -1)
            fc = jnp.where(better[..., None], cand, fc)
        world = fc

    return world.at[..., 2].set(jnp.where(world[..., 2] > 0, 1.0, 0.0))


def collision(world, plates: List[Plate], grid: Grid):
    """Convergence + propagation (Tectonics.cpp:399-614).

    Returns (H, W, 4) = [distance, plate index, theta, phi]."""
    return _collision_impl(
        world, [jnp.asarray(p.angular_velocity) for p in plates], grid)


def _collision_impl(world, angvels, grid: Grid):
    H, W = grid.shape
    # velocity field: angular velocity of the owning plate (431-442)
    vel = jnp.zeros((H, W, 4), jnp.float32)
    for index, w3 in enumerate(angvels, start=1):
        mine = world[..., 0] == index
        w = jnp.concatenate([jnp.asarray(w3, jnp.float32),
                             jnp.zeros((1,), jnp.float32)])
        vel = jnp.where(mine[..., None], w, vel)

    # convergence at boundaries (445-529)
    lam, phi = grid.lam_phi()
    px = jnp.broadcast_to(jnp.cos(phi) * jnp.cos(lam), grid.shape)
    py = jnp.broadcast_to(jnp.cos(phi) * jnp.sin(lam), grid.shape)
    pz = jnp.broadcast_to(jnp.sin(phi) * jnp.ones_like(lam), grid.shape)

    index_f = world[..., 0]
    sub_h = world[..., 3]
    v0 = vel[..., :3]

    othercount = jnp.zeros(grid.shape, jnp.float32)
    otherv = jnp.zeros((H, W, 3), jnp.float32)
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            n_idx = shift(index_f, i, j, grid)
            same = n_idx == index_f
            other = ~same
            othercount = othercount + other.astype(jnp.float32)
            nv = jnp.stack([shift(vel[..., c], i, j, grid)
                            for c in range(3)], -1)
            otherv = jnp.where(other[..., None], nv, otherv)

    ov_n = otherv / jnp.maximum(
        jnp.sqrt(jnp.sum(otherv ** 2, -1, keepdims=True)), 1e-20)
    vdoto = jnp.sum(v0 * ov_n, -1, keepdims=True)
    v = otherv - vdoto * ov_n
    kx = v[..., 1] * pz - v[..., 2] * py
    ky_ = v[..., 2] * px - v[..., 0] * pz
    kz = v[..., 0] * py - v[..., 1] * px
    magnitude = jnp.sqrt(kx * kx + ky_ * ky_ + kz * kz)

    v0n = jnp.sqrt(jnp.sum(v0 ** 2, -1))
    theta = jnp.arccos(jnp.clip(v0[..., 2] / jnp.maximum(v0n, 1e-20),
                                -1.0, 1.0))
    phi_o = jnp.arctan2(v0[..., 1], v0[..., 0])

    no_collide = (sub_h <= -1e6) | (sub_h > 0) | (othercount == 0)
    coll = jnp.where(
        no_collide[..., None],
        jnp.broadcast_to(jnp.asarray([1e6, 0, 0, 0], jnp.float32),
                         (H, W, 4)),
        jnp.stack([jnp.zeros_like(magnitude), magnitude, theta, phi_o], -1))

    # propagation sweeps (534-613); radius = sweep number, integer offsets,
    # no x stretch
    for sweep in range(10):
        radius = float(sweep)
        fc = coll
        th = fc[..., 2]
        ph = fc[..., 3]
        ox = jnp.cos(ph) * jnp.sin(th)
        oy = jnp.sin(ph) * jnp.sin(th)
        oz = jnp.cos(th)
        # diff2 = -cross(omega, x)
        d2x = -(oy * pz - oz * py)
        d2y = -(oz * px - ox * pz)
        d2z = -(ox * py - oy * px)
        d2n = jnp.sqrt(d2x * d2x + d2y * d2y + d2z * d2z)
        minangle = jnp.full(grid.shape, 20.0)
        for xx in range(16):
            i = int(math.cos(2 * 3.14159 * xx / 16) * radius)
            j = int(math.sin(2 * 3.14159 * xx / 16) * radius)
            if i == 0 and j == 0:
                continue
            fold_s = jnp.stack([shift(coll[..., c], i, j, grid)
                                for c in range(4)], -1)
            n_idx = shift(index_f, i, j, grid)
            # diff = delta_spheric_to_cartesian (543-548): -|dx|*eastish + dy*north
            lamb = jnp.broadcast_to(lam, grid.shape)
            phib = jnp.broadcast_to(phi * jnp.ones_like(lam), grid.shape)
            dn = math.sqrt(i * i + j * j)
            dxn, dyn = i / dn, j / dn
            dX = (-abs(dxn)) * (-jnp.cos(phib) * jnp.sin(lamb)) + dyn * (
                -jnp.sin(phib) * jnp.cos(lamb))
            dY = (-abs(dxn)) * (jnp.cos(phib) * jnp.cos(lamb)) + dyn * (
                -jnp.sin(phib) * jnp.sin(lamb))
            dZ = dyn * jnp.cos(phib)
            dnn = jnp.sqrt(dX * dX + dY * dY + dZ * dZ)
            cosang = (d2x * dX + d2y * dY + d2z * dZ) / jnp.maximum(
                d2n * dnn, 1e-20)
            angle = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
            dist = jnp.broadcast_to(
                _geodist_const(grid, float(i), float(j)), grid.shape)
            better = ((n_idx == index_f)
                      & (dist + fold_s[..., 0] < fc[..., 0])
                      & (angle < minangle))
            newfc = fold_s.at[..., 0].set(fold_s[..., 0] + dist)
            fc = jnp.where(better[..., None], newfc, fc)
            minangle = jnp.where(better, angle, minangle)
        fc = fc.at[..., 1].set(index_f)
        coll = fc

    return coll


def unfold(world, plates: List[Plate], grid: Grid):
    """Back to plate frames (Tectonics.cpp:216-268). Mutates plate fields."""
    new_fields = _unfold_impl(world, [p.field for p in plates],
                              [jnp.asarray(p.rotation) for p in plates], grid)
    for plate, nf in zip(plates, new_fields):
        plate.field = nf
    return plates


def _unfold_impl(world, fields, rotations, grid: Grid):
    phi = grid.row_phi()
    inv_cos = 1.0 / jnp.cos(jnp.abs(phi))

    out = []
    for index, (field, R) in enumerate(zip(fields, rotations), start=1):
        Rinv = jnp.swapaxes(R, -1, -2)
        a = _rotated_sample(world, Rinv, grid)

        fc = field
        age = fc[..., 1]
        fc = fc.at[..., 1].set(jnp.where(age >= 0, age + 0.01, age))

        # delete crust claimed by other plates: all 9 samples of the
        # stretched plate-frame neighborhood, inverse-rotated into the world,
        # have a different index.  The reference offsets st then
        # inverse-rotates the offset point (Tectonics.cpp:241-245); since
        # a[st] = world[Rinv st], sampling the offset pixel's 'a' equals
        # shifting 'a' itself.
        different = jnp.ones(grid.shape, bool)
        for i in (-1, 0, 1):
            for j in (-1, 0, 1):
                tap_idx = row_sample_nearest_x(
                    shift(a[..., 0], 0, j, grid), i * inv_cos)
                different = different & (tap_idx != index)

        delete = different & ~((a[..., 1] <= 0) & (fc[..., 0] > 0))
        fc = jnp.where(delete[..., None],
                       jnp.asarray([0.0, -1.0, 0.0, 0.0], jnp.float32), fc)

        # new ridge crust
        new = (fc[..., 1] < 0) & (a[..., 0] == index) & (
            jnp.abs(a[..., 2] - 1.0) < 0.01)
        fc = jnp.where(new[..., None],
                       jnp.asarray([-float(index), 1.0, 0.0, 0.0],
                                   jnp.float32), fc)
        out.append(fc)
    return out


@dataclasses.dataclass(frozen=True)
class TectonicsConfig:
    steps: int = 70                   # Tectonics.cpp:157
    render_mode: str = "height"       # 'index' = exact reference output
    uplift_scale: float = 1.0
    uplift_range: float = 100.0       # px distance falloff for intent uplift


def render_terrain(world, coll, grid: Grid, cfg: TectonicsConfig):
    """Terrain output (Tectonics.cpp:186-210).

    'index' mode reproduces the reference exactly (writes the collision
    result's y channel, which holds the plate index).  'height' mode applies
    the evident intent: world crust height + collision-driven orogeny uplift
    with a distance falloff.
    """
    if cfg.render_mode == "index":
        return coll[..., 1]
    h = world[..., 1]
    dist = coll[..., 0]
    # the propagation sweeps overwrite the magnitude channel with the plate
    # index (Tectonics.cpp:590), so intent-mode uplift decays with the
    # propagated collision distance only
    uplift = jnp.where(dist < 1e6,
                       jnp.maximum(0.0, 1.0 - dist / cfg.uplift_range), 0.0)
    return h + cfg.uplift_scale * uplift


def tectonics_step(plates: List[Plate], grid: Grid,
                   cfg: TectonicsConfig = TectonicsConfig()):
    """One full tectonics step; returns (plates, terrain)."""
    for p in plates:
        p.rotate()
    world = fold(plates, grid)
    world = ocean_spreading(world, grid)
    coll = collision(world, plates, grid)
    terrain = render_terrain(world, coll, grid, cfg)
    plates = unfold(world, plates, grid)
    return plates, terrain


def run_tectonics(height, grid: Grid, cfg: TectonicsConfig = TectonicsConfig(),
                  plates: List[Plate] = None):
    """The full 70-step run (Tectonics.cpp:156-272)."""
    if plates is None:
        plates = init_plates(height, grid)
    terrain = height
    for _ in range(cfg.steps):
        plates, terrain = tectonics_step(plates, grid, cfg)
    return plates, terrain


# ---------------------------------------------------------------------------
# jittable stacked form: plates as one pytree, rotations as traced state
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PlateStack:
    """All plates as one pytree — the scalable form of the mutable
    ``Plate`` list: ``fields`` (P, H, W, 4) in plate-local frames,
    ``rotations`` (P, 3, 3) accumulated (traced, advanced in-step), and
    ``angvel`` (P, 3) constant angular velocities.  The whole step jits
    end-to-end and shards with P(None, 'y', 'x') under GSPMD."""

    fields: jax.Array
    rotations: jax.Array
    angvel: jax.Array

    @property
    def n_plates(self) -> int:
        return self.fields.shape[0]


def plate_stack(plates: List[Plate]) -> PlateStack:
    return PlateStack(
        fields=jnp.stack([p.field for p in plates]),
        rotations=jnp.stack([jnp.asarray(p.rotation) for p in plates]),
        angvel=jnp.stack([jnp.asarray(p.angular_velocity) for p in plates]),
    )


def init_plate_stack(height, grid: Grid) -> PlateStack:
    return plate_stack(init_plates(height, grid))


def _axis_angle_jnp(w):
    """(3,) angular velocity -> rotation matrix by |w| about w/|w| (jnp;
    identity for |w| = 0)."""
    n = jnp.sqrt(jnp.sum(w * w))
    safe = jnp.maximum(n, 1e-20)
    ux, uy, uz = w[0] / safe, w[1] / safe, w[2] / safe
    c, s = jnp.cos(n), jnp.sin(n)
    omc = 1 - c
    R = jnp.stack([
        jnp.stack([c + ux * ux * omc, ux * uy * omc - uz * s,
                   ux * uz * omc + uy * s]),
        jnp.stack([uy * ux * omc + uz * s, c + uy * uy * omc,
                   uy * uz * omc - ux * s]),
        jnp.stack([uz * ux * omc - uy * s, uz * uy * omc + ux * s,
                   c + uz * uz * omc]),
    ])
    return jnp.where(n > 0, R, jnp.eye(3, dtype=w.dtype))


@partial(jax.jit, static_argnames=("grid", "cfg"))
def tectonics_step_stacked(stack: PlateStack, grid: Grid,
                           cfg: TectonicsConfig = TectonicsConfig()):
    """One full tectonics step, fully jitted (rotations advance as traced
    state).  Returns (stack, terrain).  Same passes and numerics as
    :func:`tectonics_step`."""
    P = stack.n_plates
    rot = stack.rotations @ jax.vmap(_axis_angle_jnp)(stack.angvel)

    fields = [stack.fields[i] for i in range(P)]
    rotations = [rot[i] for i in range(P)]
    angvels = [stack.angvel[i] for i in range(P)]

    world = _fold_impl(fields, rotations, grid)
    world = ocean_spreading(world, grid)
    coll = _collision_impl(world, angvels, grid)
    terrain = render_terrain(world, coll, grid, cfg)
    new_fields = _unfold_impl(world, fields, rotations, grid)
    return PlateStack(fields=jnp.stack(new_fields), rotations=rot,
                      angvel=stack.angvel), terrain


@partial(jax.jit, static_argnames=("grid", "cfg"))
def tectonic_uplift(stack: PlateStack, grid: Grid,
                    cfg: TectonicsConfig = TectonicsConfig()):
    """Collision-driven orogeny uplift field for live erosion forcing
    (the distance-falloff term of render_terrain's intent mode), scaled to
    the stream-power convention U = h/50 (cpufilter.cpp:42-64).

    Advances the stack one step; returns (stack, uplift)."""
    P = stack.n_plates
    rot = stack.rotations @ jax.vmap(_axis_angle_jnp)(stack.angvel)
    fields = [stack.fields[i] for i in range(P)]
    rotations = [rot[i] for i in range(P)]
    angvels = [stack.angvel[i] for i in range(P)]

    world = _fold_impl(fields, rotations, grid)
    world = ocean_spreading(world, grid)
    coll = _collision_impl(world, angvels, grid)
    dist = coll[..., 0]
    uplift = jnp.where(dist < 1e6,
                       jnp.maximum(0.0, 1.0 - dist / cfg.uplift_range), 0.0)
    new_fields = _unfold_impl(world, fields, rotations, grid)
    return (PlateStack(fields=jnp.stack(new_fields), rotations=rot,
                       angvel=stack.angvel),
            cfg.uplift_scale * uplift / 50.0)
