"""The Project session — the framework's equivalent of the reference's
Project execution engine + UI state (src/Project.{h,cpp}), as a Python API.

Holds the grid, terrain, selection, named layers, and undo/redo stacks;
dispatches operators; persists to a native checkpoint format.

Mapping to the reference:
- texture registry / scratch pads  -> plain jax.Arrays (functional ops)
- Project::apply fragment passes   -> the operators in demiurge_tpu.ops
- undo (zfp-compressed diff snapshots, UndoHistory.cpp:19-67,
  Texture.cpp:123-181)            -> zlib-compressed float32 diff snapshots
  (lossless; the reference's zfp is lossy at 1e-6 accuracy) applied as
  array adds, plus closure-based ReversibleHistory
- file_new/file_load/file_write (Project.cpp:45-115) -> new/load_heightmap/
  export_png (+ lossless .npz checkpoints, which the reference lacks)
"""

from __future__ import annotations

import dataclasses
import io
import zlib
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..native import snapc
from ..ops import adjust, blend, blur, erosion, flow, morphological, noise, \
    ocean, temperature, thermal
from ..select import selection as sel_tools


# ---------------------------------------------------------------------------
# undo history (UndoHistory.h:14-58)
# ---------------------------------------------------------------------------


class SnapshotHistory:
    """Diff-based undo entry: stores compressed (old - new); undo adds the
    diff, redo subtracts it (UndoHistory.cpp:19-67).

    Compression is the native fixed-accuracy codec (native/snapc — the
    framework's zfp analog) at the reference's accuracy 1e-6
    (Texture.cpp:132); pass ``accuracy=0`` for lossless."""

    def __init__(self, target: str, diff: np.ndarray, accuracy: float = 1e-6):
        self.target = target
        self._shape = diff.shape
        self._data = snapc.compress(np.asarray(diff, np.float32), accuracy)

    def diff(self) -> jnp.ndarray:
        return jnp.asarray(snapc.decompress(self._data, self._shape))

    def undo(self, project: "Project"):
        project._set_field(self.target,
                           project._get_field(self.target) + self.diff())

    def redo(self, project: "Project"):
        project._set_field(self.target,
                           project._get_field(self.target) - self.diff())

    @property
    def nbytes(self):
        return len(self._data)


class ReversibleHistory:
    """Closure pair (UndoHistory.h ReversibleHistory)."""

    def __init__(self, undo_fn: Callable, redo_fn: Callable):
        self._undo = undo_fn
        self._redo = redo_fn

    def undo(self, project):
        self._undo(project)

    def redo(self, project):
        self._redo(project)


class Layer:
    def __init__(self, name: str, data: jnp.ndarray):
        self.name = name
        self.data = data


class Project:
    """A terrain-editing session."""

    def __init__(self, width: int = 1000, height: int = 500,
                 coords=None, circumference: float = 42000.0):
        kw = {}
        if coords is not None:
            kw["coords"] = tuple(coords)
        self.grid = Grid(width=width, height=height,
                         circumference=circumference, **kw)
        self.file_new()

    # ---- state ------------------------------------------------------------

    def file_new(self):
        """terrain = 0, sel = 1, one base layer (Project.cpp:69-115)."""
        g = self.grid
        self.terrain = jnp.zeros(g.shape, jnp.float32)
        self.sel = jnp.ones(g.shape, jnp.float32)
        self.layers: Dict[int, Layer] = {}
        self._next_layer_id = 0
        self.undo_stack: List = []
        self.redo_stack: List = []
        self.add_layer("Layer 0", self.terrain)

    def _get_field(self, name: str):
        if name == "terrain":
            return self.terrain
        if name == "sel":
            return self.sel
        if name.startswith("layer:"):
            return self.layers[int(name[6:])].data
        raise KeyError(name)

    def _set_field(self, name: str, value):
        if name == "terrain":
            self.terrain = value
        elif name == "sel":
            self.sel = value
        elif name.startswith("layer:"):
            self.layers[int(name[6:])].data = value
        else:
            raise KeyError(name)

    # ---- undo/redo (Project.cpp:375-399) ----------------------------------

    def add_history(self, entry):
        self.undo_stack.append(entry)
        self.redo_stack.clear()

    def _snapshot(self, target: str, old, new):
        self.add_history(SnapshotHistory(target,
                                         np.asarray(old) - np.asarray(new)))

    def undo(self):
        if not self.undo_stack:
            return False
        e = self.undo_stack.pop()
        e.undo(self)
        self.redo_stack.append(e)
        return True

    def redo(self):
        if not self.redo_stack:
            return False
        e = self.redo_stack.pop()
        e.redo(self)
        self.undo_stack.append(e)
        return True

    def _apply_terrain(self, new):
        self._snapshot("terrain", self.terrain, new)
        self.terrain = new

    def _apply_sel(self, new):
        self._snapshot("sel", self.sel, new)
        self.sel = new

    # ---- layers (LayerWindow) ---------------------------------------------

    def add_layer(self, name: str, data=None) -> int:
        lid = self._next_layer_id
        self._next_layer_id += 1
        if data is None:
            data = jnp.zeros(self.grid.shape, jnp.float32)
        self.layers[lid] = Layer(name, data)
        return lid

    def remove_layer(self, lid: int):
        layer = self.layers.pop(lid)

        def _undo(p, lid=lid, layer=layer):
            p.layers[lid] = layer

        def _redo(p, lid=lid):
            p.layers.pop(lid)

        self.add_history(ReversibleHistory(_undo, _redo))

    # ---- operators ---------------------------------------------------------

    def gradient_noise(self, params: noise.NoiseParams,
                       blend_mode: str = "replace"):
        new = noise.gradient_noise(self.terrain, self.sel, self.grid, params,
                                   blend_mode)
        self._apply_terrain(new)

    def blur(self, radius: float):
        """Gaussian blur, blended by the *fractional* selection — the
        restoreUnselected weighted blend (Filter.cpp:51-68:
        ``fc = s*new + (1-s)*backup``), so soft-edged (blurred) selections
        feather the result instead of gating at sel>0."""
        full = blur.blur(self.terrain, self.grid, radius)
        new = self.sel * full + (1.0 - self.sel) * self.terrain
        self._apply_terrain(new)

    def offset(self, value: float):
        self._apply_terrain(adjust.offset(self.terrain, self.sel, value))

    def scale(self, factor: float):
        self._apply_terrain(adjust.scale(self.terrain, self.sel, factor))

    def thermal_erosion(self, steps: int = 1):
        h = self.terrain
        for _ in range(steps):
            h = thermal.thermal_erosion_step(h, self.grid)
        self._apply_terrain(h)

    def morphology(self, radius: float, op: str):
        self._apply_terrain(
            morphological.morphology(self.terrain, self.grid, radius, op))

    def flow_map(self, cfg: flow.FlowConfig = flow.FlowConfig()):
        """FlowFilter: overwrites terrain with the flow map (reference
        behavior); undoable."""
        fm = flow.flow_filter(self.terrain, self.sel, self.grid, cfg)
        self._apply_terrain(fm)

    def landscape_evolution(self, cfg: erosion.ErosionConfig =
                            erosion.ErosionConfig(), iterations=None):
        new = erosion.landscape_evolution(self.terrain, self.sel, self.grid,
                                          cfg, iterations=iterations)
        self._apply_terrain(new)

    def deterrace(self, **kw):
        from ..ops import deterrace as _dt
        self._apply_terrain(_dt.deterrace(self.terrain, self.grid, **kw))

    def ocean_currents(self, steps: int = 1,
                       cfg: ocean.OceanConfig = None):
        """Run the ocean-current solver against the current terrain
        (reference OceanCurrents filter).  Velocity persists on the session
        (``self.ocean_uv``) and feeds the VectorField appearance layer;
        returns (u, v)."""
        cfg = cfg or ocean.OceanConfig(jacobi_iters=1000)
        if getattr(self, "ocean_uv", None) is None:
            self.ocean_uv = ocean.init_ocean(self.grid)
        u, v = self.ocean_uv
        for _ in range(steps):
            u, v, _, _ = ocean.ocean_step(u, v, self.terrain, self.grid, cfg)
        self.ocean_uv = (u, v)
        return u, v

    def temperature_sim(self, substeps: int = 10, *,
                        write_terrain: bool = True):
        """Seasonal climate model (reference Temperature filter).  The
        reference swaps the terrain texture out and displays T in its place
        (Temperature.cpp:27-45); with ``write_terrain`` the terrain is
        (undoably) replaced by the temperature field, else it is only
        stored on ``self.temperature``."""
        T = getattr(self, "temperature", None)
        ti = getattr(self, "_temperature_i", 0.0)
        if T is None:
            T = temperature.init_temperature(self.grid)
        T, ti = temperature.temperature_step(T, self.terrain, ti, self.grid,
                                             substeps=substeps)
        self.temperature = T
        self._temperature_i = ti
        if write_terrain:
            self._apply_terrain(T)
        return T

    def tectonics(self, steps: int = 70, plates=None):
        """Plate tectonics (reference Tectonics filter): evolves the
        terrain through plate motion, collision orogeny and ocean
        spreading; undoable.  Plate state persists on ``self.plates`` so
        repeated runs continue the simulation."""
        from ..ops import tectonics as _tec

        cfg = _tec.TectonicsConfig(steps=steps)
        plates = plates if plates is not None else getattr(self, "plates", None)
        self.plates, new = _tec.run_tectonics(self.terrain, self.grid, cfg,
                                              plates=plates)
        self._apply_terrain(new)

    # ---- selection ----------------------------------------------------------

    def select_all(self):
        self._apply_sel(sel_tools.select_all(self.grid))

    def select_invert(self):
        self._apply_sel(sel_tools.invert(self.sel))

    def select_height(self, lower: float, upper: float, mode="replace"):
        cand = sel_tools.by_height(self.terrain, lower, upper)
        self._apply_sel(sel_tools.apply_selection(self.sel, cand, mode))

    def select_lasso(self, path, mode="replace"):
        self._apply_sel(sel_tools.lasso(self.sel, self.grid, path, mode))

    def select_grow(self, radius: float):
        self._apply_sel(sel_tools.grow(self.sel, self.grid, radius))

    def select_shrink(self, radius: float):
        self._apply_sel(sel_tools.shrink(self.sel, self.grid, radius))

    def select_border(self, radius: float):
        self._apply_sel(sel_tools.border(self.sel, self.grid, radius))

    def select_blur(self, radius: float):
        self._apply_sel(sel_tools.blur_selection(self.sel, self.grid, radius))

    # ---- brush --------------------------------------------------------------

    def brush_stroke(self, path, params=None):
        """Paint a stroke along ``path`` (list of (s,t) points)."""
        from ..ops.brush import BrushParams, BrushStroke

        params = params or BrushParams()
        stroke = BrushStroke(self.terrain, self.sel, self.grid, params)
        for prev, pos in zip(path[:-1], path[1:]):
            stroke.segment(pos, prev)
        new, _diff = stroke.finish()
        self._apply_terrain(new)

    # ---- io -----------------------------------------------------------------

    def load_heightmap(self, path: str, scale: float = 1.0,
                       offset: float = 0.0):
        """file_load (Project.cpp:45-54): image -> heightfield.
        Image row 0 (top) maps to the NORTH edge -> flip to our row-0-south."""
        from ..utils.png import read_png

        img = read_png(path)
        if img.ndim == 3:
            img = img[..., :3].mean(-1)
        img = img[::-1]
        assert img.shape == self.grid.shape, (img.shape, self.grid.shape)
        self._apply_terrain(jnp.asarray(img * scale + offset))

    def export_png(self, path: str, bitdepth: int = 16,
                   lo: Optional[float] = None, hi: Optional[float] = None):
        """file_write (Project.cpp:56-67) — the reference exports lossy
        8-bit; we default to 16-bit and support explicit range."""
        from ..utils.png import write_png

        arr = np.asarray(self.terrain)[::-1]
        lo = float(arr.min()) if lo is None else lo
        hi = float(arr.max()) if hi is None else hi
        norm = (arr - lo) / max(hi - lo, 1e-12)
        write_png(path, norm, bitdepth=bitdepth)

    def save(self, path: str):
        """Native lossless checkpoint (npz): terrain, sel, layers, grid."""
        layers = {f"layer_{lid}_{l.name}": np.asarray(l.data)
                  for lid, l in self.layers.items()}
        np.savez_compressed(
            path,
            terrain=np.asarray(self.terrain),
            sel=np.asarray(self.sel),
            coords=np.asarray(self.grid.coords),
            circumference=self.grid.circumference,
            **layers,
        )

    @classmethod
    def load(cls, path: str) -> "Project":
        z = np.load(path)
        H, W = z["terrain"].shape
        p = cls(width=W, height=H, coords=tuple(z["coords"]),
                circumference=float(z["circumference"]))
        p.terrain = jnp.asarray(z["terrain"])
        p.sel = jnp.asarray(z["sel"])
        p.layers = {}
        for k in z.files:
            if k.startswith("layer_"):
                _, lid, name = k.split("_", 2)
                p.layers[int(lid)] = Layer(name, jnp.asarray(z[k]))
        if p.layers:
            p._next_layer_id = max(p.layers) + 1
        return p

    # ---- rendering ----------------------------------------------------------

    def render(self, layers=None, projection: str = "equirectangular",
               out_w: int = 800, out_h: int = 400, uv=None, **canvas_kw):
        """Appearance chain + projection -> (out_h, out_w, 4) RGBA.

        ``uv`` feeds VectorField layers (defaults to the session's ocean
        velocity when present)."""
        from ..viz import CanvasParams, appearance, project_field

        if uv is None:
            uv = getattr(self, "ocean_uv", None)
        rgba = appearance.render(self.terrain, self.grid, layers, uv=uv)
        params = CanvasParams(projection=projection, **canvas_kw)
        chans = []
        for c in range(4):
            img, oob = project_field(rgba[..., c], params, self.grid,
                                     out_w, out_h)
            chans.append(img)
        out = jnp.stack(chans, -1)
        return jnp.where(oob[..., None], jnp.asarray([0.1, 0.1, 0.1, 1.0]),
                         out)
