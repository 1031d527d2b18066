"""demiurge_tpu — a TPU-native spherical terrain simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Kuhlwein/Demiurge (an OpenGL/GLSL planet-scale heightfield editor): spherical
raster editing (noise, blur, brushes, selections), physical simulation
(fluvial erosion with flow routing and lakes, thermal erosion, plate
tectonics, shallow-water ocean currents, seasonal climate), cartographic
projections and appearance rendering — all as pure, jittable operators over
domain-decomposable lat-lon grids with dateline/pole topology handled
first-class.
"""

from .core import Grid, State, new_state

__version__ = "0.1.0"
__all__ = ["Grid", "State", "new_state", "__version__"]
