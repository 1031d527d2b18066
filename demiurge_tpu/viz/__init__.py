from . import appearance, projections
from .appearance import render, to_png
from .projections import CanvasParams, PROJECTIONS, project_field

__all__ = [
    "appearance",
    "projections",
    "render",
    "to_png",
    "CanvasParams",
    "PROJECTIONS",
    "project_field",
]
