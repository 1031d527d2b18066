from . import (
    adjust,
    blend,
    blur,
    brush,
    erosion,
    flow,
    morphological,
    noise,
    ocean,
    temperature,
    thermal,
)

__all__ = [
    "adjust",
    "blend",
    "blur",
    "erosion",
    "flow",
    "morphological",
    "noise",
    "ocean",
    "temperature",
    "thermal",
]
