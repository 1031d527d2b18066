from . import (
    adjust,
    blend,
    blur,
    brush,
    deterrace,
    erosion,
    flow,
    morphological,
    noise,
    ocean,
    tectonics,
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
