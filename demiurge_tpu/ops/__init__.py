from . import (
    adjust,
    blend,
    blur,
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
