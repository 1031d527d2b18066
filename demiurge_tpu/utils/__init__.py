from . import png, progress
from .progress import Cancelled, Progress

__all__ = ["png", "progress", "Progress", "Cancelled"]
