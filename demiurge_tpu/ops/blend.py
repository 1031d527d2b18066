"""Blend modes and selection combination modes.

Reproduces reference src/filter/Filter.cpp:170-239 (filter blend modes; note
several modes ignore the selection weight, faithfully kept) and
src/select/selection.cpp:52-116 (selection combination modes).
"""

from __future__ import annotations

import jax.numpy as jnp

BLEND_MODES = ("replace", "add", "subtract", "multiply", "divide", "max", "min")
SELECTION_MODES = ("replace", "add", "subtract", "intersect")


def blend(old, new, selection, mode: str = "replace"):
    """filter::blendMode — Filter.cpp:172-206."""
    if mode == "replace":
        return old * (1 - selection) + new * selection
    if mode == "add":
        return old + selection * new
    if mode == "subtract":
        return jnp.maximum(old - new, 0)
    if mode == "multiply":
        return old * new
    if mode == "divide":
        return old / new
    if mode == "max":
        return jnp.maximum(old, new)
    if mode == "min":
        return jnp.minimum(old, new)
    raise ValueError(f"unknown blend mode {mode!r}")


def selection_mode(old, new, mode: str = "replace"):
    """selection::selection_mode — selection.cpp:52-77."""
    if mode == "replace":
        return new
    if mode == "add":
        return jnp.minimum(old + new, 1)
    if mode == "subtract":
        return jnp.maximum(old - new, 0)
    if mode == "intersect":
        return old * new
    raise ValueError(f"unknown selection mode {mode!r}")
