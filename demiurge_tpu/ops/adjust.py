"""Instant height adjustments: offset and scale.

Reproduces src/menus (via SURVEY §2.3): OffsetMenu.cpp:21-37 adds a
selection-weighted constant; ScaleMenu.cpp:21-37 multiplies by a
selection-weighted factor.
"""

from __future__ import annotations

import jax.numpy as jnp


def offset(height, sel, value: float):
    """height + value * sel (OffsetMenu.cpp:21-37)."""
    return height + value * sel


def scale(height, sel, factor: float):
    """height * lerp(1, factor, sel) (ScaleMenu.cpp:21-37)."""
    return height * (1.0 + (factor - 1.0) * sel)
