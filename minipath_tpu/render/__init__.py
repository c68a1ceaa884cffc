"""Render runtime: integrators, tile machinery, progress control."""

from minipath_tpu.render.machinery import (
    RenderProgress,
    RenderProgressSnapshot,
    RenderSettings,
    render,
)

__all__ = [
    "RenderProgress",
    "RenderProgressSnapshot",
    "RenderSettings",
    "render",
]
