"""Scenes and renderable objects.

Mirrors the reference's ``scene`` module surface
(``/root/reference/src/scene/mod.rs``): a :class:`Scene` holds exactly one
renderable object. Objects implement the :class:`Object` protocol —
``intersect`` over batched rays plus ``get_bounding_box`` — the batched
TPU equivalent of the reference's per-ray ``Object`` trait.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol, runtime_checkable

from minipath_tpu.geometry.aabb import AABB


@runtime_checkable
class Object(Protocol):
    """Renderable object (batched equivalent of ``scene/mod.rs:7-10``)."""

    def intersect(self, rays, t_max):
        """Closest-hit intersection over a batch of rays.

        Returns a :class:`minipath_tpu.render.hit.HitRecords` SoA pytree.
        """
        ...

    def get_bounding_box(self) -> AABB: ...


@dataclass
class Scene:
    """A scene holding exactly one object (``scene/mod.rs:13-15``)."""

    object: "Object"
