"""The ``TriangleBvh`` renderable object.

Public surface mirrors the reference
(``/root/reference/src/scene/triangle_bvh/building.rs:28,83`` and
``printing.rs:11``): ``TriangleBvh.with_obj(path)``, ``TriangleBvh.build``,
``intersect``, ``get_bounding_box``, ``print_statistics``. The heavy lifting
lives in the host-side builder (``bvh/build.py``) and the device-side packet
traversal (``render/traversal.py``).
"""

from __future__ import annotations

import numpy as np

from minipath_tpu.geometry.aabb import AABB
from minipath_tpu.scene.bvh import links as L
from minipath_tpu.scene.bvh.build import BuildResult, BvhArrays, build_bvh
from minipath_tpu.scene.obj_loader import MeshData, load_obj


class TriangleBvh:
    """Host handle owning the flat BVH arrays of a triangle mesh."""

    def __init__(self, build_result: BuildResult):
        self._build = build_result
        self._device_arrays: BvhArrays | None = None
        self._pallas_scene = None
        self._quantized_scene = None
        self._pt_scene = None

    # -- constructors -----------------------------------------------------------

    @classmethod
    def with_obj(cls, path, use_native: bool | None = None, leaf_max: int | None = None) -> "TriangleBvh":
        """Load an OBJ file and build the BVH (``building.rs:28``).

        Uses the native C++ loader/builder when available (large scenes
        build orders of magnitude faster); ``use_native=False`` forces the
        pure-Python path.
        """
        from minipath_tpu.scene.bvh import native

        if use_native is None:
            use_native = native.is_available()
        if use_native and native.is_available():
            mesh = native.load_obj_native(path)
        else:
            mesh = load_obj(path)
        return cls.build(mesh, use_native=use_native, leaf_max=leaf_max)

    @classmethod
    def build(cls, mesh: MeshData, materials=None, use_native: bool | None = None, leaf_max: int | None = None) -> "TriangleBvh":
        from minipath_tpu.scene.bvh import native

        if use_native is None:
            use_native = False  # Python builder is the default reference
        kw = {} if leaf_max is None else {"leaf_max": leaf_max}
        if use_native and native.is_available():
            return cls(native.build_bvh_native(mesh, materials=materials, **kw))
        return cls(build_bvh(mesh, materials=materials, **kw))

    # -- data access ------------------------------------------------------------

    @property
    def arrays(self) -> BvhArrays:
        """Device (jax) arrays; transferred lazily and cached."""
        if self._device_arrays is None:
            self._device_arrays = self._build.as_device()
        return self._device_arrays

    @property
    def pallas_scene(self):
        """Kernel-layout scene arrays (lazy; see render/pallas_kernels.py).

        Automatic layout selection: the f32 layout when it fits the kernel's
        VMEM budget (~8% faster on a 250k-tri scene), else the 16-bit
        quantized layout (half the footprint — roughly twice the on-chip
        triangle capacity, the reference's compressed-geometry role), else
        the HBM-streamed quantized layout (triangles stay in HBM, leaves
        DMA'd on demand — scene size bounded only by device memory, the
        reference's render-anything-in-RAM property).
        """
        if self._pallas_scene is None:
            from minipath_tpu.render.pallas_kernels import (
                prepare_scene,
                prepare_scene_quantized,
            )

            try:
                self._pallas_scene = prepare_scene(self.arrays)
            except ValueError:
                try:
                    self._pallas_scene = self.quantized_scene
                except ValueError:
                    self._pallas_scene = prepare_scene_quantized(
                        self.host_arrays, hbm_tris=True
                    )
        return self._pallas_scene

    @property
    def pt_scene(self):
        """Lean path-tracing kernel layout (lazy): closest-hit only in-kernel,
        shading data via one HBM gather per ray — ~1.8x faster than the full
        kernel on compacted bounce packets (tools/sweep_pt7.py).

        Automatic layout selection mirrors ``pallas_scene``: the f32
        ``PTScene`` when it fits the kernel's VMEM budget, else the 16-bit
        quantized ``QPTScene`` (twice the on-chip capacity), else the
        HBM-streamed ``QPTScene`` (node table only in VMEM; scene size
        bounded by device memory). All three carry the full PT feature set
        (anyhit shadows, barycentrics, texcoords via ``shade_flat``) — one
        path, every feature, any scene that fits memory, like the
        reference's single traversal (``ray_bvh_intersection.rs:26-96``)."""
        if self._pt_scene is None:
            from minipath_tpu.render.pallas_kernels import (
                prepare_scene_pt,
                prepare_scene_qpt,
            )

            try:
                self._pt_scene = prepare_scene_pt(self.arrays)
            except ValueError:
                try:
                    self._pt_scene = prepare_scene_qpt(self.host_arrays)
                except ValueError:
                    self._pt_scene = prepare_scene_qpt(
                        self.host_arrays, hbm_tris=True
                    )
        return self._pt_scene

    @property
    def quantized_scene(self):
        """16-bit quantized kernel scene (explicit opt-in; see
        ``scene/bvh/quantize.py``)."""
        if self._quantized_scene is None:
            from minipath_tpu.render.pallas_kernels import prepare_scene_quantized

            self._quantized_scene = prepare_scene_quantized(self.host_arrays)
        return self._quantized_scene

    @property
    def host_arrays(self) -> BvhArrays:
        return self._build.arrays

    @property
    def build_result(self) -> BuildResult:
        return self._build

    @property
    def recommended_stack_size(self) -> int:
        return self._build.recommended_stack_size

    # -- Object protocol ----------------------------------------------------------

    def intersect(self, rays, t_max=np.inf):
        from minipath_tpu.render.traversal import intersect_bvh

        return intersect_bvh(
            self.arrays, rays, t_max=t_max, stack_size=self.recommended_stack_size
        )

    def get_bounding_box(self) -> AABB:
        return AABB(
            np.asarray(self._build.arrays.bbox_min),
            np.asarray(self._build.arrays.bbox_max),
        )

    # -- statistics (printing.rs:11-70) ---------------------------------------------

    def statistics(self) -> dict:
        b = self._build
        stats = {
            "triangles": b.triangle_count,
            "vertices": b.vertex_count,
            "inner_nodes": int(b.arrays.node_child_links.shape[0]),
            "triangle_packets": int(b.arrays.tri_packets.shape[0]),
            "max_depth": b.max_depth,
            "leaf_depth": str(b.leaf_depth),
            "inner_node_fill": str(b.inner_fill),
            "leaf_fill_triangles": str(b.leaf_fill),
        }
        return stats

    def print_statistics(self) -> None:
        for k, v in self.statistics().items():
            print(f"  {k}: {v}")
