"""Multi-device parallelism: device meshes and sharded frame rendering."""

from minipath_tpu.parallel.mesh import (
    make_device_mesh,
    render_frame_sum,
    render_frame_sum_sharded,
)

__all__ = [
    "make_device_mesh",
    "render_frame_sum",
    "render_frame_sum_sharded",
]
