"""minipath_tpu — a TPU-native tiled path tracer built on JAX/XLA/Pallas.

A brand-new implementation of the capabilities of ``bluecube/minipath`` (a
tiled, multithreaded, 8-wide-SIMD CPU ray tracer in Rust), re-architected for
TPU hardware:

* the per-pixel recursive integrator becomes vectorized *packet traversal*
  over SoA ray arrays (one scalar traversal stack per packet of coherent
  rays, dense rays-by-8 box/triangle tests on the VPU),
* the 8-ary SAH BVH is flattened into device-resident SoA arrays,
* the per-core tile scheduler becomes batched device dispatch (and
  ``shard_map`` over a device mesh for multi-chip),
* per-lane RNG is counter-based (threefry) instead of per-thread ``SmallRng``.

The public API mirrors the reference crate's re-exports
(``/root/reference/src/lib.rs:8-10``): ``render``, ``RenderProgress``,
``RenderSettings``, ``Camera``, ``Scene``, plus the ``geometry`` and ``scene``
modules.
"""

from minipath_tpu.camera import Camera, CameraSampler
from minipath_tpu.render import RenderProgress, RenderSettings, render
from minipath_tpu.scene import Scene
from minipath_tpu.scene.triangle_bvh import TriangleBvh
from minipath_tpu.screen_block import ScreenBlock

__all__ = [
    "Camera",
    "CameraSampler",
    "RenderProgress",
    "RenderSettings",
    "Scene",
    "ScreenBlock",
    "TriangleBvh",
    "render",
]

__version__ = "0.1.0"
