"""ctypes bindings for the native (C++) OBJ loader and BVH builder.

The shared library is compiled on demand from ``native/minipath_native.cpp``
with g++ and cached next to the source; everything degrades gracefully to
the pure-Python implementations if a toolchain is unavailable
(``is_available()`` gates call sites).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "minipath_native.cpp")
_LIB = os.path.join(_NATIVE_DIR, "build", "libminipath_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _MpBvh(ctypes.Structure):
    _fields_ = [
        ("node_links", ctypes.POINTER(ctypes.c_int32)),
        ("node_box_min", ctypes.POINTER(ctypes.c_float)),
        ("node_box_max", ctypes.POINTER(ctypes.c_float)),
        ("tri_packets", ctypes.POINTER(ctypes.c_float)),
        ("tri_vidx", ctypes.POINTER(ctypes.c_int32)),
        ("tri_flat", ctypes.POINTER(ctypes.c_uint8)),
        ("tri_material", ctypes.POINTER(ctypes.c_int32)),
        ("n_nodes", ctypes.c_int64),
        ("n_packets", ctypes.c_int64),
        ("root", ctypes.c_int32),
        ("max_depth", ctypes.c_int32),
        ("bbox_min", ctypes.c_float * 3),
        ("bbox_max", ctypes.c_float * 3),
    ]


class _MpMesh(ctypes.Structure):
    _fields_ = [
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("texcoords", ctypes.POINTER(ctypes.c_float)),
        ("tris", ctypes.POINTER(ctypes.c_int32)),
        ("n_verts", ctypes.c_int64),
        ("n_tris", ctypes.c_int64),
    ]


def _compile() -> str | None:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except Exception:
        return None
    return _LIB


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        path = _compile()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.mp_build_bvh.restype = ctypes.c_int
        lib.mp_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(_MpBvh),
        ]
        lib.mp_free_bvh.argtypes = [ctypes.POINTER(_MpBvh)]
        lib.mp_load_obj.restype = ctypes.c_int
        lib.mp_load_obj.argtypes = [ctypes.c_char_p, ctypes.POINTER(_MpMesh)]
        lib.mp_free_mesh.argtypes = [ctypes.POINTER(_MpMesh)]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def _as_np(ptr, shape, dtype):
    n = int(np.prod(shape))
    if n == 0:
        return np.zeros(shape, dtype)
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)
    return arr.reshape(shape)


def load_obj_native(path):
    """Native OBJ load; returns a MeshData or raises ObjOpenError."""
    from minipath_tpu.scene.obj_loader import MeshData, ObjOpenError

    lib = _load()
    assert lib is not None
    mesh = _MpMesh()
    rc = lib.mp_load_obj(os.fspath(path).encode(), ctypes.byref(mesh))
    if rc != 0:
        raise ObjOpenError(f"native OBJ load failed (code {rc}): {path}")
    try:
        V, T = int(mesh.n_verts), int(mesh.n_tris)
        out = MeshData(
            triangles=_as_np(mesh.tris, (T, 3), np.int32),
            positions=_as_np(mesh.positions, (V, 3), np.float32),
            normals=_as_np(mesh.normals, (V, 3), np.float32),
            texcoords=_as_np(mesh.texcoords, (V, 3), np.float32),
        )
    finally:
        lib.mp_free_mesh(ctypes.byref(mesh))
    return out


def build_bvh_native(mesh, materials=None, leaf_max: int = 56):
    """Native BVH build; returns a BuildResult interchangeable with the
    Python builder's output (same layout spec)."""
    from minipath_tpu.scene.bvh.build import BuildResult, BvhArrays

    lib = _load()
    assert lib is not None
    T = mesh.triangle_count
    positions = np.ascontiguousarray(mesh.positions, np.float32)
    tris = np.ascontiguousarray(mesh.triangles, np.int32)
    normals = (
        np.ascontiguousarray(mesh.normals, np.float32) if mesh.normals.size else None
    )
    mats = (
        np.ascontiguousarray(materials, np.int32) if materials is not None else None
    )

    def fptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if a is not None else None

    def iptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if a is not None else None

    out = _MpBvh()
    rc = lib.mp_build_bvh(
        fptr(positions),
        fptr(normals),
        mesh.vertex_count,
        iptr(tris),
        iptr(mats),
        T,
        leaf_max,
        ctypes.byref(out),
    )
    assert rc == 0
    try:
        N = max(int(out.n_nodes), 1)
        M = max(int(out.n_packets), 1)
        got_nodes = int(out.n_nodes) > 0
        got_packets = int(out.n_packets) > 0
        arrays = BvhArrays(
            node_child_box_min=(
                _as_np(out.node_box_min, (N, 8, 3), np.float32)
                if got_nodes
                else np.zeros((1, 8, 3), np.float32)
            ),
            node_child_box_max=(
                _as_np(out.node_box_max, (N, 8, 3), np.float32)
                if got_nodes
                else np.zeros((1, 8, 3), np.float32)
            ),
            node_child_links=(
                _as_np(out.node_links, (N, 8), np.int32)
                if got_nodes
                else np.full((1, 8), -8, np.int32)
            ),
            tri_packets=(
                _as_np(out.tri_packets, (M, 8, 9), np.float32).reshape(M, 8, 3, 3)
                if got_packets
                else np.zeros((1, 8, 3, 3), np.float32)
            ),
            tri_vidx=(
                _as_np(out.tri_vidx, (M * 8, 3), np.int32)
                if got_packets
                else np.zeros((8, 3), np.int32)
            ),
            tri_flat=(
                _as_np(out.tri_flat, (M * 8,), np.uint8).astype(bool)
                if got_packets
                else np.zeros(8, bool)
            ),
            tri_material=(
                _as_np(out.tri_material, (M * 8,), np.int32)
                if got_packets
                else np.zeros(8, np.int32)
            ),
            vert_normal=(
                mesh.normals.astype(np.float32)
                if mesh.normals.size
                else np.zeros((1, 3), np.float32)
            ),
            vert_uv=(
                mesh.texcoords.astype(np.float32)
                if mesh.texcoords.size
                else np.zeros((1, 3), np.float32)
            ),
            root=np.int32(out.root),
            # np.array with copy: np.asarray would VIEW the ctypes struct,
            # which mp_free_bvh zeroes in the finally block below.
            bbox_min=np.array(out.bbox_min, np.float32, copy=True),
            bbox_max=np.array(out.bbox_max, np.float32, copy=True),
        )
        # The C++ builder reports only max_depth; recover the full health
        # statistics (printing.rs:11-70 parity) by post-walking the arrays.
        from minipath_tpu.scene.bvh.build import compute_tree_stats

        walk_depth, leaf_depth, inner_fill, leaf_fill = compute_tree_stats(arrays)
        max_depth = max(int(out.max_depth), walk_depth)
        return BuildResult(
            arrays=arrays,
            triangle_count=T,
            vertex_count=mesh.vertex_count,
            max_depth=max_depth,
            leaf_depth=leaf_depth,
            inner_fill=inner_fill,
            leaf_fill=leaf_fill,
        )
    finally:
        lib.mp_free_bvh(ctypes.byref(out))
