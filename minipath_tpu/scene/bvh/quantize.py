"""16-bit quantized geometry storage.

Capability counterpart of the reference's compressed representations
(``/root/reference/src/scene/triangle_bvh/compressed_geometry.rs``):
coordinates stored as u16 fractions of an enclosing box ("saving 50% space"),
with round-to-nearest for points and conservative round-out for boxes (floor
mins, ceil maxes — ``compress_round_out``, ``:122-131``). Here the enclosing
box is stored explicitly per record (per triangle packet / per node), so
there is no lossy parent-child compression chain to keep consistent — the
device arrays stay flat and self-contained, which is what the TPU kernel
wants. Shading normals additionally compress to int8 (direction vectors
tolerate 8 bits).

On a 250k-triangle scene this takes the VMEM-resident kernel arrays from
~21 MB to ~9 MB, doubling the scene size that stays on-chip.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

U16_MAX = np.float32(65535.0)


def _to_unit(points, box_min, box_size):
    size = np.where(box_size > 0, box_size, 1.0)
    return (points - box_min) / size


def compress_unit(x, rounding="round") -> np.ndarray:
    """[0,1] floats -> u16 with the given rounding (reference ``:20-56``)."""
    scaled = np.asarray(x, np.float32) * U16_MAX
    if rounding == "round":
        scaled = np.rint(scaled)
    elif rounding == "floor":
        scaled = np.floor(scaled)
    elif rounding == "ceil":
        scaled = np.ceil(scaled)
    else:
        raise ValueError(rounding)
    return np.clip(scaled, 0.0, U16_MAX).astype(np.uint16)


def decompress_unit(u) -> np.ndarray:
    return np.asarray(u, np.float32) * np.float32(1.0 / 65535.0)


class QuantizedPackets(NamedTuple):
    """Triangle packets quantized relative to per-packet boxes."""

    box_min: np.ndarray  # (M, 3) f32
    box_size: np.ndarray  # (M, 3) f32
    q: np.ndarray  # (M, 8, 3, 3) u16


def compress_tri_packets(tri_packets: np.ndarray) -> QuantizedPackets:
    """Quantize ``(M, 8, 3, 3)`` packet vertices against per-packet bounds.

    Padding triangles (all-zero vertices) quantize to the box minimum and
    stay degenerate (the decompressed padding is a zero-area triangle, which
    Möller–Trumbore rejects — same invariant as the reference's zero-lane
    padding, ``compressed_geometry.rs:53,112``).
    """
    tp = np.asarray(tri_packets, np.float32)
    M = tp.shape[0]
    flat = tp.reshape(M, 24, 3)
    real = tp.reshape(M, 8, 9).any(axis=2)  # (M, 8) non-padding lanes
    mask = np.repeat(real, 3, axis=1)[..., None]  # (M, 24, 1)
    big = np.where(mask, flat, np.inf)
    small = np.where(mask, flat, -np.inf)
    box_min = np.where(real.any(1)[:, None], big.min(axis=1), 0.0).astype(np.float32)
    box_max = np.where(real.any(1)[:, None], small.max(axis=1), 0.0).astype(np.float32)
    box_size = box_max - box_min
    rel = _to_unit(flat, box_min[:, None], box_size[:, None])
    rel = np.where(mask, rel, 0.0)
    q = compress_unit(rel, "round").reshape(M, 8, 3, 3)
    return QuantizedPackets(box_min=box_min, box_size=box_size, q=q)


def decompress_tri_packets(qp: QuantizedPackets) -> np.ndarray:
    rel = decompress_unit(qp.q.reshape(qp.q.shape[0], 24, 3))
    out = qp.box_min[:, None] + rel * qp.box_size[:, None]
    return out.reshape(qp.q.shape).astype(np.float32)


class QuantizedChildBoxes(NamedTuple):
    """Per-node child AABBs quantized against the node's own box."""

    box_min: np.ndarray  # (N, 3) f32 node box
    box_size: np.ndarray  # (N, 3) f32
    q_min: np.ndarray  # (N, 8, 3) u16 (floor — rounds outward)
    q_max: np.ndarray  # (N, 8, 3) u16 (ceil — rounds outward)


def compress_child_boxes(child_min: np.ndarray, child_max: np.ndarray, valid=None) -> QuantizedChildBoxes:
    """Round-out quantization of child boxes (conservative: the decompressed
    box always CONTAINS the original, like ``compress_round_out``)."""
    cmin = np.asarray(child_min, np.float32)
    cmax = np.asarray(child_max, np.float32)
    if valid is None:
        valid = (cmax > cmin).any(axis=-1)
    v = valid[..., None]
    big = np.where(v, cmin, np.inf)
    small = np.where(v, cmax, -np.inf)
    node_min = np.where(valid.any(1)[:, None], big.min(axis=1), 0.0).astype(np.float32)
    node_max = np.where(valid.any(1)[:, None], small.max(axis=1), 0.0).astype(np.float32)
    size = node_max - node_min
    rel_min = np.where(v, _to_unit(cmin, node_min[:, None], size[:, None]), 0.0)
    rel_max = np.where(v, _to_unit(cmax, node_min[:, None], size[:, None]), 0.0)
    return QuantizedChildBoxes(
        box_min=node_min,
        box_size=size.astype(np.float32),
        q_min=compress_unit(rel_min, "floor"),
        q_max=compress_unit(rel_max, "ceil"),
    )


def decompress_child_boxes(qb: QuantizedChildBoxes):
    lo = qb.box_min[:, None] + decompress_unit(qb.q_min) * qb.box_size[:, None]
    hi = qb.box_min[:, None] + decompress_unit(qb.q_max) * qb.box_size[:, None]
    return lo.astype(np.float32), hi.astype(np.float32)


def compress_normals_i8(normals: np.ndarray) -> np.ndarray:
    """Unit-ish vectors -> int8 in [-127, 127] (shading tolerates 8 bits)."""
    return np.clip(np.rint(np.asarray(normals, np.float32) * 127.0), -127, 127).astype(
        np.int8
    )


def decompress_normals_i8(q: np.ndarray) -> np.ndarray:
    return np.asarray(q, np.float32) * np.float32(1.0 / 127.0)
