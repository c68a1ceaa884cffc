"""Per-pixel stratified sample dimensions for the Monte-Carlo integrators.

The reference's estimator draws every random dimension iid uniform
(`camera.rs:176-191` film jitter, and the north-star path-tracing
extension's BSDF/light dimensions). Stratification replaces a dimension's
iid uniform with a jittered stratum: sample ``s`` of a pixel's ``spp``
samples draws from stratum ``perm(s)`` of an equal-measure partition of
``[0, 1)`` (1-D) or ``[0, 1)^2`` (2-D grid). With one sample per stratum
per pixel, the pixel mean is exactly unbiased (each stratum has the right
probability mass across the pixel's spp draws) and the variance never
exceeds iid sampling (stratification with proportional allocation removes
the between-strata variance term).

``perm`` is a per-pixel, per-dimension hashed cyclic shift: without it,
every dimension pair would pair stratum ``s`` with stratum ``s`` — the
joint samples would collapse onto a diagonal, which is worse than iid.
A cyclic shift is a bijection on ``[0, spp)``, so the per-pixel tiling
property is preserved, while different pixels / dimensions get
decorrelated stratum pairings — the classic "padded / shuffled jittered
sampling" construction.

The shift hash MUST mix in a per-render seed (callers fold one out of
the render key into ``pid``). With a seed-independent shift, the pairing
between two dimension GROUPS (say film-x and light-u) is one fixed
diagonal of their joint stratum lattice per pixel: the pixel's
expectation becomes the average over that diagonal's cells rather than
the full lattice — a frozen per-pixel bias for non-separable integrands
(toy check: spp=2, f(x,y)=xy estimates 5/16 or 3/16 against a true
4/16) that re-rendering cannot average away. Randomizing the shift per
render makes the pairing a uniformly random cyclic offset, whose
expectation over seeds covers every lattice cell equally — the classic
randomized-LHS unbiasedness argument — while each single render keeps
the full per-dimension tiling (variance benefit intact).

All helpers are shape-preserving and run on ``[0, 1)`` uniforms that the
caller already drew, so enabling stratification costs a handful of VPU
ops per dimension and zero extra PRNG traffic.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["grid_factor", "hash_shift", "render_seed", "strat1d", "strat2d"]

_GOLDEN = 0x9E3779B9  # Weyl increment, decorrelates dimension salts


def _hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Wang-style avalanche hash on uint32 lanes (device-friendly: shifts,
    xors, and multiplies only)."""
    x = x.astype(jnp.uint32)
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    x = x ^ (x >> 15)
    return x


def grid_factor(spp: int) -> tuple[int, int]:
    """Factor ``spp`` into the most-square ``(gx, gy)`` grid with
    ``gx * gy == spp`` and ``gx >= gy`` (prime spp degrades to an
    ``spp x 1`` Latin strip, which is still a valid stratification)."""
    gy = max(int(math.sqrt(spp)), 1)
    while spp % gy:
        gy -= 1
    return spp // gy, gy


def render_seed(key) -> jnp.ndarray:
    """Per-render i32 the caller XORs into ``pid`` before stratifying.

    Derived from the render's base PRNG key (BEFORE any per-chunk /
    per-device folds, so one stratum window shares one seed) — this is
    what re-randomizes the cross-dimension stratum pairings between
    renders; see the module docstring for why that is required for
    unbiasedness.
    """
    import jax

    return jax.random.bits(
        jax.random.fold_in(key, 0x51A7), (), jnp.uint32
    ).astype(jnp.int32)


def hash_shift(pid: jnp.ndarray, spp: int, salt: int) -> jnp.ndarray:
    """Per-pixel stratum shift for dimension ``salt``: i32 in [0, spp)."""
    h = _hash_u32(pid.astype(jnp.uint32) ^ jnp.uint32((salt * _GOLDEN) & 0xFFFFFFFF))
    return (h % jnp.uint32(spp)).astype(jnp.int32)


def strat1d(u, s, pid, spp: int, salt: int):
    """Map iid uniforms ``u`` in [0,1) to jittered strata of ``[0, 1)``.

    ``s`` is each lane's sample index within its pixel's ``spp`` samples,
    ``pid`` a per-pixel id (any value unique per pixel works), ``salt`` a
    static per-dimension tag.
    """
    j = (s + hash_shift(pid, spp, salt)) % spp
    return (j.astype(u.dtype) + u) * (1.0 / spp)


def strat2d(u1, u2, s, pid, spp: int, salt: int):
    """Jointly stratify a 2-D dimension pair on a ``gx x gy`` grid (better
    than two independent 1-D stratifications for 2-D integrands like area
    light points and hemisphere directions)."""
    gx, gy = grid_factor(spp)
    j = (s + hash_shift(pid, spp, salt)) % spp
    cx = (j % gx).astype(u1.dtype)
    cy = (j // gx).astype(u2.dtype)
    return (cx + u1) * (1.0 / gx), (cy + u2) * (1.0 / gy)
