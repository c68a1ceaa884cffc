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

**Low-discrepancy mode (Owen-scrambled Sobol).** Passing a NEGATIVE
``spp`` to :func:`strat1d` / :func:`strat2d` selects the next rung up
from jittered strata: sample ``s`` of ``|spp|`` draws the ``s``-th point
of the 2-D Sobol (0,2)-sequence, Owen-scrambled per pixel and per
dimension pair with the hash-based nested scramble of Burley,
"Practical Hash-based Owen Scrambling" (JCGT 2020) — the padded-Sobol
construction production tracers use. The sign encoding exists so the
mode rides the ``strat_spp`` static argument through every existing
jit/chunk/shard code path unchanged; callers use
:func:`minipath_tpu.render.wavefront.render_frame_pt`'s ``sobol=`` flag
rather than the raw sign. Unbiasedness: the scramble seeds an additive
uint32 (from pid/salt/render-seed hashes) into a chain of bijections of
``[0, 2^32)``, so for a uniform seed every sample is EXACTLY uniform
marginally — the same randomized-QMC argument as the stratified path,
with the incoming iid uniforms simply unused. Within a pixel the |spp|
points are a scrambled Sobol prefix: strictly lower discrepancy than a
jittered grid, which is where the measured MSE gain comes from
(QUALITY.json ``sobol`` section).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

__all__ = [
    "grid_factor",
    "hash_shift",
    "render_seed",
    "sobol1d",
    "sobol2d",
    "strat1d",
    "strat2d",
]

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
    static per-dimension tag. ``spp < 0`` selects Owen-scrambled Sobol
    with ``|spp|`` samples (module docstring); ``u`` is then unused.
    """
    if spp < 0:
        return sobol1d(s, pid, salt).astype(u.dtype)
    j = (s + hash_shift(pid, spp, salt)) % spp
    return (j.astype(u.dtype) + u) * (1.0 / spp)


def strat2d(u1, u2, s, pid, spp: int, salt: int):
    """Jointly stratify a 2-D dimension pair on a ``gx x gy`` grid (better
    than two independent 1-D stratifications for 2-D integrands like area
    light points and hemisphere directions). ``spp < 0``: Owen-scrambled
    2-D Sobol instead (module docstring); ``u1``/``u2`` unused."""
    if spp < 0:
        x, y = sobol2d(s, pid, salt)
        return x.astype(u1.dtype), y.astype(u2.dtype)
    gx, gy = grid_factor(spp)
    j = (s + hash_shift(pid, spp, salt)) % spp
    cx = (j % gx).astype(u1.dtype)
    cy = (j // gx).astype(u2.dtype)
    return (cx + u1) * (1.0 / gx), (cy + u2) * (1.0 / gy)


# ---- Owen-scrambled Sobol (the spp < 0 mode) ---------------------------

# Direction numbers for the SECOND Sobol dimension (primitive polynomial
# x + 1): v_0 = 2^31, v_j = v_{j-1} ^ (v_{j-1} >> 1). The first dimension
# is the van der Corput radical inverse (bit reversal) and needs no table.
def _dim1_directions() -> np.ndarray:
    v, out = 0x80000000, []
    for _ in range(32):
        out.append(v)
        v ^= v >> 1
    return np.asarray(out, np.uint32)


_DIM1 = _dim1_directions()


def _reverse_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    return (x << 16) | (x >> 16)


def _laine_karras(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Hash-based nested-uniform permutation of ``[0, 2^32)`` in
    REVERSED-bit order (Laine & Karras 2011 as hashed by Burley 2020).
    Every step is a bijection; ``+ seed`` is where a uniform seed makes
    the output exactly uniform."""
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def _owen(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Owen-scramble a radical-inverse value: high bits may only permute
    as a function of the bits above them, which the reversed-domain hash
    provides."""
    return _reverse_bits(_laine_karras(_reverse_bits(x), seed))


def _sobol_pair(index: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The ``index``-th point of the 2-D Sobol sequence as uint32 pair."""
    i = index.astype(jnp.uint32)
    x = _reverse_bits(i)
    y = jnp.zeros_like(i)
    for bit in range(32):
        y = y ^ jnp.where(
            ((i >> bit) & 1) != 0, jnp.uint32(int(_DIM1[bit])), jnp.uint32(0)
        )
    return x, y


_U32_TO_UNIT = 1.0 / 16777216.0  # top 24 bits -> [0, 1)


def _to_unit(x: jnp.ndarray) -> jnp.ndarray:
    return (x >> 8).astype(jnp.float32) * _U32_TO_UNIT


def _dim_seed(pid: jnp.ndarray, salt: int, which: int) -> jnp.ndarray:
    return _hash_u32(
        pid.astype(jnp.uint32)
        ^ jnp.uint32(((salt * 2 + which) * _GOLDEN) & 0xFFFFFFFF)
    )


def sobol2d(s, pid, salt: int):
    """Owen-scrambled 2-D Sobol point for sample ``s`` of pixel ``pid`` in
    dimension pair ``salt`` — padded-Sobol: every (pid, salt) gets its own
    scramble, all ride the same index."""
    x, y = _sobol_pair(s)
    return (
        _to_unit(_owen(x, _dim_seed(pid, salt, 0))),
        _to_unit(_owen(y, _dim_seed(pid, salt, 1))),
    )


def sobol1d(s, pid, salt: int):
    """1-D Owen-scrambled radical inverse (Sobol dimension 0)."""
    x = _reverse_bits(s.astype(jnp.uint32))
    return _to_unit(_owen(x, _dim_seed(pid, salt, 0)))
