#!/usr/bin/env python
"""Compaction-sort cost: argsort key widths and sort strategies, 4.2M rays.

The wavefront loop spends ~20% of frame time in jnp.argsort over the
coherence key. Candidates:
  a) shipping 20-bit i32 key argsort
  b) 16-bit key (octant3 + morton12 + dead1) argsort
  c) lax.sort_key_val on the same key
  d) single fused u32 sort: (key << 23) | slot  — sort values only,
     decode the permutation from the low bits (23 bits cover N < 8.4M;
     equal-key order is by slot, i.e. stable, same as argsort)

Usage: PYTHONPATH=/root/repo python tools/sweep_pt10.py [n_millions]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 4.2
    N = int(n_m * 1e6)
    rng = np.random.default_rng(0)
    key20 = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))
    key16 = jnp.asarray(rng.integers(0, 1 << 16, N, dtype=np.int32))
    payload = jnp.asarray(rng.standard_normal((N, 12)), jnp.float32)

    @jax.jit
    def a_argsort20(k, p):
        order = jnp.argsort(k)
        return p[order]

    @jax.jit
    def b_argsort16(k, p):
        order = jnp.argsort(k)
        return p[order]

    @jax.jit
    def c_keyval(k, p):
        _, order = jax.lax.sort_key_val(k, jnp.arange(k.shape[0], dtype=jnp.int32))
        return p[order]

    @jax.jit
    def d_fused(k, p):
        slot = jnp.arange(k.shape[0], dtype=jnp.uint32)
        fused = (k.astype(jnp.uint32) << 23) | slot
        s = jax.lax.sort(fused)
        order = (s & jnp.uint32((1 << 23) - 1)).astype(jnp.int32)
        return p[order]

    for name, fn, k in (
        ("argsort 20-bit", a_argsort20, key20),
        ("argsort 16-bit", b_argsort16, key16),
        ("sort_key_val 20-bit", c_keyval, key20),
        ("fused u32 (key9<<23|slot)", d_fused, key20 >> 11),
    ):
        out = fn(k, payload)
        sync(out)
        t0 = time.time()
        for _ in range(3):
            out = fn(k, payload)
        sync(out)
        dt = (time.time() - t0) / 3
        print(f"{name:28s}: {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
