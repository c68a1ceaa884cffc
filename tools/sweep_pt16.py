"""Sweep 16: argsort+gather vs variadic lax.sort for the wavefront glue.

Both per-bounce reorders (the coherence compaction in ``_compact`` and the
NEE shadow-segment sort) used ``jnp.argsort(key)`` followed by per-row
gathers of the ray payload. XLA:TPU lowers the gathers to one ~3.4 ns/row
dynamic-slice loop each; carrying the payload THROUGH the sorting network
as extra ``lax.sort`` operands pays only the network's O(log^2 N) compare
-and-swap passes on data that is already streaming through VMEM.

Measured on the 4.15M-ray atrium wavefront shape (one v5e, 2026-08-17):

    shadow old (argsort+g6):          100.3 ms
    shadow new (varsort 8op):          57.2 ms
    compact old (argsort+g13+g1+g1):  228.3 ms
    compact new (varsort 15op):        84.4 ms

Also measured (probe_sort.log): plain argsort 40 ms stable / 55 ms
unstable, sort_key_val 38 ms unstable — the sort itself is NOT the cost,
the payload gathers are; and is_stable=True costs ~10% extra operands
bandwidth. Production (`render/wavefront.py`) uses the "new" forms with
is_stable=False.

Usage: run on the TPU (default platform), no arguments.
"""
import numpy as np, jax, jax.numpy as jnp, time
from jax import lax

N = 4_147_200
rng = np.random.default_rng(0)
key20 = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))
key28 = jnp.asarray(rng.integers(0, 1 << 28, N, dtype=np.int32))
vals6 = jnp.asarray(rng.standard_normal((N, 6), dtype=np.float32))
vals13 = jnp.asarray(rng.standard_normal((N, 13), dtype=np.float32))
pixel = jnp.arange(N, dtype=jnp.int32)


def sync(x):
    # axon quirk: block_until_ready() does not wait through the tunnel;
    # a host transfer does.
    return float(np.asarray(jnp.sum(jnp.asarray(x, jnp.float32))))


def bench(name, f, *a):
    g = jax.jit(f)
    sync(g(*a)); sync(g(*a))
    t0 = time.time(); sync(g(*a)); dt = (time.time() - t0) * 1e3
    print(f"{name}: {dt:.1f} ms", flush=True)


iota = jnp.arange(N, dtype=jnp.int32)


def shadow_new(k, v):
    outs = lax.sort([k, iota] + [v[:, i] for i in range(6)], is_stable=False)
    return sum(outs[2:]) + outs[1]


def shadow_old(k, v):
    order = jnp.argsort(k)
    p = v[order]
    return jnp.sum(p, -1) + order


def compact_new(k, v, px):
    outs = lax.sort([k] + [v[:, i] for i in range(13)] + [px], is_stable=False)
    return sum(outs[1:14]) + outs[14]


def compact_old(k, v, px):
    order = jnp.argsort(k)
    p = v[order]
    return jnp.sum(p, -1) + px[order] + (k[order] < (1 << 19))


if __name__ == "__main__":
    bench("shadow old (argsort+g6)", shadow_old, key28, vals6)
    bench("shadow new (varsort 8op)", shadow_new, key28, vals6)
    bench("compact old (argsort+g13+g1+g1)", compact_old, key20, vals13, pixel)
    bench("compact new (varsort 15op)", compact_new, key20, vals13, pixel)
