"""Device-health calibration for benchmark artifacts.

The TPU behind the remote tunnel is shared infrastructure: its effective
VPU/Pallas throughput has been observed to drift ~7x between sessions
while MXU matmul stays at full speed (2026-08-18: the same binary that
recorded 2.38 s/frame on the criterion teapot measured 14.3 s two days
later). Every benchmark artifact embeds this module's probe so numbers
can be compared ACROSS artifacts: two runs with matching health figures
are comparable; a throughput change that tracks a health change is the
environment, not the code.

Four probes — two compute units, two tunnel legs:

* ``matmul``  — chained 8192x8192 bf16 matmuls (MXU; should sit near the
  chip's peak TFLOPs and be stable across sessions).
* ``vpu_chain`` — a register-resident min/max/mul ``fori_loop`` in a
  Pallas kernel (VPU; the op mix of the BVH slab test, the resource every
  traversal kernel is bound on).
* ``fetch_mb_s`` — device->host bandwidth on an 8 MB buffer. On the
  remote-tunnel runtime this is the resource that drifts the most
  (measured 7 MB/s and 1.5 MB/s within one hour on 2026-08-18, same
  binary — a 5x swing that dominates any frame-fetch-bound benchmark).
* ``roundtrip_ms`` — latency of one trivial dispatch + 4-byte fetch
  (the per-dispatch floor every batched renderer pays).

Timing methodology matters on this runtime: ``block_until_ready`` has
been observed to return before execution completes (independent repeated
calls "ran" at 4x the chip's peak), so each probe (a) chains every rep on
the previous rep's output and (b) is timed through an actual scalar FETCH
of the final result — the one operation the runtime cannot satisfy
without finishing the work.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _vpu_chain_kernel(x_ref, o_ref, *, iters: int):
    a = x_ref[...]
    b = a * 1.0009765625

    def body(_, acc):
        # the slab test's op mix: two muls, a min, a max, another mul
        t0 = acc * b
        t1 = a * acc
        return jnp.maximum(jnp.minimum(t0, t1), a * 0.5)

    o_ref[...] = jax.lax.fori_loop(0, iters, body, a)


def device_health(reps: int = 5) -> dict:
    """Measure MXU and VPU throughput on the default device.

    Returns a small dict suitable for embedding in a benchmark artifact.
    Costs a few seconds warm. Never raises: on any failure (e.g. a
    CPU-only test environment without Mosaic) the failing probe is
    reported as None.
    """
    dev = jax.devices()[0]
    out: dict = {"device": str(dev)}

    try:
        n = 8192
        a = jnp.full((n, n), 0.001, jnp.bfloat16)
        f = jax.jit(lambda m: jnp.tanh(m @ m))
        m = f(a)
        float(jnp.mean(m))  # compile + force completion via fetch
        t0 = time.perf_counter()
        m = a
        for _ in range(reps):
            m = f(m)
        _ = float(jnp.mean(m))  # fetch = the only trustworthy barrier
        dt = (time.perf_counter() - t0) / reps
        out["matmul_8k_bf16_tflops"] = round(2 * n**3 / dt / 1e12, 1)
    except Exception as e:  # pragma: no cover - defensive
        out["matmul_8k_bf16_tflops"] = None
        out["matmul_error"] = str(e)[:120]

    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        # 512*128*65536*5 = 21.5 Gop per call: ~22 ms at the v5e VPU's
        # ~1 Top/s peak, so launch overhead and the final fetch roundtrip
        # stay in the noise across `reps` chained calls.
        iters, shape = 65536, (512, 128)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 1.0, shape), jnp.float32
        )
        g = jax.jit(
            pl.pallas_call(
                functools.partial(_vpu_chain_kernel, iters=iters),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        float(jnp.mean(g(x)))  # compile + force completion via fetch
        t0 = time.perf_counter()
        y = x
        for _ in range(reps):
            y = g(y)
        _ = float(jnp.mean(y))
        dt = (time.perf_counter() - t0) / reps
        ops = shape[0] * shape[1] * iters * 5
        out["vpu_chain_gops"] = round(ops / dt / 1e9, 1)
    except Exception as e:  # pragma: no cover - defensive
        out["vpu_chain_gops"] = None
        out["vpu_error"] = str(e)[:120]

    try:
        nbytes = 8 << 20
        buf = jax.jit(lambda s: jnp.full((nbytes,), s, jnp.uint8))(
            jnp.uint8(7)
        )
        buf.block_until_ready()
        np.asarray(buf[:8])  # warm the fetch path
        t0 = time.perf_counter()
        host = np.asarray(buf)
        dt = time.perf_counter() - t0
        assert host[0] == 7
        out["fetch_mb_s"] = round(nbytes / dt / 1e6, 1)

        f = jax.jit(lambda x: x + 1)
        s = f(jnp.int32(0))
        int(s)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            s = int(f(jnp.int32(1)))
        dt = (time.perf_counter() - t0) / reps
        out["roundtrip_ms"] = round(dt * 1e3, 2)
    except Exception as e:  # pragma: no cover - defensive
        out["fetch_mb_s"] = None
        out["roundtrip_ms"] = None
        out["transfer_error"] = str(e)[:120]

    return out
