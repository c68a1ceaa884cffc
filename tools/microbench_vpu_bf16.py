#!/usr/bin/env python
"""Does the VPU run packed bf16 elementwise ops faster than f32?

The lean PT kernel is vector-bound on slab-test min/max/mul chains
(pallas_kernels.py section comment). If the VPU retires bf16 at 2x f32
rate, a conservative bf16 box layout would halve the deep-bounce trace
cost; if bf16 runs at f32 rate (unpacked in the ALU), the idea is dead on
arrival. This measures a pure register-resident min/max/mul chain at both
dtypes — the slab test's op mix — isolated from memory traffic.

Usage: PYTHONPATH=/root/repo python tools/microbench_vpu_bf16.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain_kernel(x_ref, o_ref, *, iters: int):
    a = x_ref[...]
    b = a * 1.0009765625  # exactly representable in bf16
    acc = a
    for _ in range(iters):
        # the slab test's op mix: two muls, a min, a max per round
        t0 = acc * b
        t1 = a * acc
        acc = jnp.maximum(jnp.minimum(t0, t1), a * 0.5)
    o_ref[...] = acc


def run(dtype, shape=(256, 128), iters=256, reps=200):
    x = jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.0, shape), dtype)
    f = pl.pallas_call(
        functools.partial(_chain_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    f(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    ops = shape[0] * shape[1] * iters * 5  # 3 mul + min + max
    print(
        f"{jnp.dtype(dtype).name:9s}: {dt*1e6:8.1f} us/call  "
        f"{ops/dt/1e9:8.1f} Gop/s"
    )
    return dt


def main():
    print(f"devices: {jax.devices()}")
    t_f32 = run(jnp.float32)
    t_bf16 = run(jnp.bfloat16)
    print(f"bf16 speedup over f32: {t_f32/t_bf16:.2f}x")


if __name__ == "__main__":
    main()
