"""Microbenchmark: VPU elementwise throughput by dtype in Pallas.

Measures sustained vector-op rate for the op mix the fused wavefront
kernel issues (add / compare / select; int16 max does not legalize in
Mosaic, so the int16 variant uses cmp+select).  Informs whether
narrowing score planes from int32 is worth anything on v5e.

Usage: python tools/vpu16.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, W = 64, 2304
STEPS = 4352
ITERS = 16


def build(dtype, mix):
    ops_per_iter = {"add": 1, "mix": 6, "mix16": 6}[mix]

    def kernel(x_ref, o_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[...] = x_ref[...]

        a = acc[...]
        b = x_ref[...]
        one = jnp.asarray(1, dtype)
        for k in range(ITERS):
            if mix == "add":
                a = a + b
            elif mix == "mix":
                a = a + b                      # 1
                a = jnp.maximum(a, b)          # 2
                a = jnp.where(a > b, a - b, a)  # 3,4,5
                a = a - one                    # 6
            else:                              # mix16: no maxsi
                a = a + b                      # 1
                a = jnp.where(a > b, a, b)     # 2,3
                a = jnp.where(a > b, a - b, a)  # 4,5,6
        acc[...] = a

        @pl.when(pl.program_id(0) == STEPS - 1)
        def _():
            o_ref[...] = acc[...]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((B, W), lambda d: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, W), lambda d: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, W), dtype),
            scratch_shapes=[pltpu.VMEM((B, W), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x)

    return fn, ops_per_iter


def main():
    cases = [
        (jnp.int32, "add"), (jnp.int32, "mix"),
        (jnp.int16, "add"), (jnp.int16, "mix16"),
        (jnp.float32, "add"), (jnp.float32, "mix"),
        (jnp.bfloat16, "add"), (jnp.bfloat16, "mix"),
        (jnp.int8, "add"),
    ]
    for dtype, mix in cases:
        name = f"{np.dtype(dtype).name:9s} {mix:6s}"
        try:
            x = jnp.asarray(np.random.randint(1, 50, (B, W)), dtype)
            fn, opi = build(dtype, mix)
            np.asarray(fn(x))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(fn(x))
                times.append(time.perf_counter() - t0)
            t = min(times)
            ops = B * W * STEPS * ITERS * opi
            print(f"{name} {t*1e3:8.2f} ms  {ops/t/1e12:6.2f} T op/s",
                  flush=True)
        except Exception as e:
            print(f"{name} FAILED: {str(e).splitlines()[0][:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
