"""Isolate the layout-free MDL kernel's cost: DMA-only vs +transpose vs full.

Run SOLO: python scripts/kernel_isolate.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=3, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*(a + jnp.float32(i + 1) * 0e-7 if a.dtype == jnp.float32 else a
                   for a in args))
        _ = float(np.asarray(out).ravel()[0])  # scalar fetch
    dt = (time.perf_counter() - t0) / n
    print(f"{label:28s} {dt*1000:9.2f} ms", flush=True)
    return dt


def make(kernel_body, k, p, bp, ch):
    grid = (k, p // bp)

    return pl.pallas_call(
        kernel_body,
        out_shape=jax.ShapeDtypeStruct((k, p // bp, 1, bp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bp, ch), lambda ik, ib: (ik, ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, bp), lambda ik, ib: (ik, ib, 0, 0),
                               memory_space=pltpu.VMEM),
    )


def dma_only(p_ref, out_ref):
    # touch every element, no transpose: reduce channels (lane axis)
    out_ref[:] = jnp.sum(p_ref[0], axis=-1).reshape(out_ref.shape)


def transpose_sum(p_ref, out_ref):
    pt = p_ref[0].T
    out_ref[:] = jnp.sum(pt, axis=0, keepdims=True).reshape(out_ref.shape)


def main():
    K, B, ch = 100, 100, 50
    p = B * 32 * 32
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(size=(K, p, ch)).astype(np.float32))
    for bp in (1024, 2048, 4096):
        f_dma = jax.jit(lambda a, _f=make(dma_only, K, p, bp, ch): jnp.sum(_f(a)))
        f_tr = jax.jit(lambda a, _f=make(transpose_sum, K, p, bp, ch): jnp.sum(_f(a)))
        print(f"--- bp={bp}")
        t1 = timeit(f_dma, params, label="dma + lane-reduce")
        t2 = timeit(f_tr, params, label="transpose + sublane-reduce")
        gb = params.size * 4 / 1e9
        print(f"  BW: dma {gb/t1:.0f} GB/s, transpose {gb/t2:.0f} GB/s")


if __name__ == "__main__":
    main()
