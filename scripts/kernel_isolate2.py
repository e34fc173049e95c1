"""Probe channel-first layout: DMA BW + XLA transpose cost.

Run SOLO: python scripts/kernel_isolate2.py
"""
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
        out = fn(*args)
        _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{label:36s} {dt*1000:9.2f} ms", flush=True)
    return dt


def main():
    K, B, ch = 100, 100, 50
    P = B * 32 * 32
    rng = np.random.default_rng(0)
    # channel-first: [K, ch, P] — kernel rows are pixel-contiguous
    params_t = jnp.asarray(rng.normal(size=(K, ch, P)).astype(np.float32))
    params = jnp.asarray(rng.normal(size=(K, P, ch)).astype(np.float32))
    gb = params.size * 4 / 1e9

    for bp in (2048, 4096, 8192):
        def body(p_ref, out_ref):
            pt = p_ref[0]  # [ch, bp] — already channel-first
            out_ref[:] = jnp.sum(pt, axis=0, keepdims=True).reshape(out_ref.shape)

        f = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((K, P // bp, 1, bp), jnp.float32),
            grid=(K, P // bp),
            in_specs=[pl.BlockSpec((1, ch, bp), lambda ik, ib: (ik, 0, ib),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 1, bp), lambda ik, ib: (ik, ib, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        g = jax.jit(lambda a, _f=f: jnp.sum(_f(a)))
        t = timeit(g, params_t, label=f"channel-first dma+reduce bp={bp}")
        print(f"   BW {gb/t:.0f} GB/s")

    # XLA transpose [K, P, ch] -> [K, ch, P]
    tr = jax.jit(lambda a: jnp.sum(jnp.swapaxes(a, -1, -2), axis=(1, 2)))
    t = timeit(tr, params, label="XLA transpose(+reduce) NHWC->CF")
    print(f"   r+w BW {2*gb/t:.0f} GB/s")


if __name__ == "__main__":
    main()
