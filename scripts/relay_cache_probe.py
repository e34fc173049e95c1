"""Check whether repeated IDENTICAL executions return faster than varied
ones on this backend (execution-result caching in the relay would break
any timing harness that reuses its inputs). Run SOLO on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

print("default_backend:", jax.default_backend())
print("device platform:", jax.devices()[0].platform)


@jax.jit
def heavy(x):
    def body(i, v):
        return jnp.tanh(v @ w)
    w = x[:1024, :1024]
    return jax.lax.fori_loop(0, 200, body, x[:1024, :1024]).sum()


x = jnp.asarray(np.random.default_rng(0).standard_normal((1024, 1024)),
                jnp.float32)
jax.block_until_ready(heavy(x))

for label, vary in (("identical-input", False), ("varied-input", True)):
    ts = []
    for i in range(5):
        xi = x + jnp.float32(i + 1) if vary else x
        jax.block_until_ready(xi)
        t0 = time.perf_counter()
        jax.block_until_ready(heavy(xi))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label}: " + " ".join(f"{t:.2f}ms" for t in ts))
