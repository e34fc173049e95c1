"""Tiny TPU sanity op — run before any real chip work to detect a wedged
relay (CLAUDE.md: a stuck tunnel hangs even a bare jitted matmul)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

t0 = time.time()
print("backend:", jax.default_backend(), "devices:", jax.devices(), flush=True)
x = jnp.ones((256, 256))
y = jax.jit(lambda a: (a @ a).sum())(x)
print("sanity value:", float(y), "elapsed:", round(time.time() - t0, 1), "s")
