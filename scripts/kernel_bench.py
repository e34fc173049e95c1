"""Benchmark the layout-free MoDL Pallas kernel vs XLA fusion on TPU.

Run SOLO: python scripts/kernel_bench.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.distributions.mixture import mixture_log_prob
from vae_mdl_tpu.ops.pallas.mdl_kernel import mdl_log_prob


def bench(fn, x, p, n=5, label=""):
    out = fn(x, p)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n):
        # vary the input so no layer can cache; fetch a scalar each
        # iteration to force a full host round-trip
        out = fn(x + jnp.float32(i + 1) * 1e-7, p)
        acc += float(out[0][0]) if out.ndim > 1 else float(out[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt*1000:9.2f} ms   (acc {acc:.3f})", flush=True)
    return dt, fn(x, p)


def main():
    K, B, n_mix = 100, 100, 5
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(size=(K, B, 32, 32, 10 * n_mix)).astype(np.float32))
    # binned pixels like real data
    x01 = jnp.asarray(
        rng.integers(0, 256, (B, 32, 32, 3)).astype(np.float32) / 255.0
    )

    jnp_fn = jax.jit(lambda x, p: jnp.sum(mixture_log_prob(x, p), axis=(-1, -2, -3)))
    pk_fn = jax.jit(lambda x, p: jnp.sum(mdl_log_prob(x, p), axis=(-1, -2, -3)))

    t_jnp, o_jnp = bench(jnp_fn, x01, params, label="jnp/XLA fused log_prob")
    t_pk, o_pk = bench(pk_fn, x01, params, label="pallas layout-free log_prob")
    err = float(jnp.max(jnp.abs(o_jnp - o_pk)))
    rel = err / float(jnp.max(jnp.abs(o_jnp)))
    gb = params.size * 4 / 1e9
    print(f"max abs diff {err:.3e} (rel {rel:.2e})")
    print(f"speedup {t_jnp/t_pk:.2f}x; kernel effective BW "
          f"{gb/t_pk:.0f} GB/s over {gb:.1f} GB params")


if __name__ == "__main__":
    main()
