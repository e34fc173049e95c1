"""Decompose model05 eval chunk time: decoder forward vs MoDL log-prob.

Run SOLO on the TPU: python scripts/eval_profile.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.config import DataConfig
from vae_mdl_tpu.models.vae import build_model, prior_for
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.models.objective import log_weights
from vae_mdl_tpu.train.state import create_train_state


def bench(fn, *args, n=3, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1000:9.1f} ms", flush=True)
    return dt


def main():
    B, K = 100, 100
    cfg = experiment("model05")
    cfg = dataclasses.replace(cfg, data=DataConfig(dataset="synthetic:svhn_cropped"))
    for dtype in ("float32", "bfloat16"):
        mcfg = dataclasses.replace(cfg.model, compute_dtype=dtype)
        model = build_model(mcfg)
        x0 = jnp.zeros((B, 32, 32, 3), jnp.float32)
        state = create_train_state(model, cfg.train, x0, 5)
        params = state.params
        prior = prior_for(mcfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 256, (B, 32, 32, 3), np.uint8)) / np.float32(255)
        key = jax.random.PRNGKey(0)

        @jax.jit
        def fwd_only(params, x, key):
            Qs, Ps, pxz = model.apply(params, x, K, rngs={"sample": key})
            # touch the MoDL parameter tensor only (sum) — no log_prob
            return jnp.sum(pxz.dist.parameters.astype(jnp.float32))

        @jax.jit
        def full_chunk(params, x, key):
            Qs, Ps, pxz = model.apply(params, x, K, rngs={"sample": key})
            return log_weights(prior, Qs, Ps, pxz, x)

        @jax.jit
        def logprob_only(parameters, x):
            from vae_mdl_tpu.distributions import MixtureDiscretizedLogistic

            d = MixtureDiscretizedLogistic(parameters=parameters)
            return d.reduced_log_prob(x)

        print(f"--- dtype={dtype}  [K={K}, B={B}]")
        t_fwd = bench(fwd_only, params, x, key, label="decoder fwd only (sum params)")
        t_full = bench(full_chunk, params, x, key, label="full chunk (fwd + log_w)")

        @jax.jit
        def get_params_tensor(params, x, key):
            Qs, Ps, pxz = model.apply(params, x, K, rngs={"sample": key})
            return pxz.dist.parameters

        ptensor = jax.block_until_ready(get_params_tensor(params, x, key))
        print(f"param tensor: {ptensor.shape} {ptensor.dtype}")
        bench(logprob_only, ptensor, x, label="MoDL log_prob only (pre-mat params)")
        print(f"log_w overhead vs fwd: {(t_full-t_fwd)*1000:.1f} ms")


if __name__ == "__main__":
    main()
