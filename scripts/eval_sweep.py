"""Sweep model05 5000-IS eval throughput on the real TPU (VERDICT item #5).

Times make_batch_evaluator across (compute_dtype, batch_size, k_chunk).
Run SOLO on the chip: python scripts/eval_sweep.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.config import DataConfig
from vae_mdl_tpu.evaluation.harness import make_batch_evaluator
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.state import create_train_state


def main():
    n_samples = 5000
    cfg0 = experiment("model05")
    cfg0 = dataclasses.replace(cfg0, data=DataConfig(dataset="synthetic:svhn_cropped"))
    model_f32 = build_model(cfg0.model)
    x0 = jnp.zeros((16, 32, 32, 3), jnp.float32)
    state = create_train_state(model_f32, cfg0.train, x0, cfg0.model.n_samples)
    params = state.params

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")

    import itertools
    for dtype, pallas in (("bfloat16", True),):
        cfg = dataclasses.replace(
            cfg0, model=dataclasses.replace(cfg0.model, compute_dtype=dtype,
                                            use_pallas=pallas)
        )
        model = build_model(cfg.model)
        for bs in (100, 250, 500):
            batch = jnp.asarray(
                rng.integers(0, 256, (bs, 32, 32, 3), dtype=np.uint8)
            )
            for k_chunk in (100, 250):
                try:
                    ev = make_batch_evaluator(model, cfg, n_samples, k_chunk)
                    key = jax.random.PRNGKey(0)
                    llh = ev(params, batch, key)  # compile + warm
                    jax.block_until_ready(llh)
                    t0 = time.perf_counter()
                    llh = ev(params, batch, jax.random.PRNGKey(1))
                    jax.block_until_ready(llh)
                    dt = time.perf_counter() - t0
                    print(
                        f"dtype={dtype:9s} pallas={int(pallas)} bs={bs:4d} k_chunk={k_chunk:4d} "
                        f"-> {bs/dt:7.1f} imgs/s  ({dt:.2f}s/batch, "
                        f"llh[0]={float(llh[0]):.1f})",
                        flush=True,
                    )
                except Exception as e:  # OOM etc.
                    print(f"dtype={dtype} pallas={int(pallas)} bs={bs} k_chunk={k_chunk} FAILED: "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
