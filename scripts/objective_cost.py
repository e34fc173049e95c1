"""Measure the on-chip cost of the alternative training objectives.

Throughput of the scanned train step (reference batch/k, steps_per_call 10)
for: the IWAE baseline, DReG (objective="iwae_dreg" — two complementary
stop-gradient forward passes assembled into one estimator), ELBO, free-bits
ELBO, and beta-warmup IWAE. model01 (MLP family; DReG's published target
workload) and model05 (flagship conv family). Run SOLO on the TPU:
`python scripts/objective_cost.py`.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def throughput(name: str, spc: int = 10, n_iters: int = 5,
               model_over: dict | None = None,
               train_over: dict | None = None):
    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.state import create_train_state, make_optimizer
    from vae_mdl_tpu.train.steps import make_multi_train_step

    cfg = experiment(name)
    ds = "synthetic:mnist" if cfg.model.image_shape[2] == 1 else "synthetic:svhn_cropped"
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset=ds),
        model=dataclasses.replace(cfg.model, **(model_over or {})),
        train=dataclasses.replace(cfg.train, **(train_over or {})),
    )
    b = cfg.data.batch_size
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    shape = cfg.model.image_shape
    state = create_train_state(model, cfg.train,
                               jnp.zeros((b,) + shape, jnp.float32),
                               cfg.model.n_samples)
    step = make_multi_train_step(model, cfg, tx, n_steps=spc)
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (spc, b) + shape, dtype=np.uint8))
    for _ in range(2):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    return n_iters * spc * b / (time.perf_counter() - t0)


def main():
    for name in ("model01", "model05"):
        base = throughput(name)
        print(f"{name} iwae baseline: {base:.0f} imgs/s")
        for label, m_over, t_over in (
            ("iwae_dreg", dict(objective="iwae_dreg"), {}),
            ("elbo", dict(objective="elbo"), {}),
            ("elbo+free_bits", dict(objective="elbo", free_bits=0.25), {}),
            ("iwae+beta_warmup", {}, dict(beta_warmup_steps=10_000)),
        ):
            t = throughput(name, model_over=m_over, train_over=t_over)
            print(f"{name} {label}: {t:.0f} imgs/s ({100 * (t / base - 1):+.1f}%)")


if __name__ == "__main__":
    main()
