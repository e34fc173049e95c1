"""Benchmark: training throughput (imgs/sec) of the flagship model.

Runs model05 (conv VAE + mixture-of-discretized-logistics likelihood, the
hottest compute path, /root/reference/models/model05.py) with the reference
hyperparameters — batch 128, k=5 importance samples — on whatever devices
are visible, and prints ONE JSON line.

``vs_baseline``: the reference publishes no throughput numbers
(SURVEY.md §6). We anchor on a measured TF2 single-GPU figure being
unavailable in this zero-egress image; the target in BASELINE.json is >=5x a
TF2-GPU baseline on v5e-8, i.e. >=0.625x per chip. We report
``vs_baseline = imgs_per_sec / PER_CHIP_TARGET`` with PER_CHIP_TARGET the
estimated TF2-GPU throughput for this model (~1000 imgs/s on a V100-class
GPU; conv VAE at 32x32, ~1M params), so vs_baseline > 1 means faster than
the estimated reference throughput on one device.
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PER_CHIP_TARGET = 1000.0  # estimated TF2-GPU imgs/sec for model05 (see docstring)


def main():
    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.state import create_train_state, make_optimizer
    from vae_mdl_tpu.train.steps import make_train_step

    from vae_mdl_tpu.train.steps import make_multi_train_step

    cfg = experiment("model05")
    cfg = dataclasses.replace(
        cfg, data=DataConfig(dataset="synthetic:svhn_cropped")
    )
    batch_size = cfg.data.batch_size  # 128, reference parity
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)

    x_f32 = jnp.zeros((batch_size, 32, 32, 3), jnp.float32)
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)

    # sustained training throughput: 10 optimizer steps per dispatched
    # program (trainer's steps_per_call), hiding per-dispatch tunnel latency
    spc = 10
    train_step = make_multi_train_step(model, cfg, tx, n_steps=spc)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 256, (spc, batch_size, 32, 32, 3), dtype=np.uint8)
    )

    # warmup / compile
    for _ in range(2):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics["loss"])

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = n_iters * spc * batch_size / dt
    print(
        json.dumps(
            {
                "metric": "model05_train_throughput",
                "value": round(imgs_per_sec, 1),
                "unit": "imgs/sec",
                "vs_baseline": round(imgs_per_sec / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
