"""Measure the cost of the gradient stability kit on the hot path.

One number each for model05's scanned train step (batch 128, k=5,
steps_per_call 10): baseline (both knobs off — the program is bit-identical
to the tuned hot path), grad_clip_norm=200, grad_skip_threshold=400, and
both. Run SOLO on the TPU: `python scripts/stability_overhead.py`.
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def throughput(grad_clip: float, grad_skip: float, spc: int = 10,
               n_iters: int = 5) -> float:
    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.state import create_train_state, make_optimizer
    from vae_mdl_tpu.train.steps import make_multi_train_step

    cfg = experiment("model05")
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:svhn_cropped"),
        train=dataclasses.replace(cfg.train, grad_clip_norm=grad_clip,
                                  grad_skip_threshold=grad_skip),
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
    base = throughput(0.0, 0.0)
    print(f"baseline (no clip/skip): {base:.0f} imgs/s")
    for clip, skip, label in ((200.0, 0.0, "clip=200"),
                              (0.0, 400.0, "skip=400"),
                              (200.0, 400.0, "clip+skip")):
        t = throughput(clip, skip)
        print(f"{label}: {t:.0f} imgs/s ({100 * (t / base - 1):+.1f}%)")


if __name__ == "__main__":
    main()
