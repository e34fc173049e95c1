"""Throughput scaling probes: biladder bf16 body, model05 batch scaling.

Run SOLO on the TPU: python scripts/scale_probe.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.config import DataConfig
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.state import create_train_state, make_optimizer
from vae_mdl_tpu.train.steps import make_multi_train_step
from vae_mdl_tpu.utils.flops import V5E_PEAK_FLOPS, train_step_flops


def probe(name, batch_size=None, dtype="float32", spc=5, n=3):
    cfg = experiment(name)
    shape = cfg.model.image_shape
    ds = ("synthetic:mnist" if shape[2] == 1
          else "synthetic:celeba" if shape[0] == 64
          else "synthetic:svhn_cropped")
    data = DataConfig(dataset=ds)
    if batch_size:
        data = dataclasses.replace(data, batch_size=batch_size)
    cfg = dataclasses.replace(
        cfg, data=data,
        model=dataclasses.replace(cfg.model, compute_dtype=dtype))
    bs = cfg.data.batch_size
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x0 = jnp.zeros((bs,) + shape, jnp.float32)
    state = create_train_state(model, cfg.train, x0, cfg.model.n_samples)
    step = make_multi_train_step(model, cfg, tx, n_steps=spc)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 256, (spc, bs) + shape, dtype=np.uint8))
    for _ in range(2):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    ips = n * spc * bs / dt
    mfu = ips * train_step_flops(cfg.model, 1) / V5E_PEAK_FLOPS
    print(f"{name:18s} bs={bs:4d} {dtype:9s}: {ips:9.1f} imgs/s  mfu={mfu:.3f}",
          flush=True)


def main():
    print(f"devices: {jax.devices()}")
    probe("biladder_celeba", dtype="float32")
    probe("biladder_celeba", dtype="bfloat16")
    probe("model05", batch_size=512, dtype="float32")
    probe("model05", batch_size=512, dtype="bfloat16")
    probe("biladder_celeba", batch_size=256, dtype="bfloat16")


if __name__ == "__main__":
    main()
