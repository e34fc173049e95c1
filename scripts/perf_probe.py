"""TPU perf probe: train-step and eval-harness throughput across variants.

Run solo on the TPU (one process may hold the chip):
    python scripts/perf_probe.py
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.config import DataConfig
from vae_mdl_tpu.evaluation.harness import make_batch_evaluator
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.state import create_train_state, make_optimizer
from vae_mdl_tpu.train.steps import make_train_step


def bench_train(name, *, bf16=False, pallas=False, batch=128, steps=50):
    cfg = experiment(name)
    # force the flag (None would AUTO-select the MoDL kernel on TPU,
    # defeating the A/B comparison)
    model_cfg = dataclasses.replace(cfg.model, use_pallas=pallas)
    if bf16:
        model_cfg = dataclasses.replace(model_cfg, compute_dtype="bfloat16")
    cfg = dataclasses.replace(
        cfg, model=model_cfg, data=DataConfig(dataset="synthetic:svhn_cropped")
    )
    h, w, c = cfg.model.image_shape
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_train_state(model, cfg.train, jnp.zeros((batch, h, w, c)),
                               cfg.model.n_samples)
    step = make_train_step(model, cfg, tx)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, h, w, c), dtype=np.uint8))
    for _ in range(3):
        state, m = step(state, x)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    ips = steps * batch / dt
    tag = f"{name} train bf16={int(bf16)} pallas={int(pallas)}"
    print(f"{tag:45s} {ips:10.0f} imgs/s   ({1000*dt/steps:.2f} ms/step)")
    return ips


def bench_eval(name, *, pallas=False, n_samples=5000, k_chunk=250, batch=50,
               reps=3):
    cfg = experiment(name)
    model_cfg = dataclasses.replace(cfg.model, use_pallas=pallas)  # force, no auto
    cfg = dataclasses.replace(
        cfg, model=model_cfg,
        data=DataConfig(dataset="synthetic:svhn_cropped",
                        dynamic_binarization=(name == "model01")),
    )
    h, w, c = cfg.model.image_shape
    model = build_model(cfg.model)
    x = jnp.zeros((batch, h, w, c))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    ev = make_batch_evaluator(model, cfg, n_samples=n_samples, k_chunk=k_chunk)
    xb = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, h, w, c), dtype=np.uint8))
    llh = ev(params, xb, jax.random.PRNGKey(0))
    jax.block_until_ready(llh)
    t0 = time.perf_counter()
    for i in range(reps):
        llh = ev(params, xb, jax.random.PRNGKey(i))
    jax.block_until_ready(llh)
    dt = time.perf_counter() - t0
    ips = reps * batch / dt
    tag = f"{name} {n_samples}-IS eval pallas={int(pallas)} kc={k_chunk}"
    print(f"{tag:45s} {ips:10.2f} imgs/s   (10k imgs in {10000/ips/60:.1f} min)")
    return ips


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    bench_train("model05")
    bench_train("model05", bf16=True)
    bench_train("model05", pallas=True)
    bench_train("model05", bf16=True, pallas=True)
    bench_train("model01")
    bench_train("model01", bf16=True)
    bench_eval("model01", n_samples=5000, k_chunk=500, batch=100)
    bench_eval("model05", n_samples=5000, k_chunk=100, batch=25)
    bench_eval("model05", n_samples=5000, k_chunk=100, batch=25, pallas=True)
