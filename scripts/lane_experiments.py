"""Lane-alignment experiments (VERDICT r2 weak #1 / next-round #2).

Two tile-hostile channel counts were never measured in round 2:

  (a) the MoDL head conv emits n_mix*10 = 50 channels (models/zoo.py MODEL05)
      — misaligned to the 128-lane / 8-sublane v5e tiles. Experiment: emit a
      padded head (64 / 128) and slice to 50 (``DecoderConfig.head_pad``).
  (b) model04's decoder base is 63 channels (reference model04.py:60, kept
      as a cited parity quirk). Experiment: 63 -> 64.

MFU is computed against the UNPADDED config's analytic FLOPs — the pad does
extra work, only the useful work counts. Run SOLO on the TPU:

    python scripts/lane_experiments.py
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.config import DataConfig
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.state import create_train_state, make_optimizer
from vae_mdl_tpu.train.steps import make_multi_train_step
from vae_mdl_tpu.utils.flops import V5E_PEAK_FLOPS, train_step_flops


def measure_train(cfg, spc=10, n_iters=5):
    shape = cfg.model.image_shape
    batch_size = cfg.data.batch_size
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((batch_size,) + shape, jnp.float32)
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    step = make_multi_train_step(model, cfg, tx, n_steps=spc)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 256, (spc, batch_size) + shape, dtype=np.uint8))
    for _ in range(2):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    return n_iters * spc * batch_size / (time.perf_counter() - t0)


def with_data(cfg, ds="synthetic:svhn_cropped"):
    return dataclasses.replace(cfg, data=DataConfig(dataset=ds))


def main():
    out = {}

    # ---- (a) model05 MoDL head pad sweep, f32 and bf16 bodies ----
    base05 = with_data(experiment("model05"))
    useful_flops = train_step_flops(base05.model, base05.data.batch_size)
    for dtype in ("float32", "bfloat16"):
        for pad in (0, 64, 128):
            cfg = dataclasses.replace(
                base05,
                model=dataclasses.replace(
                    base05.model,
                    compute_dtype=dtype,
                    decoder=dataclasses.replace(base05.model.decoder,
                                                head_pad=pad),
                ),
            )
            imgs = measure_train(cfg)
            mfu = imgs * (useful_flops / base05.data.batch_size) / V5E_PEAK_FLOPS
            key = f"model05_{dtype[:4]}_pad{pad or 50}"
            out[key] = {"imgs_per_sec": round(imgs, 1), "mfu": round(mfu, 4)}
            print(key, out[key], flush=True)

    # ---- (b) model04 base 63 -> 64 ----
    base04 = with_data(experiment("model04"))
    useful04 = train_step_flops(base04.model, base04.data.batch_size)
    for nbase in (63, 64):
        cfg = dataclasses.replace(
            base04,
            model=dataclasses.replace(
                base04.model,
                decoder=dataclasses.replace(
                    base04.model.decoder,
                    base_size=(8, 8, nbase),
                ),
            ),
        )
        imgs = measure_train(cfg, spc=5, n_iters=4)
        mfu = imgs * (useful04 / base04.data.batch_size) / V5E_PEAK_FLOPS
        key = f"model04_base{nbase}"
        out[key] = {"imgs_per_sec": round(imgs, 1), "mfu": round(mfu, 4)}
        print(key, out[key], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
