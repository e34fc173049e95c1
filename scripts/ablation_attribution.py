"""Differential ablation of the model05 train step — per-component time
attribution WITHOUT the profiler.

Rationale: isolated op microbenchmarks are non-predictive on XLA:TPU
(layout assignment is global, docs/design.md §7c), and `jax.profiler`
device traces wedge the axon tunnel in this environment. What remains
sound is measuring COMPOSED programs that differ by one component: each
variant keeps the full step structure (preprocess + k-sample forward +
IWAE bound + backward + Adam), so fusion and layout stay realistic, and
the timing difference attributes that component's marginal cost.

Variants:
  full          — the shipped model05 step (Pallas MoDL kernel on TPU)
  jnp_modl      — XLA-fused jnp likelihood instead of the Pallas kernel
  dl_head       — likelihood swapped to discretized-logistic. NOTE: the
                  zoo folds model05's 50-ch head conv into conv_specs, so
                  ConvDecoder keeps the FULL stack (incl. that conv) and
                  appends a small separate 6-ch head (decoders.py:215-219)
                  — the delta isolates the mixture MATH (log-prob fwd+bwd),
                  not the head conv (round-3 review fix: an earlier label
                  claimed the 50-ch conv was removed)
  fwd_only      — value only, no backward/optimizer (grad share)
  k1            — one importance sample instead of 5 (k-scaling share)

Run SOLO on the TPU: python scripts/ablation_attribution.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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

BATCH = 128
SPC = 10


def _cfg(**model_over):
    cfg = experiment("model05")
    cfg = dataclasses.replace(cfg, data=DataConfig(dataset="synthetic:svhn_cropped"))
    if model_over:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_over))
    return cfg


def time_step(step, state, batch, n_iters=5, n_repeats=4):
    """Median of repeated timed blocks, clock stopped by a VALUE FETCH of
    the last loss (block_until_ready does not reliably block on this
    relay — CLAUDE.md; the state chain makes the fetch fence every
    dispatch in the block)."""
    for _ in range(2):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    ts = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / (n_iters * SPC) * 1e3  # ms/step


def build(cfg):
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    step = make_multi_train_step(model, cfg, tx, n_steps=SPC, donate=False)
    return step, state


def fwd_only_step(cfg):
    """Scanned forward+loss only (no grad, no optimizer)."""
    from vae_mdl_tpu.models.objective import compute_loss
    from vae_mdl_tpu.models.vae import prior_for
    from vae_mdl_tpu.train.steps import preprocess

    model = build_model(cfg.model)
    prior = prior_for(cfg.model)
    k = cfg.model.n_samples

    def multi(state, batches):
        def body(s, batch):
            rngs = s.next_rngs("sample", "binarize")
            x = preprocess(cfg, batch, rngs["binarize"])
            Qs, Ps, pxz = model.apply(s.params, x, k,
                                      rngs={"sample": rngs["sample"]})
            loss, metrics = compute_loss(prior, Qs, Ps, pxz, x)
            return s.replace(step=s.step + 1), {"loss": loss}

        state, metrics = jax.lax.scan(body, state, batches)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return jax.jit(multi)


def main():
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 256, (SPC, BATCH, 32, 32, 3), dtype=np.uint8))
    out = {}

    variants = {
        "full": _cfg(),
        "jnp_modl": _cfg(use_pallas=False),
        "dl_head": _cfg(likelihood="dl"),
        "k1": _cfg(n_samples=1),
    }
    for name, cfg in variants.items():
        step, state = build(cfg)
        out[name] = round(time_step(step, state, batch), 3)
        print(name, out[name], "ms/step", flush=True)

    cfg = _cfg()
    step = fwd_only_step(cfg)
    _, state = build(cfg)
    out["fwd_only"] = round(time_step(step, state, batch), 3)
    print("fwd_only", out["fwd_only"], "ms/step", flush=True)

    # dl_head forward-only: splits the mixture cost into its fwd and bwd
    # kernel halves — (fwd_only - fwd_only_dl) is the fwd kernel's share,
    # the rest of (full - dl_head) is the bwd kernel's (round 4, §12m
    # optimization targeting)
    cfg_dl = _cfg(likelihood="dl")
    step_dl = fwd_only_step(cfg_dl)
    _, state_dl = build(cfg_dl)
    out["fwd_only_dl"] = round(time_step(step_dl, state_dl, batch), 3)
    print("fwd_only_dl", out["fwd_only_dl"], "ms/step", flush=True)

    full = out["full"]
    attribution = {
        "modl_kernel_vs_xla_gain_ms": round(out["jnp_modl"] - full, 3),
        "mixture_math_ms": round(full - out["dl_head"], 3),
        "mixture_fwd_ms": round(out["fwd_only"] - out["fwd_only_dl"], 3),
        "mixture_bwd_ms": round(
            (full - out["dl_head"]) - (out["fwd_only"] - out["fwd_only_dl"]),
            3),
        "k_scaling_4x_samples_ms": round(full - out["k1"], 3),
        "backward_plus_adam_ms": round(full - out["fwd_only"], 3),
        "imgs_per_sec_full": round(BATCH / full * 1e3, 1),
    }
    out["attribution"] = attribution
    print(json.dumps(out))


if __name__ == "__main__":
    main()
