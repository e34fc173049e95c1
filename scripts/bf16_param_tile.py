"""Experiment: bf16 MoDL parameter tile — does halving the likelihood
kernel's HBM traffic move the step?

design.md §12f concluded the fused MoDL kernels are bound by
parameter-tile I/O + in-VMEM transposes, not elementwise op count. The
one untried lever on that bound is the tile's WIDTH: emit the head's
``[.., H, W, 10n]`` parameter tensor as bfloat16 (the kernels already
upcast every tile to f32 in-register, so the likelihood MATH stays f32;
only the stored parameter VALUES quantise) and let the backward dp
tensor come back bf16. Per step (batch 128, k=5) that halves ~790 MB of
kernel traffic to ~395 MB, plus halves the two in-VMEM transposes' byte
volume.

Numerics caveat (why this can never be the parity default): a bf16
quantisation step near |loc|~1 is ~half a 1/255 bin (decoders.py head
contract), so values shift at the 1e-2..1e-1 nat level — acceptable only
as a labeled throughput mode, like compute_dtype="bfloat16" already is.

Variants (each the FULL composed model05 train step, ablation
methodology of design.md §12c):
  f32_tile   — shipped default (f32 body, f32 tile)
  bf16_tile  — f32 body, parameter tensor cast bf16 at the head output
  bf16_body  — bf16 conv body, f32 tile (the shipped --bf16 mode)
  bf16_both  — bf16 conv body + bf16 tile
Also reports each variant's step-0 loss delta vs f32_tile (same params,
same batch) so the quantisation cost is visible next to the speed.

Run SOLO on the TPU: python scripts/bf16_param_tile.py
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
from vae_mdl_tpu.nn import decoders
from vae_mdl_tpu.train.state import create_train_state, make_optimizer
from vae_mdl_tpu.train.steps import make_multi_train_step

BATCH = 128
SPC = 10

_orig_make_observation = decoders.make_observation


def _bf16_tile_make_observation(out, likelihood, bound_logstd=False,
                                use_pallas=None):
    """make_observation with the mdl parameter tensor quantised to bf16."""
    if likelihood == "mdl":
        from vae_mdl_tpu.distributions import MixtureDiscretizedLogistic
        use_pallas = decoders.resolve_use_pallas(use_pallas, likelihood,
                                                 operand=out)
        return MixtureDiscretizedLogistic(
            out.astype(jnp.bfloat16), event_axes=(-1, -2, -3),
            use_pallas=use_pallas)
    return _orig_make_observation(out, likelihood, bound_logstd, use_pallas)


def _cfg(**model_over):
    cfg = experiment("model05")
    cfg = dataclasses.replace(
        cfg, data=DataConfig(dataset="synthetic:svhn_cropped"))
    if model_over:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_over))
    return cfg


def build(cfg, bf16_tile):
    # the patch must stay active through tracing (first call); main() resets
    # it after each variant's timing
    decoders.make_observation = (
        _bf16_tile_make_observation if bf16_tile else _orig_make_observation)
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    step = make_multi_train_step(model, cfg, tx, n_steps=SPC, donate=False)
    return step, state


def time_step(step, state, batch, n_iters=5):
    for _ in range(2):
        state2, metrics = step(state, batch)
        state = state2
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    return (time.perf_counter() - t0) / (n_iters * SPC) * 1e3


def main():
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 256, (SPC, BATCH, 32, 32, 3), dtype=np.uint8))

    variants = {
        "f32_tile": (dict(), False),
        "bf16_tile": (dict(), True),
        "bf16_body": (dict(compute_dtype="bfloat16"), False),
        "bf16_both": (dict(compute_dtype="bfloat16"), True),
    }
    out, losses = {}, {}
    for name, (over, bf16_tile) in variants.items():
        cfg = _cfg(**over)
        step, state = build(cfg, bf16_tile)
        # step-0 loss on the identical init + batch: quantisation cost
        _, metrics = step(state, batch)
        losses[name] = float(metrics["loss"])
        out[name] = round(time_step(step, state, batch), 3)
        decoders.make_observation = _orig_make_observation
        print(name, out[name], "ms/step", "loss", round(losses[name], 4),
              flush=True)

    f32 = out["f32_tile"]
    out["summary"] = {
        "bf16_tile_speedup_pct": round((f32 / out["bf16_tile"] - 1) * 100, 1),
        "bf16_both_vs_body_pct": round(
            (out["bf16_body"] / out["bf16_both"] - 1) * 100, 1),
        "loss_shift_bf16_tile": round(losses["bf16_tile"] - losses["f32_tile"], 4),
        "imgs_per_sec": {k: round(BATCH / v * 1e3, 1)
                         for k, v in out.items() if isinstance(v, float)},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
