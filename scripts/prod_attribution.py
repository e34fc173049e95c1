"""Differential ablation of the model05 PRODUCTION-mode train step.

All prior attributions (§12c, scripts/ablation_attribution.py) ran the f32
parity config with the standard kernel. Round 5's number of record is the
production mode — bf16 body + bf16 likelihood boundary + the batch-lanes
kernel, 32.2k imgs/s ≈ 50% MFU — and no measurement says where ITS
remaining half lives. Same method as §12c: composed programs differing by
one component, timed through bench.py's own setup/timing functions so the
numbers are directly comparable with the record.

Variants (all compute_dtype=bfloat16; mdl ones likelihood_io_dtype=bfloat16):
  full       — the shipped production step (batch-lanes kernel auto-dispatch)
  jnp_modl   — XLA-fused jnp likelihood (upcasts the bf16 boundary itself)
  dl_head    — likelihood swapped to discretized-logistic (bf16 body only:
               io_dtype is mdl-only by config contract) — the delta is
               mixture math + its boundary traffic, labeled as such
  k1         — one importance sample (k-scaling share)
  fwd_only   — scanned forward+loss only (backward+Adam share)
  fwd_only_dl— fwd-only with the dl head (splits mixture fwd vs bwd)

Run SOLO on the TPU: python scripts/prod_attribution.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json

import jax
import numpy as np

import bench
from vae_mdl_tpu.utils.flops import V5E_PEAK_FLOPS, forward_flops

SPC = 10
PROD_MODEL = {"likelihood_io_dtype": "bfloat16"}


def fwd_only_step(cfg):
    """Scanned forward+loss only (no grad, no optimizer) — mirrors the
    scanned production step's structure so the (full - fwd_only) delta is
    the backward+Adam share."""
    from vae_mdl_tpu.models.objective import compute_loss
    from vae_mdl_tpu.models.vae import build_model, prior_for
    from vae_mdl_tpu.train.steps import preprocess_train

    model = build_model(cfg.model)
    prior = prior_for(cfg.model)
    k = cfg.model.n_samples

    def multi(state, batches):
        def body(s, batch):
            rngs = s.next_rngs("sample", "binarize", "flip")
            x = preprocess_train(cfg, batch, rngs)
            Qs, Ps, pxz = model.apply(s.params, x, k,
                                      rngs={"sample": rngs["sample"]})
            loss, _ = compute_loss(prior, Qs, Ps, pxz, x)
            return s.replace(step=s.step + 1), {"loss": loss}

        state, metrics = jax.lax.scan(body, state, batches)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return jax.jit(multi)


def timed(name, spc=SPC, compute_dtype="bfloat16", model_over=None,
          fwd_only=False):
    step, state, batch, cfg, _ = bench.setup_scanned_step(
        name, spc=spc, compute_dtype=compute_dtype,
        model_over=model_over, donate=False)
    if fwd_only:
        step = fwd_only_step(cfg)
    rates = bench.time_scanned_step(step, state, batch, spc,
                                    cfg.data.batch_size)
    ms = cfg.data.batch_size / float(np.median(rates)) * 1e3
    return round(ms, 3), rates


def main():
    out = {}
    runs = [
        ("full", dict(model_over=PROD_MODEL)),
        ("jnp_modl", dict(model_over={**PROD_MODEL, "use_pallas": False})),
        ("dl_head", dict(model_over={"likelihood": "dl"})),
        ("k1", dict(model_over={**PROD_MODEL, "n_samples": 1})),
        ("fwd_only", dict(model_over=PROD_MODEL, fwd_only=True)),
        ("fwd_only_dl", dict(model_over={"likelihood": "dl"},
                             fwd_only=True)),
        # drift control: re-run the opening config last (§12o discipline)
        ("full_recheck", dict(model_over=PROD_MODEL)),
    ]
    for name, kw in runs:
        out[name], _ = timed("model05", **kw)
        print(name, out[name], "ms/step", flush=True)

    full = out["full"]
    drift = abs(out["full_recheck"] - full) / full
    cfg = bench.setup_scanned_step("model05", spc=1)[3]
    fwd_flops = forward_flops(cfg.model, batch=128, n_samples=5)
    fwd_s, bwd_s = out["fwd_only"] / 1e3, (full - out["fwd_only"]) / 1e3
    out["attribution"] = {
        "backward_plus_adam_ms": round(full - out["fwd_only"], 3),
        "fwd_mfu": round(fwd_flops / fwd_s / V5E_PEAK_FLOPS, 4),
        "bwd_mfu": round(2 * fwd_flops / bwd_s / V5E_PEAK_FLOPS, 4),
        "mixture_plus_boundary_ms": round(full - out["dl_head"], 3),
        "mixture_fwd_ms": round(out["fwd_only"] - out["fwd_only_dl"], 3),
        "kernel_vs_jnp_gain_ms": round(out["jnp_modl"] - full, 3),
        "k_scaling_4x_samples_ms": round(full - out["k1"], 3),
        "imgs_per_sec_full": round(128 / full * 1e3, 1),
        "session_drift_frac": round(drift, 4),
        "session_stable": bool(drift <= 0.05),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
