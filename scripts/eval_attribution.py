"""Differential attribution of the production 5000-IS evaluator.

§12p closed the production TRAIN step's attribution; this does the same
for the eval regime (105 imgs/s, eval MFU 0.53 — design.md §12o): how
much of the evaluator is conv forward vs mixture log-prob (lane-tiled
kernel + its boundary traffic)?

Variants, timed through bench.py's `_eval_throughput`-style loop (one
128 batch per call, value-fetch sync):
  full   — the shipped production eval (bf16 body + bf16 boundary +
           lane-tiled kernel, k_chunk=200)
  dl     — likelihood swapped to discretized-logistic (bf16 body; the
           ConvDecoder keeps the full conv stack incl. the 50-ch head
           conv and appends a small 6-ch head — the delta isolates the
           mixture log-prob work at the eval shape, same caveat as §12c)

OUTCOME (measured 2026-08-21, design.md §12q): the control is INVALID at
the eval shape — the dl variant reads 27.5 imgs/s vs full's 105.3,
because its jnp likelihood path collapses at k_chunk*B = 25,600-lane
operands (same class as the round-1 jnp config's 26 imgs/s). The
"mixture share" therefore prints NEGATIVE; what the probe actually
establishes is (a) the Pallas eval path is worth ~4x over any jnp
likelihood at this regime, and (b) the ladder families' DL-head
5000-IS evals run that same jnp path — a lane-tiled DL eval kernel is
the named next eval lever.

Run SOLO on the TPU: python scripts/eval_attribution.py
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
from vae_mdl_tpu.evaluation.harness import make_batch_evaluator
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.state import create_train_state
from vae_mdl_tpu.utils.flops import V5E_PEAK_FLOPS, forward_flops

BATCH = 128
K_CHUNK = 200
N_SAMPLES = 5000


def eval_rate(model_over: dict, n_timed: int = 3) -> float:
    cfg = experiment("model05")
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:svhn_cropped"),
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                  use_pallas=True, **model_over),
    )
    model = build_model(cfg.model)
    x0 = jnp.zeros((16, 32, 32, 3), jnp.float32)
    state = create_train_state(model, cfg.train, x0, cfg.model.n_samples)
    evaluator = make_batch_evaluator(model, cfg, N_SAMPLES, K_CHUNK)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 256, (BATCH, 32, 32, 3), dtype=np.uint8))
    llh = evaluator(state.params, batch, jax.random.PRNGKey(0))
    float(llh[0])
    rates = []
    for r in range(1 + n_timed):  # first timed call discarded
        t0 = time.perf_counter()
        llh = evaluator(state.params, batch, jax.random.PRNGKey(1 + r))
        float(llh[0])
        rates.append(BATCH / (time.perf_counter() - t0))
    return float(np.median(rates[1:]))


def main():
    out = {}
    out["full_imgs_per_sec"] = round(
        eval_rate({"likelihood_io_dtype": "bfloat16"}), 1)
    print("full", out["full_imgs_per_sec"], "imgs/s", flush=True)
    out["dl_imgs_per_sec"] = round(eval_rate({"likelihood": "dl"}), 1)
    print("dl", out["dl_imgs_per_sec"], "imgs/s", flush=True)
    out["full_recheck_imgs_per_sec"] = round(
        eval_rate({"likelihood_io_dtype": "bfloat16"}, n_timed=2), 1)
    print("full_recheck", out["full_recheck_imgs_per_sec"], flush=True)

    t_full = BATCH / out["full_imgs_per_sec"]
    t_dl = BATCH / out["dl_imgs_per_sec"]
    cfg = experiment("model05")
    eval_flops = forward_flops(cfg.model, batch=BATCH, n_samples=N_SAMPLES)
    # boundary floor: the [k_chunk*B, 32, 32, 50] bf16 parameter tensor is
    # written by the head conv and read by the fwd kernel, per chunk
    chunk_bytes = K_CHUNK * BATCH * 32 * 32 * 50 * 2
    boundary_s = 2 * chunk_bytes * (N_SAMPLES // K_CHUNK) / 819e9
    drift = abs(out["full_recheck_imgs_per_sec"]
                - out["full_imgs_per_sec"]) / out["full_imgs_per_sec"]
    out["attribution"] = {
        "mixture_share_s_per_batch": round(t_full - t_dl, 4),
        "mixture_share_frac": round((t_full - t_dl) / t_full, 4),
        "conv_body_mfu": round(eval_flops / t_dl / V5E_PEAK_FLOPS, 4),
        "boundary_floor_s_per_batch": round(boundary_s, 4),
        "mixture_vs_boundary_floor": round((t_full - t_dl) / boundary_s, 2),
        "session_drift_frac": round(drift, 4),
        "session_stable": bool(drift <= 0.05),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
