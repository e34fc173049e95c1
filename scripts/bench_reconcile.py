"""Reconcile the perf record: the §12n production-mode A/B run INSIDE the
bench harness (VERDICT r4 item #1).

BENCH_r04's driver-captured `model05_bf16_full` median (26,985 imgs/s)
sits ~5 sigma below the committed same-session claim (32,107) — and the
bf16-involved bench metrics carry 10-60x the dispersion of the f32 ones.
This script separates the candidate explanations by measuring, in ONE
session, an interleaved sequence through bench.py's exact setup/timing
functions (setup_scanned_step / time_scanned_step — the same code path the
driver runs):

    f32(A) -> prod(B) -> f32(A') -> prod(B') -> bf16(C) -> bf16io(D)

- If B ~ B' ~ BENCH_r04 and both < 32.1k: the r4 committed claim was
  session drift the in-session sd does not capture -> the README/round4
  numbers must be rewritten to driver-bench medians (done in this round).
- If B' >> B (or A' != A): in-bench ordering/thermal state is real and the
  bench harness itself needs warm-up isolation.
- The HLO check below rules dispatch non-engagement in or out directly.

Run SOLO on the TPU: python scripts/bench_reconcile.py
Results: docs/design.md §12o (round 5).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench


def measure(tag, out, n_repeats=8, **kw):
    train_step, state, batch, cfg, _ = bench.setup_scanned_step("model05", **kw)
    rates = bench.time_scanned_step(train_step, state, batch, 10,
                                    cfg.data.batch_size, n_repeats=n_repeats)
    out[tag] = {
        "median": round(float(np.median(rates)), 1),
        "min": round(float(rates.min()), 1),
        "sd": round(float(rates.std(ddof=1)), 1),
        "rates": [round(float(r), 1) for r in rates],
    }
    print(json.dumps({tag: out[tag]}), flush=True)


def check_dispatch_engages():
    """Compile bench's exact production-mode step and assert the batch-lanes
    kernel is in the program (its [H*W, 10n, k*B] = [1024, 50, 640] operand
    shape is unambiguous in the HLO text)."""
    train_step, state, batch, cfg, _ = bench.setup_scanned_step(
        "model05", compute_dtype="bfloat16",
        model_over={"likelihood_io_dtype": "bfloat16"})
    txt = train_step.lower(state, batch).compile().as_text()
    engaged = "1024,50,640" in txt.replace(" ", "")
    n_calls = txt.count("tpu_custom_call")
    print(json.dumps({"dispatch_check": {
        "batch_lanes_shape_in_hlo": engaged,
        "n_tpu_custom_calls": n_calls}}), flush=True)
    return engaged


def main():
    out = {}
    engaged = check_dispatch_engages()
    seq = [
        ("f32_A", {}),
        ("prod_B", dict(compute_dtype="bfloat16",
                        model_over={"likelihood_io_dtype": "bfloat16"})),
        ("f32_A2", {}),
        ("prod_B2", dict(compute_dtype="bfloat16",
                         model_over={"likelihood_io_dtype": "bfloat16"})),
        ("bf16_C", dict(compute_dtype="bfloat16")),
        ("bf16io_D", dict(model_over={"likelihood_io_dtype": "bfloat16"})),
    ]
    for tag, kw in seq:
        measure(tag, out, **kw)
    out["dispatch_engaged"] = engaged
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
