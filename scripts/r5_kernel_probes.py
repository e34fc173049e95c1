"""Round-5 kernel probes (VERDICT r4 items #2, #3, #6):

A. Extended lane sweep — L in {2048, 4096} production mode, std vs
   batch-lanes, to bound the dispatch crossover (the r5 sweep showed BL
   winning everywhere up to 1280).
B. The exact-f32 split route (mdl_log_prob_batch_lanes_f32) vs the
   standard kernel on the ALL-f32 parity default, with an optimized-HLO
   copy audit (does the u16 narrowing fold the relayout like the bf16
   convert did?).
C. The lane-tiled (k-grid) eval kernel vs the standard kernel on the
   5000-IS evaluator at batch 128 (production eval config), target: beat
   86 imgs/s.

Run SOLO on the TPU: python scripts/r5_kernel_probes.py
Results: docs/design.md §12o.
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench
import vae_mdl_tpu.ops.pallas.mdl_kernel as mk


def measure_train(force=None, swap=None, n_repeats=6, **kw):
    """force: prefer_batch_lanes return; swap: replace mdl_log_prob."""
    orig_pref, orig_std = mk.prefer_batch_lanes, mk.mdl_log_prob
    if force is not None:
        mk.prefer_batch_lanes = lambda *a, **k: force
    if swap is not None:
        mk.mdl_log_prob = swap
    try:
        step, state, batch, cfg, _ = bench.setup_scanned_step("model05", **kw)
        rates = bench.time_scanned_step(step, state, batch, kw.get("spc", 10),
                                        cfg.data.batch_size,
                                        n_repeats=n_repeats)
    finally:
        mk.prefer_batch_lanes, mk.mdl_log_prob = orig_pref, orig_std
    return {"median": round(float(np.median(rates)), 1),
            "min": round(float(rates.min()), 1),
            "sd": round(float(rates.std(ddof=1)), 1)}


def copy_audit(**kw):
    """Compile the model05 train step and list big `copy` ops (bytes est
    from the shape) in the optimized HLO."""
    step, state, batch, cfg, _ = bench.setup_scanned_step("model05", **kw)
    txt = step.lower(state, batch).compile().as_text()
    copies = []
    for line in txt.splitlines():
        if "copy(" not in line:
            continue
        m = re.search(r"(f32|bf16|u16|s16|f16)\[([0-9,]+)\]", line)
        if not m:
            continue
        dt, dims = m.groups()
        n = int(np.prod([int(d) for d in dims.split(",")]))
        nbytes = n * (4 if dt == "f32" else 2)
        if nbytes >= 4 * 1024 * 1024:
            copies.append({"dtype": dt, "shape": dims, "mb": round(nbytes / 1e6, 1)})
    return copies


def measure_eval(swap=None, batch_size=128, k_chunk=100, n_timed=3):
    orig_std = mk.mdl_log_prob
    orig_pref = mk.prefer_batch_lanes
    if swap is not None:
        mk.mdl_log_prob = swap
        mk.prefer_batch_lanes = lambda *a, **k: False
    try:
        rates = bench._eval_throughput(batch_size=batch_size, k_chunk=k_chunk,
                                       n_timed=n_timed)
    finally:
        mk.mdl_log_prob, mk.prefer_batch_lanes = orig_std, orig_pref
    return {"median": round(float(np.median(rates)), 1),
            "min": round(float(rates.min()), 1),
            "sd": round(float(rates.std(ddof=1)), 1)}


def main():
    out = {}

    # ---- A: extended lane sweep
    prod = dict(compute_dtype="bfloat16",
                model_over={"likelihood_io_dtype": "bfloat16"})
    for L, B, k in ((2048, 128, 16), (4096, 128, 32)):
        kw = dict(prod)
        kw["model_over"] = dict(kw["model_over"], n_samples=k)
        res = {lbl: measure_train(force=f, **kw)
               for lbl, f in (("std", False), ("bl", True))}
        res["bl_vs_std"] = round(res["bl"]["median"] / res["std"]["median"] - 1, 4)
        out[f"L{L}"] = res
        print(json.dumps({f"L{L}": res}), flush=True)

    # ---- B: exact-f32 split route on the parity default
    out["f32_std"] = measure_train(force=False)
    print(json.dumps({"f32_std": out["f32_std"]}), flush=True)
    out["f32_split_bl"] = measure_train(force=False,
                                        swap=mk.mdl_log_prob_batch_lanes_f32)
    print(json.dumps({"f32_split_bl": out["f32_split_bl"]}), flush=True)

    # HLO copy audit: default f32 vs split route
    out["copies_f32_std"] = copy_audit()
    print(json.dumps({"copies_f32_std": out["copies_f32_std"]}), flush=True)
    orig = mk.mdl_log_prob
    mk.mdl_log_prob = mk.mdl_log_prob_batch_lanes_f32
    try:
        out["copies_f32_split"] = copy_audit()
    finally:
        mk.mdl_log_prob = orig
    print(json.dumps({"copies_f32_split": out["copies_f32_split"]}), flush=True)

    # ---- C: eval lane-tiled at batch 128
    out["eval_std_B128"] = measure_eval()
    print(json.dumps({"eval_std_B128": out["eval_std_B128"]}), flush=True)
    out["eval_lane_tiled_B128"] = measure_eval(swap=mk.mdl_log_prob_lane_tiled)
    print(json.dumps({"eval_lane_tiled_B128": out["eval_lane_tiled_B128"]}),
          flush=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
