"""Pin prefer_batch_lanes' max_lanes by measurement (VERDICT r4 item #6)
and recertify model01's throughput rows under value-fetch timing
(VERDICT r4 item #5).

Part 1 — lane sweep: the r4 dispatch rule was measured only at L = k*B =
640 but extrapolates to 1024. This sweeps L in {640, 768, 896, 1024,
1280} through the REAL production-mode train step (bf16 body + bf16
boundary), forcing each kernel via a prefer_batch_lanes monkeypatch, and
reports the per-L winner. The crossover sets max_lanes.

Part 2 — model01: BENCH_r04's model01 metric reads 70k +- 27k (sd 39% of
median: at 70k imgs/s a 10-step scan of batch 128 is ~18 ms per dispatch
— same order as the relay's per-dispatch jitter). Measure spc in {10, 50,
100} and the device-resident path to pick a sound bench configuration,
and recertify the README per-step/scan/resident rows (the published
numbers predate the §12m value-fetch discipline).

Run SOLO on the TPU: python scripts/lane_threshold_sweep.py
Results: docs/design.md §12o.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench
import vae_mdl_tpu.ops.pallas.mdl_kernel as mk


def measure(name, force_bl=None, n_repeats=6, **kw):
    orig = mk.prefer_batch_lanes
    if force_bl is not None:
        mk.prefer_batch_lanes = lambda *a, **k: force_bl
    try:
        train_step, state, batch, cfg, _ = bench.setup_scanned_step(name, **kw)
        rates = bench.time_scanned_step(
            train_step, state, batch, kw.get("spc", 10),
            cfg.data.batch_size, n_repeats=n_repeats)
    finally:
        mk.prefer_batch_lanes = orig
    return {"median": round(float(np.median(rates)), 1),
            "min": round(float(rates.min()), 1),
            "sd": round(float(rates.std(ddof=1)), 1)}


def main():
    out = {}

    # ---- Part 1: lane sweep (production mode: bf16 body + bf16 boundary)
    prod = dict(compute_dtype="bfloat16",
                model_over={"likelihood_io_dtype": "bfloat16"})
    sweep = [  # (L, batch, k)
        (640, 128, 5), (768, 128, 6), (896, 128, 7),
        (1024, 128, 8), (1280, 256, 5),
    ]
    for L, B, k in sweep:
        kw = dict(prod)
        kw["model_over"] = dict(kw["model_over"], n_samples=k)
        if B != 128:
            kw["data_over"] = {"batch_size": B}
        res = {}
        for label, force in (("std", False), ("bl", True)):
            res[label] = measure("model05", force_bl=force, **kw)
        res["bl_vs_std"] = round(
            res["bl"]["median"] / res["std"]["median"] - 1.0, 4)
        out[f"L{L}"] = res
        print(json.dumps({f"L{L}_B{B}_k{k}": res}), flush=True)

    # ---- Part 2: model01 recertification (f32, value-fetch timing)
    for spc in (10, 50, 100):
        out[f"model01_spc{spc}"] = measure(
            "model01", spc=spc, train_over={"steps_per_call": spc})
        print(json.dumps({f"model01_spc{spc}": out[f"model01_spc{spc}"]}),
              flush=True)
    # per-step dispatch (spc=1) — the README "per-step" row
    out["model01_spc1"] = measure("model01", spc=1,
                                  train_over={"steps_per_call": 1})
    print(json.dumps({"model01_spc1": out["model01_spc1"]}), flush=True)
    # device-resident (the README 320k-2M row)
    rates = bench._resident_throughput("model01", spc=100)
    out["model01_resident_spc100"] = {
        "median": round(float(np.median(rates)), 1),
        "min": round(float(rates.min()), 1),
        "sd": round(float(rates.std(ddof=1)), 1)}
    print(json.dumps({"model01_resident_spc100":
                      out["model01_resident_spc100"]}), flush=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
