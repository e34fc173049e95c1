"""Round-5 biladder attribution probe (VERDICT r4 item #4).

Three rounds at ~1368 imgs/s / 25.3% MFU; §12g pinned the backward as the
slow half and closed the scheduling/remat/batch levers. This round points
the §12n toolkit at it:

  1. HLO copy audit of the compiled biladder_celeba train step — are
     there big cross-layout copies (concat / resize / backward-conv
     relayouts) like model05's 131 MB one?
  2. split_merge A/B: the merge heads' conv over concat([h_b, d]) runs
     the h half k times and materialises the concat; split_merge=True
     computes conv_h(h) once (no k axis) + conv_d(d) — same linear map
     (tests/test_bidirectional.py pins equivalence).
  3. Two compiler-option variants that §12k only swept on model05
     (vmem=64M, latency-hiding scheduler).

Run SOLO on the TPU: python scripts/biladder_r5_probe.py
Results: docs/design.md §12o.
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench

KW = dict(spc=5, compute_dtype=None)  # bench's biladder_celeba config


def measure(n_repeats=6, model_over=None):
    step, state, batch, cfg, _ = bench.setup_scanned_step(
        "biladder_celeba", model_over=model_over, **KW)
    rates = bench.time_scanned_step(step, state, batch, 5,
                                    cfg.data.batch_size, n_iters=3,
                                    n_repeats=n_repeats)
    return {"median": round(float(np.median(rates)), 1),
            "min": round(float(rates.min()), 1),
            "sd": round(float(rates.std(ddof=1)), 1)}


def copy_audit(model_over=None, min_mb=4.0):
    step, state, batch, cfg, _ = bench.setup_scanned_step(
        "biladder_celeba", model_over=model_over, **KW)
    txt = step.lower(state, batch).compile().as_text()
    copies = []
    for line in txt.splitlines():
        if "copy(" not in line and "copy-start" not in line:
            continue
        m = re.search(r"(f32|bf16|u16|s16|f16)\[([0-9,]+)\]", line)
        if not m:
            continue
        dt, dims = m.groups()
        n = int(np.prod([int(d) for d in dims.split(",")]))
        nbytes = n * (4 if dt == "f32" else 2)
        if nbytes >= min_mb * 1e6:
            copies.append({"dtype": dt, "shape": dims,
                           "mb": round(nbytes / 1e6, 1)})
    agg = {}
    for c in copies:
        key = f'{c["dtype"]}[{c["shape"]}]'
        agg.setdefault(key, {"mb": c["mb"], "n": 0})
        agg[key]["n"] += 1
    return agg


def main():
    out = {}
    out["copies_baseline"] = copy_audit()
    print(json.dumps({"copies_baseline": out["copies_baseline"]}), flush=True)

    out["baseline"] = measure()
    print(json.dumps({"baseline": out["baseline"]}), flush=True)
    out["split_merge"] = measure(model_over={"split_merge": True})
    print(json.dumps({"split_merge": out["split_merge"]}), flush=True)
    out["baseline_again"] = measure(n_repeats=4)
    print(json.dumps({"baseline_again": out["baseline_again"]}), flush=True)

    # compiler options (AOT path, §12k methodology)
    import time

    import jax

    for tag, opts in (("vmem64M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
                      ("lhs_sched",
                       {"xla_tpu_enable_latency_hiding_scheduler": "true"})):
        try:
            step, state, batch, cfg, _ = bench.setup_scanned_step(
                "biladder_celeba", donate=False, **KW)
            compiled = step.lower(state, batch).compile(
                compiler_options=opts)
            for _ in range(2):
                st2, metrics = compiled(state, batch)
            float(metrics["loss"])
            rates = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(3):
                    st2, metrics = compiled(state, batch)
                float(metrics["loss"])
                rates.append(3 * 5 * cfg.data.batch_size /
                             (time.perf_counter() - t0))
            r = np.asarray(rates[1:])
            out[tag] = {"median": round(float(np.median(r)), 1),
                        "min": round(float(r.min()), 1),
                        "sd": round(float(r.std(ddof=1)), 1)}
        except Exception as e:  # bogus option fails the remote compile
            out[tag] = {"error": str(e)[:200]}
        print(json.dumps({tag: out[tag]}), flush=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
