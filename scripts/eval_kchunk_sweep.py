"""k_chunk sweep for the lane-tiled 5000-IS evaluator (round 5).

The lane-tiled kernel removed the x broadcast's dependence on k_chunk, so
the r2-era k_chunk=100 choice may no longer be optimal: larger chunks
amortise per-chunk scan overhead at more HBM; smaller chunks cut the
parameter tensor. Sweep k_chunk at the production eval config (bf16 body
+ bf16 boundary + lane-tiled dispatch, B=128).

Run SOLO on the TPU: python scripts/eval_kchunk_sweep.py
Results: docs/design.md §12o.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench


def main():
    out = {}
    for kc in (50, 100, 200, 250):
        rates = bench._eval_throughput(batch_size=128, k_chunk=kc, n_timed=3)
        out[f"k{kc}"] = {"median": round(float(np.median(rates)), 1),
                         "min": round(float(rates.min()), 1),
                         "sd": round(float(rates.std(ddof=1)), 1)}
        print(json.dumps({f"k{kc}": out[f"k{kc}"]}), flush=True)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
