"""Measure the on-chip cost of the alternative training objectives.

Throughput of the scanned train step (reference batch/k, steps_per_call 10)
for: the IWAE baseline, DReG (objective="iwae_dreg" — two complementary
stop-gradient forward passes plus the eq.-12 posterior re-evaluation,
assembled into one estimator), ELBO, free-bits ELBO, and beta-warmup IWAE.
model01 (MLP family; DReG's published target workload) and model05
(flagship conv family). Timing harness shared with bench.py
(setup_scanned_step / time_scanned_step). Run SOLO on the TPU:
`python scripts/objective_cost.py`. Results: design.md §12j.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from bench import _train_throughput  # noqa: E402


def main():
    for name in ("model01", "model05"):
        base = float(np.median(_train_throughput(name)[0]))
        print(f"{name} iwae baseline: {base:.0f} imgs/s", flush=True)
        for label, m_over, t_over in (
            ("iwae_dreg", dict(objective="iwae_dreg"), {}),
            ("elbo", dict(objective="elbo"), {}),
            ("elbo+free_bits", dict(objective="elbo", free_bits=0.25), {}),
            ("iwae+beta_warmup", {}, dict(beta_warmup_steps=10_000)),
        ):
            t = float(np.median(_train_throughput(name, model_over=m_over,
                                                  train_over=t_over)[0]))
            print(f"{name} {label}: {t:.0f} imgs/s "
                  f"({100 * (t / base - 1):+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
