"""Metrics/observability: TensorBoard + JSONL + throughput counters.

Reference behaviour (SURVEY.md §5): TensorBoard only, val metrics under a
typo'd "Evalutation/" tag, a train writer that is created but never used,
no timing anywhere. Here:

- scalars and image grids go to TensorBoard when ``tensorboardX`` is
  importable (it is in this image), tag "Evaluation/<name>" (typo fixed,
  documented);
- everything is also appended to ``metrics.jsonl`` (machine-readable, no TF
  needed to consume);
- the trainer feeds imgs/sec and step-time metrics through the same path
  (the >= 5x throughput target needs first-class timing, SURVEY.md §6).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str):
        stamp = time.strftime("%Y%m%d-%H%M%S")
        self.dir = os.path.join(log_dir, f"{run_name}-{stamp}")
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter

            self._tb: Optional[object] = SummaryWriter(self.dir)
        except Exception:
            self._tb = None

    def scalars(self, step: int, metrics: Dict[str, float], prefix: str = "Evaluation"):
        # the prefix makes jsonl records self-describing: Train/ and
        # Evaluation/ share metric keys, so without it the stream would be
        # ambiguous to offline consumers
        record = {"step": int(step), "prefix": prefix}
        for name, value in metrics.items():
            v = float(np.asarray(value).mean())
            record[name] = v
            if self._tb is not None:
                self._tb.add_scalar(f"{prefix}/{name}", v, int(step))
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def image(self, step: int, name: str, img: np.ndarray, prefix: str = "Evaluation"):
        """img: [H, W, C] float in [0,1] or uint8."""
        if self._tb is None:
            return
        from vae_mdl_tpu.utils.images import to_uint8

        arr = to_uint8(img)
        self._tb.add_image(f"{prefix}/{name}", arr, int(step), dataformats="HWC")

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
