"""Capture a jax.profiler trace of the model05 hot paths and print a
per-op time table (VERDICT r2 next-round #2: the ~30% MFU ceiling must be
trace-proven, not arithmetic-argued).

Runs SOLO on the TPU:

    python scripts/trace_profile.py [--out /tmp/mdl_trace]

Parses the XSpace protobuf the profiler writes (via the xplane_pb2 schema
bundled inside TensorFlow — TF itself is never used for compute) and
aggregates event durations per op name on every device plane found.
"""
from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_traced_workload(out_dir: str, n_steps: int = 12):
    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.evaluation.harness import make_batch_evaluator
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.state import create_train_state, make_optimizer
    from vae_mdl_tpu.train.steps import make_train_step

    cfg = experiment("model05")
    cfg = dataclasses.replace(cfg, data=DataConfig(dataset="synthetic:svhn_cropped"))
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    batch_size = cfg.data.batch_size

    x_f32 = jnp.zeros((batch_size, 32, 32, 3), jnp.float32)
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 256, (batch_size, 32, 32, 3), dtype=np.uint8))

    # eval path: bf16 body + Pallas kernel (the shipped eval config)
    ecfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                       use_pallas=True))
    emodel = build_model(ecfg.model)
    estate = create_train_state(emodel, ecfg.train, x_f32[:16],
                                ecfg.model.n_samples)
    evaluator = make_batch_evaluator(emodel, ecfg, n_samples=500, k_chunk=100)
    ebatch = jnp.asarray(
        rng.integers(0, 256, (100, 32, 32, 3), dtype=np.uint8))

    # warm up OUTSIDE the trace (compiles would dwarf execution)
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    llh = evaluator(estate.params, ebatch, jax.random.PRNGKey(0))
    jax.block_until_ready(llh)

    jax.profiler.start_trace(out_dir)
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    llh = evaluator(estate.params, ebatch, jax.random.PRNGKey(1))
    jax.block_until_ready(llh)
    jax.profiler.stop_trace()
    print(f"[trace] wrote {out_dir}; train loss {float(metrics['loss']):.1f}")


def summarize(out_dir: str, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("[trace] no xplane.pb found under", out_dir)
        return
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            is_device = any(s in plane.name for s in
                            ("TPU", "Device", "device", "/device"))
            if not is_device or "Host" in plane.name:
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            totals = collections.Counter()
            count = collections.Counter()
            t_min, t_max = None, 0
            for line in plane.lines:
                for ev in line.events:
                    name = meta.get(ev.metadata_id, f"id{ev.metadata_id}")
                    totals[name] += ev.duration_ps
                    count[name] += 1
                    start = line.timestamp_ns * 1000 + ev.offset_ps
                    t_min = start if t_min is None else min(t_min, start)
                    t_max = max(t_max, start + ev.duration_ps)
            if not totals:
                continue
            wall_ps = (t_max - t_min) if t_min is not None else 1
            print(f"\n=== plane: {plane.name} ({path.split('/')[-1]}) ===")
            print(f"busy(sum-of-events)={sum(totals.values())/1e9:.3f} ms, "
                  f"span={wall_ps/1e9:.3f} ms")
            print(f"{'op':<64} {'total ms':>10} {'n':>6} {'%busy':>7}")
            busy = sum(totals.values())
            for name, ps in totals.most_common(top):
                print(f"{name[:64]:<64} {ps/1e9:>10.3f} {count[name]:>6} "
                      f"{100.0*ps/busy:>6.1f}%")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mdl_trace_%d" % int(time.time()))
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        run_traced_workload(args.out)
    summarize(args.out)
