"""VPU transcendental roofline for the MoDL likelihood (VERDICT r3 #1).

Answers, with arithmetic: what fraction of the chip's transcendental
throughput does the fused MoDL kernel achieve? Pipeline:

1. raw per-op rates (exp/log/tanh/sigmoid/softplus) via Pallas loop
   kernels at the kernel's own (16, 2048) f32 tile geometry, plus a
   large-block control (ops/pallas/vpu_probe.py);
2. additive-model validation: the fused DL cascade (1 exp + 2 sigmoid +
   3 softplus + 1 log per element) measured as ONE loop op vs the rate
   predicted by summing the individual op times;
3. the analytic census of the MoDL fwd/bwd kernels
   (utils.flops.mdl_transcendental_census) priced at the measured rates
   -> VPU-bound floor per train step;
4. the MEASURED mixture cost inside the real step via differential
   ablation (full model05 step vs the same step with a DL likelihood) —
   the one timing shape this relay measures reliably;
5. the floor vs the measured mixture cost ("achieved % of VPU bound")
   and vs the full train-step time (model05_vpu_bound_frac).

Run SOLO on the TPU: `python scripts/vpu_roofline.py`.
Results: docs/design.md §12m.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def in_step_mixture_cost():
    """-> (full_ms_per_step, mixture_math_ms): the step-level differential
    ablation (scripts/ablation_attribution.py methodology) — the full
    model05 scanned train step vs the same step with the likelihood
    swapped to a single discretized logistic. The delta is the MoDL
    fwd+bwd cost inside the real program.

    This is the ONLY kernel-cost measurement this relay times reliably:
    isolated-op scans here are demonstrably non-additive (a two-kernel
    body repeatedly timed FASTER than a one-kernel body, and a
    three-kernel body equal to two), while the carry-chained scanned-step
    harness has been corroborated by wall-clock protocol runs across
    rounds."""
    from bench import setup_scanned_step, time_scanned_step

    out = {}
    for label, over in (("full", None), ("dl", {"likelihood": "dl"})):
        step, state, batch, cfg, _ = setup_scanned_step(
            "model05", model_over=over)
        rates = time_scanned_step(step, state, batch, 10,
                                  cfg.data.batch_size)
        out[label] = cfg.data.batch_size / float(np.median(rates)) * 1e3
    return out["full"], out["full"] - out["dl"]


def main():
    from vae_mdl_tpu.distributions.discretized import (
        discretized_logistic_log_prob,
    )
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.ops.pallas.vpu_probe import (
        DEFAULT_BLOCK,
        measure_op_rate,
        measure_rates,
        vpu_floor_seconds,
    )
    from vae_mdl_tpu.utils.flops import (
        mdl_train_transcendentals,
        mdl_transcendental_census,
    )

    if jax.default_backend() != "tpu":
        print("needs the TPU backend (loop probes are compiled, not "
              "interpreted)"); return

    print(f"probe block {DEFAULT_BLOCK} (the kernel's stacked-[3n,BP] "
          f"tile geometry)")
    rates = measure_rates()
    for op, r in rates.items():
        print(f"  {op:9s} {r/1e9:8.2f} Geval/s")
    big = measure_rates(block=(128, 2048), grid=8)
    for op, r in big.items():
        print(f"  {op:9s} {r/1e9:8.2f} Geval/s  [large-block control "
              f"(128,2048)]")

    # additive-model validation: fused DL cascade as one measured op
    def cascade(v):
        return discretized_logistic_log_prob(v, 0.9 * v, 0.1 * v,
                                             low=-1.0, high=1.0,
                                             interval_width=2.0 / 255.0)

    meas = measure_op_rate("cascade", op=cascade, iters=(200, 3200))
    t_pred = (1 / rates["exp"] + 2 / rates["sigmoid"]
              + 3 / rates["softplus"] + 1 / rates["log"])
    print(f"  DL cascade measured {meas/1e9:.2f} Geval/s vs additive-model "
          f"prediction {1/t_pred/1e9:.2f} Geval/s "
          f"({meas*t_pred:.0%} of predicted; >100% = the fused cascade "
          f"overlaps non-transcendental work the additive model charges "
          f"serially)")

    cfg = experiment("model05")
    batch, k = cfg.data.batch_size, cfg.model.n_samples
    census = mdl_transcendental_census(cfg.model.n_mix)
    pixels = batch * k * 32 * 32
    counts_fwd = {op: c * pixels for op, c in census["fwd"].items()}
    counts_step = mdl_train_transcendentals(cfg.model, batch)
    floor_fwd = vpu_floor_seconds(counts_fwd, rates)
    floor_step = vpu_floor_seconds(counts_step, rates)
    print(f"census/pixel fwd={census['fwd']} bwd={census['bwd']}")
    print(f"VPU-bound floor: fwd {floor_fwd*1e3:.3f} ms, fwd+bwd "
          f"{floor_step*1e3:.3f} ms per train step "
          f"({pixels} pixels, n_mix={cfg.model.n_mix})")

    full_ms, mix_ms = in_step_mixture_cost()
    print(f"step-level ablation: full step {full_ms:.3f} ms, mixture math "
          f"(full - dl_head) {mix_ms:.3f} ms -> the kernel achieves "
          f"{floor_step*1e3/mix_ms:.0%} of its transcendental VPU bound; "
          f"the {mix_ms - floor_step*1e3:.2f} ms gap is non-transcendental "
          f"VPU work (in-VMEM transposes, sub-8-sublane tiles, concat "
          f"copies) — the named next optimization")
    print(f"model05 train step {full_ms:.3f} ms "
          f"({batch/full_ms*1e3:.0f} imgs/s) -> model05_vpu_bound_frac "
          f"{floor_step*1e3/full_ms:.3f} (the likelihood's irreducible "
          f"transcendental share of the step)")


if __name__ == "__main__":
    main()
