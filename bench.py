"""Benchmark: the three hot paths, with MFU against the v5e peak.

Prints ONE JSON line. Headline metric (value/unit, comparable across
rounds): model05 training throughput in imgs/sec with the reference
hyperparameters (batch 128, k=5; /root/reference/models/model05.py).
Additional keys in the same line:

- ``flops_per_img`` / ``tflops_sustained`` / ``mfu``: analytic FLOPs
  accounting (XLA's static count of the compiled train step, cross-checked
  by utils/flops.analytic_model_flops) against the v5e-1 bf16 peak
  (197 TFLOP/s). ``vs_baseline`` IS the MFU — the defensible
  speed-of-light denominator VERDICT r1 item #2 asked for (the reference
  publishes no throughput numbers at all, SURVEY.md §6).
- ``model01_imgs_per_sec``: the MLP/Bernoulli family's train throughput.
- ``model04_imgs_per_sec`` / ``model04_mfu``: the wide-GLU family — the
  >50%-MFU positive control that contextualises model05's
  likelihood-bound plateau (docs/design.md §12b/§12c).
- ``model05_eval5000_imgs_per_sec`` / ``eval_mfu``: the
  5000-importance-sample test evaluation (bf16 conv body + layout-free
  Pallas MoDL kernel — the likelihood math itself stays float32), with its
  own analytic-FLOPs MFU (encoder once + 5000 decoder passes per image).
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.utils.flops import V5E_PEAK_FLOPS, train_step_flops


def setup_scanned_step(name: str, spc: int = 10,
                       compute_dtype: str | None = "float32",
                       model_over: dict | None = None,
                       train_over: dict | None = None,
                       data_over: dict | None = None,
                       donate: bool = True):
    """-> (train_step, state, batch, cfg, flops_per_step) for a zoo entry's
    scanned train step on synthetic data — the ONE timing-harness setup,
    shared with the perf-probe scripts (scripts/objective_cost.py,
    scripts/xla_flag_sweep.py) so methodology fixes land in one place."""
    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.state import create_train_state, make_optimizer
    from vae_mdl_tpu.train.steps import make_multi_train_step

    cfg = experiment(name)
    shape = cfg.model.image_shape
    if shape[2] == 1:
        ds = "synthetic:mnist"
    elif shape[0] == 64:
        ds = "synthetic:celeba"
    else:
        ds = "synthetic:svhn_cropped"
    model_cfg = cfg.model
    if compute_dtype is not None:
        model_cfg = dataclasses.replace(model_cfg, compute_dtype=compute_dtype)
    if model_over:
        model_cfg = dataclasses.replace(model_cfg, **model_over)
    train_cfg = cfg.train
    if train_over:
        train_cfg = dataclasses.replace(train_cfg, **train_over)
    data_cfg = DataConfig(dataset=ds, **(data_over or {}))
    cfg = dataclasses.replace(cfg, data=data_cfg,
                              model=model_cfg, train=train_cfg)
    batch_size = cfg.data.batch_size  # 128, reference parity
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)

    x_f32 = jnp.zeros((batch_size,) + shape, jnp.float32)
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    train_step = make_multi_train_step(model, cfg, tx, n_steps=spc,
                                       donate=donate)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 256, (spc, batch_size) + shape, dtype=np.uint8)
    )

    # analytic count (utils/flops.py, closed-form from the config's
    # conv/dense shapes; fwd + 2x bwd). XLA's AOT cost_analysis on this
    # backend omits convolution FLOPs, so it is NOT used here.
    flops_step = train_step_flops(cfg.model, batch_size)
    return train_step, state, batch, cfg, flops_step


def time_scanned_step(train_step, state, batch, spc: int,
                      batch_size: int, n_iters: int = 5,
                      n_repeats: int = 6) -> np.ndarray:
    """Warm up (2 calls, covers compile), then time ``n_repeats`` blocks of
    ``n_iters`` dispatches each, DISCARDING the first timed block
    (post-warmup clock/queue settling) -> per-block imgs/sec array.

    Single-shot numbers in this environment carry ~10-20% cross-session
    drift (docs/design.md §12b); every reported metric therefore ships a
    median/min/stddev triple (``rate_stats``) so round-over-round deltas
    can be read against the measured noise band instead of an anecdote
    (VERDICT r3 weak #1).

    Sync discipline: each timed block ends with a VALUE FETCH of the last
    step's loss — on the tunnelled backend ``block_until_ready`` can ack a
    dispatch without waiting for device completion (measured,
    ops/pallas/vpu_probe.py), so only a host transfer is a reliable clock
    stop. The loss depends on the whole scanned chain, so fetching it
    fences every dispatch in the block."""
    for _ in range(2):
        state, metrics = train_step(state, batch)
    float(metrics["loss"])

    rates = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = train_step(state, batch)
        float(metrics["loss"])
        rates.append(n_iters * spc * batch_size / (time.perf_counter() - t0))
    return np.asarray(rates[1:])


def rate_stats(prefix: str, rates, digits: int = 1) -> dict:
    """``{prefix: median, prefix_min: worst, prefix_sd: stddev}`` entries —
    the primary key keeps its round-over-round name (the median), min is
    the conservative bound, sd the dispersion."""
    r = np.asarray(rates, float)
    return {
        prefix: round(float(np.median(r)), digits),
        f"{prefix}_min": round(float(r.min()), digits),
        f"{prefix}_sd": round(float(r.std(ddof=1) if r.size > 1 else 0.0),
                              digits),
    }


def _train_throughput(name: str, spc: int = 10, n_iters: int = 5,
                      compute_dtype: str | None = "float32",
                      model_over: dict | None = None,
                      train_over: dict | None = None,
                      n_repeats: int = 6):
    """-> (imgs_per_sec ndarray [n_repeats-1], flops_per_step, batch_size)
    for a model's scanned train step."""
    train_step, state, batch, cfg, flops_step = setup_scanned_step(
        name, spc=spc, compute_dtype=compute_dtype, model_over=model_over,
        train_over=train_over)
    batch_size = cfg.data.batch_size
    imgs = time_scanned_step(train_step, state, batch, spc, batch_size,
                             n_iters=n_iters, n_repeats=n_repeats)
    return imgs, flops_step, batch_size


def _resident_throughput(name: str = "model05", spc: int = 20,
                         n_iters: int = 5, n_data: int = 10000):
    """Device-resident sustained throughput: the whole (synthetic) train
    split lives in HBM and each scanned step gathers its batch by on-device
    random indices — zero steady-state host->device traffic. This isolates
    compute from the dispatch/transfer path (which on tunnelled hosts can
    dominate, docs/design.md §11)."""
    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.state import create_train_state, make_optimizer
    from vae_mdl_tpu.train.steps import make_device_data_train_step

    cfg = experiment(name)
    shape = cfg.model.image_shape
    ds = "synthetic:mnist" if shape[2] == 1 else "synthetic:svhn_cropped"
    cfg = dataclasses.replace(cfg, data=DataConfig(dataset=ds))
    batch_size = cfg.data.batch_size
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((batch_size,) + shape, jnp.float32)
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    step = make_device_data_train_step(model, cfg, tx, n_steps=spc,
                                       n_data=n_data, donate=False)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, (n_data,) + shape, dtype=np.uint8))

    return time_scanned_step(step, state, data, spc, batch_size,
                             n_iters=n_iters)


def _eval_throughput(batch_size: int = 128, k_chunk: int = 200,
                     n_samples: int = 5000, n_timed: int = 3) -> np.ndarray:
    """model05 5000-IS eval imgs/sec: bf16 conv body + Pallas MoDL kernel.
    Times ``n_timed`` evaluator calls (after one warmup + one discarded
    first timed call) -> per-call imgs/sec array.

    batch 128 (round 5): 128-aligned batches engage the lane-tiled
    kernel on the bf16 production path (+19% vs the standard kernel at
    this exact shape, design.md §12o) — and match evaluate_llh's default.
    k_chunk 200: the r5 sweep's best point (105.2 vs 102.9 imgs/s at 100;
    scripts/eval_kchunk_sweep.py). The HARNESS default stays 100 — it
    must also serve the f32 parity path, whose 4-byte boundary tensor at
    200*128 lanes doubles the HBM high-water mark for a ~2% win."""
    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.evaluation.harness import make_batch_evaluator
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.state import create_train_state

    cfg = experiment("model05")
    # production eval config: bf16 conv body + Pallas kernel + bf16
    # likelihood boundary (+29% measured on this path, design.md §12n —
    # the k_chunk x batch parameter tensor dominates the evaluator's HBM
    # traffic); parity evals (cli parity/eval defaults) stay f32
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:svhn_cropped"),
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                  use_pallas=True,
                                  likelihood_io_dtype="bfloat16"),
    )
    model = build_model(cfg.model)
    x0 = jnp.zeros((16, 32, 32, 3), jnp.float32)
    state = create_train_state(model, cfg.train, x0, cfg.model.n_samples)
    evaluator = make_batch_evaluator(model, cfg, n_samples, k_chunk)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 256, (batch_size, 32, 32, 3), dtype=np.uint8)
    )
    llh = evaluator(state.params, batch, jax.random.PRNGKey(0))  # noqa: F841
    float(llh[0])  # value fetch = the only reliable sync on this relay
    rates = []
    for r in range(1 + n_timed):  # first timed call discarded
        t0 = time.perf_counter()
        llh = evaluator(state.params, batch, jax.random.PRNGKey(1 + r))
        float(llh[0])
        rates.append(batch_size / (time.perf_counter() - t0))
    return np.asarray(rates[1:])


def _vpu_floor(step_seconds: float):
    """(floor_seconds, frac): the MoDL likelihood's transcendental VPU
    floor per optimizer step — analytic op census priced at live-measured
    per-op rates (utils.flops.mdl_transcendental_census x
    ops/pallas/vpu_probe) — against the measured step time. The
    falsifiable denominator for the model05 perf-floor claim
    (VERDICT r3 item #1; methodology: scripts/vpu_roofline.py,
    results docs/design.md §12m)."""
    if jax.default_backend() != "tpu":
        return None, None
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.ops.pallas.vpu_probe import (
        measure_rates,
        vpu_floor_seconds,
    )
    from vae_mdl_tpu.utils.flops import mdl_train_transcendentals

    cfg = experiment("model05")
    counts = mdl_train_transcendentals(cfg.model, cfg.data.batch_size)
    floor = vpu_floor_seconds(counts, measure_rates())
    return floor, floor / step_seconds


def main():
    r05, flops_step, batch = _train_throughput("model05")
    r05_bf16, _, _ = _train_throughput("model05", compute_dtype="bfloat16")
    # bf16 likelihood-boundary: the single biggest model05 lever found by
    # the §12n structural decomposition (the mixture cost is ~all data
    # movement; halving the custom-call boundary tensor bought +9%)
    r05_bf16io, _, _ = _train_throughput(
        "model05", model_over={"likelihood_io_dtype": "bfloat16"})
    # full production mode: bf16 conv body + bf16 boundary + batch-lanes
    # kernel (auto-dispatched, prefer_batch_lanes) — +42% vs the f32
    # parity default, measured (design.md §12n)
    r05_prod, _, _ = _train_throughput(
        "model05", compute_dtype="bfloat16",
        model_over={"likelihood_io_dtype": "bfloat16"})
    # spc=100: at MLP speeds a 10-step scan is ~6 ms/dispatch — the same
    # order as the relay's per-dispatch jitter, which is what made
    # BENCH_r04's model01 metric read 70k +- 27k (sd 39% of median).
    # 100-step scans amortise it: 943k median, sd ~3% (design.md §12o).
    r01, _, _ = _train_throughput("model01", spc=100)
    # model04: the wide-GLU family — the positive control showing the
    # machine sustains >50% MFU when the likelihood is cheap
    # (docs/design.md §12b); its MFU contextualises model05's plateau.
    r04, flops04, batch04 = _train_throughput("model04")
    r05_res = _resident_throughput("model05")
    r_eval = _eval_throughput()

    imgs05 = float(np.median(r05))
    flops_per_img = flops_step / batch
    tflops = imgs05 * flops_per_img / 1e12
    mfu = tflops * 1e12 / V5E_PEAK_FLOPS

    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.utils.flops import forward_flops

    eval_flops_img = forward_flops(experiment("model05").model, batch=1,
                                   n_samples=5000)
    eval_mfu = float(np.median(r_eval)) * eval_flops_img / V5E_PEAK_FLOPS

    # 64x64 CelebA-scale bidirectional ladder (capability beyond the
    # reference's 32x32 families) — train throughput + its own MFU, at the
    # config's default dtype (bf16 body, f32 heads)
    r_bl, flops_bl, batch_bl = _train_throughput("biladder_celeba", spc=5,
                                                 n_iters=3,
                                                 compute_dtype=None)
    bl_mfu = float(np.median(r_bl)) * (flops_bl / batch_bl) / V5E_PEAK_FLOPS

    out = {
        "metric": "model05_train_throughput",
        "value": round(imgs05, 1),
        "unit": "imgs/sec",
        # the reference publishes NO throughput numbers (SURVEY.md
        # §6); MFU against the v5e bf16 peak is the defensible
        # denominator, so vs_baseline IS the mfu key
        "vs_baseline": round(mfu, 4),
        "vs_baseline_is": "mfu",
        # every *_imgs_per_sec key is the MEDIAN of >= 3 timed repeats
        # (first discarded); *_min / *_sd give the worst repeat and the
        # dispersion — read round-over-round deltas against these bands
        "timing": "median of repeats; see *_min/*_sd per metric",
        "flops_per_img": round(flops_per_img / 1e6, 2),
        "flops_per_img_unit": "MFLOP",
        "tflops_sustained": round(tflops, 2),
        "mfu": round(mfu, 4),
        "peak_tflops": V5E_PEAK_FLOPS / 1e12,
    }
    out.update(rate_stats("model05_imgs_per_sec", r05))
    out.update(rate_stats("model05_bf16_imgs_per_sec", r05_bf16))
    out.update(rate_stats("model05_bf16io_imgs_per_sec", r05_bf16io))
    out.update(rate_stats("model05_bf16_full_imgs_per_sec", r05_prod))
    out.update(rate_stats("model05_resident_imgs_per_sec", r05_res))
    out["model05_resident_mfu"] = round(
        float(np.median(r05_res)) * flops_per_img / V5E_PEAK_FLOPS, 4)
    out.update(rate_stats("model01_imgs_per_sec", r01))
    out.update(rate_stats("model04_imgs_per_sec", r04))
    out["model04_mfu"] = round(
        float(np.median(r04)) * (flops04 / batch04) / V5E_PEAK_FLOPS, 4)
    out.update(rate_stats("model05_eval5000_imgs_per_sec", r_eval))
    out["eval_mfu"] = round(eval_mfu, 4)
    floor_s, frac = _vpu_floor(batch / imgs05)
    if floor_s is not None:
        out["model05_vpu_floor_ms"] = round(floor_s * 1e3, 3)
        out["model05_vpu_bound_frac"] = round(frac, 4)
    out.update(rate_stats("biladder_celeba64_imgs_per_sec", r_bl))
    out["biladder_celeba64_mfu"] = round(bl_mfu, 4)

    # END-OF-RUN DRIFT SENTINEL (round 5): re-measure the first metric's
    # config after everything else ran. BENCH_r04's bf16 metrics sat ~5
    # sigma below the committed same-session A/Bs while its f32 ones
    # matched — cross-session/driver-environment drift the per-metric sd
    # cannot see. If the recheck moves >5% off the opening measurement,
    # the whole capture is flagged: read every metric against that.
    r05_re, _, _ = _train_throughput("model05", n_repeats=4)
    out.update(rate_stats("model05_f32_recheck_imgs_per_sec", r05_re))
    drift = abs(float(np.median(r05_re)) - imgs05) / imgs05
    out["session_drift_frac"] = round(drift, 4)
    out["session_stable"] = bool(drift <= 0.05)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
