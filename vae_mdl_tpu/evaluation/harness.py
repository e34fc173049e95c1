"""5000-importance-sample test evaluation — the north-star metric.

The reference's ``test`` loops *eagerly* over 10,000 single images, each with
one [5000, 1, ...] forward pass (/root/reference/models/model01.py:196-204) —
sequential, unbatched, memory-bound. This harness is the TPU redesign
(SURVEY.md §7 step 9):

- images are processed in BATCHES;
- the k=5000 importance samples are split into k-chunks that fit in HBM and
  folded into a STREAMING logsumexp (ops.math.streaming_logmeanexp_*) — the
  numerically exact reduction, never materialising [5000, B, H, W, C];
- one jitted chunk step; the k-chunk loop is a ``lax.scan`` over folded RNG
  keys, so the whole per-batch evaluation is a single XLA program;
- under a mesh the batch shards over the ``data`` axis and the chunk's
  sample axis over ``sample`` — the logsumexp combine is GSPMD's problem.

Returns (mean_llh, per_image_llh, metrics) where metrics includes bits/dim:
bpd = -llh / (log 2 * prod(image_shape)) (models/loss.py:42-43).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.config import ExperimentConfig
from vae_mdl_tpu.models.objective import log_weights
from vae_mdl_tpu.models.vae import prior_for


def effective_chunks(n_samples: int, k_chunk: int) -> Tuple[int, int]:
    """Clamp ``k_chunk`` to a divisor of ``n_samples`` so the scan covers
    exactly ``n_samples``; returns ``(k_chunk, n_chunks)``."""
    k_chunk = min(k_chunk, n_samples)
    while n_samples % k_chunk:
        k_chunk -= 1
    return k_chunk, n_samples // k_chunk


def make_batch_evaluator(
    model,
    cfg: ExperimentConfig,
    n_samples: int = 5000,
    k_chunk: int = 100,
    mesh=None,
    with_khat: bool = False,
    with_curve: bool = False,
):
    """Returns jitted ``(params, uint8/float batch, key) -> llh [B]``.

    ``with_khat=True`` additionally returns the ``M+1`` largest log-weights
    per image (``[M+1, B]``, M = PSIS tail size) streamed from the same
    scan — the input to the Pareto reliability diagnostic
    (evaluation/psis.py).

    ``with_curve=True`` additionally returns the IS-convergence curve: the
    partial bound after every k-chunk (``[n_chunks, B]``, row j = the
    k=(j+1)*k_chunk bound over the SAME weight stream — finalize is O(B),
    so the curve costs one log per chunk, nothing more). Extras are
    appended in the order ``(llh[, top_lw][, curve])``."""
    k_chunk, n_chunks = effective_chunks(n_samples, k_chunk)
    prior = prior_for(cfg.model)
    binarize_input = (
        cfg.model.likelihood == "bernoulli" and cfg.data.dynamic_binarization
    )
    if with_khat:
        from vae_mdl_tpu.evaluation.psis import (
            tail_size,
            top_lw_init,
            top_lw_update,
        )

        if tail_size(n_samples) < 5:
            raise ValueError(
                f"khat needs a tail of >= 5 weights to fit the GPD; "
                f"n_samples={n_samples} gives tail_size="
                f"{tail_size(n_samples)}. Use n_samples >= 25 or drop "
                "the diagnostic."
            )
        n_top = tail_size(n_samples) + 1  # M exceedances + the threshold

    def batch_llh(params, batch, key):
        x = batch.astype(jnp.float32)
        if jnp.issubdtype(batch.dtype, jnp.integer):
            x = x / 255.0
        if binarize_input:
            # ONE fixed draw per evaluation — identical across k-chunks
            # (the reference's seed-42 test binarization,
            # models/model01.py:29-33)
            x = jax.random.bernoulli(jax.random.fold_in(key, 0), x).astype(
                jnp.float32
            )

        keys = jax.random.split(jax.random.fold_in(key, 1), n_chunks)

        from vae_mdl_tpu.ops.math import (
            streaming_logmeanexp_finalize,
            streaming_logmeanexp_init,
            streaming_logmeanexp_update,
        )

        def chunk(carry, k_key):
            lme, top = carry
            Qs, Ps, pxz = model.apply(params, x, k_chunk, rngs={"sample": k_key})
            log_w = log_weights(prior, Qs, Ps, pxz, x)  # [k_chunk, B]
            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                log_w = jax.lax.with_sharding_constraint(
                    log_w, jax.sharding.NamedSharding(mesh, P("sample", "data"))
                )
            lme = streaming_logmeanexp_update(lme, log_w, axis=0)
            if top is not None:
                top = top_lw_update(top, log_w)
            y = streaming_logmeanexp_finalize(lme) if with_curve else None
            return (lme, top), y

        init = (
            streaming_logmeanexp_init((x.shape[0],)),
            top_lw_init((x.shape[0],), n_top) if with_khat else None,
        )
        (state, top), curve = jax.lax.scan(chunk, init, keys)
        llh = streaming_logmeanexp_finalize(state)
        out = (llh,)
        if with_khat:
            out += (top,)
        if with_curve:
            out += (curve,)
        return out if len(out) > 1 else llh

    return jax.jit(batch_llh)


def evaluate_llh(
    model,
    cfg: ExperimentConfig,
    params,
    test_images: np.ndarray,
    n_samples: int = 5000,
    k_chunk: int = 100,
    # 128-aligned batches let the bf16-boundary production eval engage the
    # lane-tiled MoDL kernel (+19% measured, design.md §12o); the f32
    # parity path is indifferent to the batch size. 10,000 % 128 != 0 is
    # handled by the padded tail batch below.
    batch_size: int = 128,
    seed: int = 0,
    mesh=None,
    progress: bool = True,
    khat: bool = False,
    k_curve: bool = False,
) -> Tuple[float, np.ndarray, dict]:
    """Full test-set 5000-IS log-likelihood (reference README's −85.02).

    ``khat=True`` also computes the per-image PSIS Pareto-shape diagnostic
    (evaluation/psis.py) from the streamed weight tails and reports
    ``khat_mean`` / ``khat_max`` / ``khat_frac_gt_07`` in the metrics dict
    (k-hat > 0.7 marks images whose importance-weighted bound is
    unreliable at this sample count).

    ``k_curve=True`` also reports the IS-convergence curve — the test-set
    mean bound at every k-chunk boundary of the SAME weight stream
    (``metrics["k_curve_ks"]`` / ``metrics["k_curve_llh"]``; the last
    entry equals the returned mean). The bound is monotone in k in
    expectation, so a curve still visibly climbing at the final k says
    the quoted number is loose at this sample count — the convergence
    readout to pair with the k-hat tail diagnostic. Costs one O(B)
    finalize per chunk — negligible against the k-chunk decoder pass.

    Multi-process runs SHARD THE WORK: batches are strided across processes
    (batch i computed by process ``i % process_count``) and the per-image
    LLHs are allgathered, so P hosts evaluate the test set ~P times faster.
    Per-batch RNG keys derive from the batch index, making the sharded
    result bit-identical to a single-process run. Within each process the
    batch runs on the local device(s); the cross-process mesh (if any) is
    not used for eval — ICI-scale sharding of one batch pays collective
    latency the batch-striding avoids entirely.
    """
    n_proc = jax.process_count()
    p_idx = jax.process_index()
    if n_proc > 1:
        mesh = None  # batch-striding replaces cross-process batch sharding
    if mesh is not None:
        # batches shard over the data axis; keep them evenly divisible
        d_axis = mesh.shape["data"]
        batch_size = max(d_axis, batch_size // d_axis * d_axis)
    evaluator = make_batch_evaluator(model, cfg, n_samples, k_chunk, mesh,
                                     with_khat=khat, with_curve=k_curve)
    key = jax.random.PRNGKey(seed)
    if khat:
        from vae_mdl_tpu.evaluation.psis import khat_from_top_log_weights

    def run_batch(batch, batch_key):
        """-> (llh [B], khat [B]|None, curve [n_chunks, B]|None), host-side."""
        out = evaluator(params, batch, batch_key)
        if not isinstance(out, tuple):
            out = (out,)
        llh, rest = np.asarray(out[0]), list(out[1:])
        kh = (khat_from_top_log_weights(np.asarray(rest.pop(0)))
              if khat else None)
        curve = np.asarray(rest.pop(0), np.float64) if k_curve else None
        return llh, kh, curve

    n = len(test_images)
    n_batches = n // batch_size
    leftover = n - n_batches * batch_size

    indices = range(n_batches)
    if progress and p_idx == 0:
        try:
            from tqdm import tqdm

            indices = tqdm(indices, desc=f"{n_samples}-IS eval")
        except ImportError:
            pass

    per_image = np.zeros(n, np.float32)
    per_image_khat = np.zeros(n, np.float32) if khat else None
    n_chunks = effective_chunks(n_samples, k_chunk)[1]
    # per-chunk SUM of per-image partial bounds, accumulated in float64
    curve_sum = np.zeros(n_chunks, np.float64) if k_curve else None
    local_batches = 0
    for i in indices:
        if i % n_proc != p_idx:
            continue
        batch = jnp.asarray(test_images[i * batch_size:(i + 1) * batch_size])
        if mesh is not None:
            from vae_mdl_tpu.parallel.mesh import shard_batch

            batch = shard_batch(mesh, batch)
        sl = slice(i * batch_size, (i + 1) * batch_size)
        per_image[sl], kh, cv = run_batch(batch, jax.random.fold_in(key, i))
        if khat:
            per_image_khat[sl] = kh
        if k_curve:
            curve_sum += cv.sum(axis=1)
        local_batches += 1
    if leftover and n_batches % n_proc == p_idx:
        # pad the tail batch to the static shape, then drop the padding
        tail = test_images[n_batches * batch_size:]
        reps = -(-batch_size // leftover)
        pad = np.concatenate([tail] * reps)[:batch_size]
        pad = jnp.asarray(pad)
        if mesh is not None:
            from vae_mdl_tpu.parallel.mesh import shard_batch

            pad = shard_batch(mesh, pad)
        out, kh, cv = run_batch(pad, jax.random.fold_in(key, n_batches))
        per_image[n_batches * batch_size:] = out[:leftover]
        if khat:
            per_image_khat[n_batches * batch_size:] = kh[:leftover]
        if k_curve:
            curve_sum += cv[:, :leftover].sum(axis=1)
        local_batches += 1

    if n_proc > 1:
        # disjoint slots: summing the allgathered vectors reassembles the
        # full per-image result identically on every process
        from jax.experimental import multihost_utils

        per_image = np.asarray(
            multihost_utils.process_allgather(jnp.asarray(per_image))
        ).sum(axis=0)
        if khat:
            per_image_khat = np.asarray(
                multihost_utils.process_allgather(jnp.asarray(per_image_khat))
            ).sum(axis=0)
        if k_curve:
            # disjoint batches contribute disjoint per-image sums; gather
            # without an f32 downcast (jnp.asarray on a float64 array
            # silently casts with x64 off) by splitting each f64 sum into
            # exactly-representable hi/lo float32 parts and re-summing in
            # float64 after the gather
            hi = curve_sum.astype(np.float32)
            lo = (curve_sum - hi.astype(np.float64)).astype(np.float32)
            gathered = np.asarray(
                multihost_utils.process_allgather(
                    jnp.stack([jnp.asarray(hi), jnp.asarray(lo)])
                ),
                np.float64,
            )  # [P, 2, n_chunks]
            curve_sum = gathered.sum(axis=(0, 1))

    # float64 accumulation: 10k float32 values of ~1e2 magnitude can round
    # at the 1e-2 level under f32 summation — material for a parity metric
    # quoted to two decimals (−85.02)
    mean_llh = float(per_image.mean(dtype=np.float64))
    h, w, c = cfg.model.image_shape
    bpd = -mean_llh / (math.log(2.0) * h * w * c)
    metrics = {
        "llh": mean_llh,
        "bpd": bpd,
        "n_samples": n_samples,
        "local_batches": local_batches,
    }
    if khat:
        finite = per_image_khat[np.isfinite(per_image_khat)]
        # ±inf entries are degenerate tails (-inf: equal weights; +inf:
        # underflow-heavy, see psis.khat_from_top_log_weights) — the mean
        # covers the fittable images only and is NaN when none exist
        # (never an ±inf posing as a mean); the explicit degenerate
        # counts carry the rest of the story
        metrics["khat_mean"] = (
            float(finite.mean()) if finite.size else float("nan"))
        metrics["khat_max"] = float(per_image_khat.max())
        metrics["khat_frac_gt_07"] = float((per_image_khat > 0.7).mean())
        metrics["khat_n_underflow"] = int((per_image_khat == np.inf).sum())
        metrics["khat_n_ties"] = int((per_image_khat == -np.inf).sum())
        metrics["khat_per_image"] = per_image_khat
    if k_curve:
        k_eff = effective_chunks(n_samples, k_chunk)[0]
        metrics["k_curve_ks"] = np.arange(1, n_chunks + 1) * k_eff
        metrics["k_curve_llh"] = curve_sum / n
    return mean_llh, per_image, metrics
