"""Posterior diagnostics: the IWAE paper's "active units" statistic.

Burda et al. 2016 (§5.2) measure latent-usage as

    AU = #{ u : Cov_x( E_{q(z_u|x)}[z_u] ) > 0.01 }

— the number of latent dimensions whose posterior mean actually varies
with the input. It is the companion metric to the log-likelihood the
reference reproduces (−85.02, /root/reference/README.md:11-13) and the
standard posterior-collapse diagnostic for the hierarchical families this
framework adds; the reference computes nothing like it.

TPU notes: one jitted ``encode`` per batch — for the bottom-up families
that is posterior means only (no decoder); the bidirectional ladder's
``encode`` runs its full forward pass by construction
(models/bidirectional.py). Variances accumulate on host as streaming
sum/sumsq — a cancellation-prone form at f32, made safe here by float64
accumulation (posterior means are O(1), test sets are O(1e4) images).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.train.steps import preprocess


def active_units(
    model,
    cfg,
    params,
    images: np.ndarray,
    batch_size: int = 500,
    threshold: float = 0.01,
    seed: int = 0,
) -> Dict[str, object]:
    """Per-layer active-unit counts over a test set.

    ``images``: uint8 or float array ``[N, H, W, C]``; only the leading
    ``N // batch_size * batch_size`` images are used (one static batch
    shape keeps this a single compiled program).

    Returns ``{"au": [per-layer], "n_dims": [per-layer], "au_total": int,
    "variance": [per-layer np arrays of Cov_x(E_q[z_u|x])]}`` — layer 1
    first (the layer nearest the observation).
    """
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    n_batches = len(images) // batch_size
    if n_batches == 0:
        raise ValueError(
            f"active_units needs at least one full batch "
            f"({len(images)} images < batch_size={batch_size})")

    @jax.jit
    def post_means(params, batch, key):
        # same input pipeline the model evaluates under (dequantise +
        # fixed-draw binarisation for the bernoulli/mnist family)
        x = preprocess(cfg, batch, jax.random.fold_in(key, 0))
        Qs = model.apply(
            params, x, 1, rngs={"sample": jax.random.fold_in(key, 1)},
            method="encode",
        )
        out = []
        for q in Qs:
            m = q.dist.mean()
            if m.shape[0] != x.shape[0]:  # leading k=1 sample axis
                m = m[0]
            out.append(m.reshape(m.shape[0], -1).astype(jnp.float32))
        return out

    key = jax.random.PRNGKey(seed)
    sums: List[np.ndarray] = []
    sumsqs: List[np.ndarray] = []
    n = 0
    for i in range(n_batches):
        batch = jnp.asarray(images[i * batch_size:(i + 1) * batch_size])
        means = post_means(params, batch, jax.random.fold_in(key, i))
        n += batch_size
        for li, m in enumerate(means):
            m64 = np.asarray(m, np.float64)
            if i == 0:
                sums.append(m64.sum(axis=0))
                sumsqs.append((m64 * m64).sum(axis=0))
            else:
                sums[li] += m64.sum(axis=0)
                sumsqs[li] += (m64 * m64).sum(axis=0)

    variances = [sq / n - (s / n) ** 2 for s, sq in zip(sums, sumsqs)]
    au = [int((v > threshold).sum()) for v in variances]
    return {
        "au": au,
        "n_dims": [int(v.size) for v in variances],
        "au_total": int(sum(au)),
        "variance": variances,
    }
