"""Pareto tail-shape diagnostic (k-hat) for the importance-sampled eval.

The 5000-IS test metric (evaluation/harness.py) is an importance-weighted
estimate; its reliability is governed by the tail of the importance-weight
distribution. Vehtari, Simpson, Gelman, Yao & Gabry 2024 (PSIS, JMLR 25) fit
a generalized Pareto distribution (GPD) to the largest weights and read the
shape parameter k-hat as the diagnostic:

- k < 0.5   : weight variance is finite — the estimator converges at CLT
              rates; the bound is trustworthy at this sample count.
- 0.5 - 0.7 : usable but slow convergence.
- k > 0.7   : unreliable — the k-sample bound may sit far below log p(x)
              and more importance samples will move it substantially.

The reference's test loop (/root/reference/models/model01.py:196-204)
reports the bound with no reliability signal at all; this supplies the
standard one, streamed from the same k-chunked scan that computes the bound
(only the top tail of the weights is carried, never [5000, B]).

GPD fitting uses the Zhang & Stephens 2009 profile-posterior-mean method
(the estimator PSIS itself prescribes), on the weight scale — k-hat is
invariant to the overall weight normalisation, so weights enter as
``exp(lw - max lw)``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def tail_size(n_samples: int) -> int:
    """PSIS tail size: ``min(n/5, 3*sqrt(n))`` (Vehtari et al. 2024 §2.2)."""
    return int(min(n_samples / 5.0, 3.0 * math.sqrt(n_samples)))


def fit_gpd_khat(exceedances: np.ndarray) -> float:
    """GPD shape k-hat for positive exceedances over the tail threshold,
    via Zhang & Stephens 2009 (the profile posterior mean PSIS prescribes),
    including PSIS's weak prior shrinking k toward 0.5 with ~10
    observations' weight. Returns NaN when fewer than 5 positive
    exceedances survive — the fit itself cannot say whether that is a
    tie-degenerate (light) or underflow-degenerate (heavy) tail; callers
    with access to the log-weights must decide
    (``khat_from_top_log_weights``)."""
    x = np.sort(np.asarray(exceedances, np.float64))
    x = x[x > 0]  # ties with the threshold carry no tail information
    n = x.size
    if n < 5 or not np.isfinite(x[-1]):
        return float("nan")
    m = 30 + int(math.sqrt(n))
    bs = 1.0 - np.sqrt(m / (np.arange(1, m + 1) - 0.5))
    bs = bs / (3.0 * x[max(int(n / 4 + 0.5) - 1, 0)]) + 1.0 / x[-1]
    ks = np.log1p(-bs[:, None] * x[None, :]).mean(axis=1)  # [m]
    L = n * (np.log(-bs / ks) - ks - 1.0)
    w = 1.0 / np.exp(L - L[:, None]).sum(axis=1)
    b_post = (bs * w).sum() / w.sum()
    k_post = float(np.log1p(-b_post * x).mean())
    # regularise toward 0.5 (PSIS: nuisance-prior with 10 pseudo-obs)
    return (n * k_post + 10.0 * 0.5) / (n + 10.0)


def khat_from_top_log_weights(top_lw: np.ndarray) -> np.ndarray:
    """k-hat per column from the ``M+1`` LARGEST log-weights ``[M+1, B]``
    (the smallest row is the tail threshold; the other M are the tail).

    Degenerate tails are resolved from the log-weights, where the two
    failure modes are distinguishable:

    - (near-)TIES — the whole tail within ~0 nats of the threshold — is
      the lightest possible tail: **-inf** (a perfect proposal).
    - UNDERFLOW — the tail spans so many nats that ``exp(lw - max)``
      flushes most of it to zero — is the heaviest possible tail (a
      handful of samples dominate the estimate by hundreds of nats):
      **+inf**, matching loo/arviz's worst-case convention. Reporting
      these as reliable would invert the diagnostic exactly where it
      matters most (early or mismatched checkpoints).
    """
    top = np.sort(np.asarray(top_lw, np.float64), axis=0)  # ascending
    out = np.empty(top.shape[1], np.float64)
    for j in range(top.shape[1]):
        col = top[:, j]
        scale = col[-1]  # k-hat is normalisation-invariant
        w = np.exp(col - scale)
        exceed = w[1:] - w[0]  # over the (M+1)-th largest weight
        k = fit_gpd_khat(exceed)
        if math.isnan(k):
            spread = col[-1] - col[0]  # nats from threshold to max
            k = float("-inf") if spread <= 1e-8 else float("inf")
        out[j] = k
    return out


def khat_from_log_weights(log_w: np.ndarray) -> np.ndarray:
    """k-hat per column of ``[S]`` or ``[S, B]`` log-weights (the
    non-streaming reference path; the harness streams the top tail)."""
    lw = np.asarray(log_w, np.float64)
    if lw.ndim == 1:
        lw = lw[:, None]
    S = lw.shape[0]
    M = tail_size(S)
    if M < 5:
        return np.full(lw.shape[1], np.nan)
    top = np.sort(lw, axis=0)[-(M + 1):]
    return khat_from_top_log_weights(top)


# -- streaming top-M accumulator (device side, rides the eval scan) -----------


def top_lw_init(batch_shape: tuple, m: int) -> jax.Array:
    """``[m, *batch_shape]`` carry of the largest log-weights seen."""
    return jnp.full((m,) + tuple(batch_shape), -jnp.inf, jnp.float32)


def top_lw_update(carry: jax.Array, log_w: jax.Array) -> jax.Array:
    """Fold a ``[k, B]`` chunk into the running ``[m, B]`` top set."""
    m = carry.shape[0]
    stacked = jnp.concatenate([carry, log_w.astype(carry.dtype)], axis=0)
    top, _ = jax.lax.top_k(stacked.T, m)  # top_k works on the last axis
    return top.T
