"""Numerical primitives shared across losses and evaluation.

TPU notes: these are small VPU-bound reductions; XLA fuses them into the
surrounding computation. The streaming logmeanexp is the building block of the
k-chunked importance-sampling evaluator (the reference evaluates 5000
importance samples in one tensor, /root/reference/models/model01.py:196-204,
which does not fit on-chip; we stream over k-chunks instead).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def logmeanexp(log_w: jax.Array, axis: int) -> jax.Array:
    """Numerically stable log(mean(exp(log_w))) over ``axis``.

    Parity: /root/reference/utils/utils.py:9-11 (max-shifted formulation).
    """
    m = jax.lax.stop_gradient(jnp.max(log_w, axis=axis, keepdims=True))
    out = jnp.log(jnp.mean(jnp.exp(log_w - m), axis=axis)) + jnp.squeeze(m, axis=axis)
    return out


def log_prob_from_logits(logits: jax.Array, axis: int = -1) -> jax.Array:
    """log softmax: logits minus logsumexp over ``axis``."""
    return logits - jax.scipy.special.logsumexp(logits, axis=axis, keepdims=True)


# --- streaming logmeanexp over importance-sample chunks -----------------------
#
# Maintains (running_max m, running_sum s, count n) such that
#   logsumexp(seen) = m + log(s)       with s = sum(exp(seen - m))
# Combining chunks only needs elementwise ops, so the 5000-sample eval can run
# in k-chunks that fit in HBM, sharded over devices.


def streaming_logmeanexp_init(shape, dtype=jnp.float32):
    m = jnp.full(shape, -jnp.inf, dtype=dtype)
    s = jnp.zeros(shape, dtype=dtype)
    n = jnp.zeros((), dtype=jnp.int32)
    return m, s, n


def streaming_logmeanexp_update(state, log_w_chunk: jax.Array, axis: int = 0):
    """Fold a chunk of log-weights (reduced over ``axis``) into the state."""
    m, s, n = state
    chunk_max = jnp.max(log_w_chunk, axis=axis)
    new_m = jnp.maximum(m, chunk_max)
    # rescale previous sum to the new max; exp(-inf - finite) == 0 handles init
    s = s * jnp.exp(jnp.where(jnp.isfinite(m), m - new_m, -jnp.inf))
    # guard the new terms the same way: where new_m is still -inf, every
    # weight in the chunk is -inf too and exp(-inf - -inf) would be NaN —
    # the logsumexp convention is a zero contribution (result stays -inf)
    new_m_b = jnp.expand_dims(new_m, axis)
    shifted = jnp.where(jnp.isfinite(new_m_b), log_w_chunk - new_m_b, -jnp.inf)
    s = s + jnp.sum(jnp.exp(shifted), axis=axis)
    n = n + log_w_chunk.shape[axis]
    return new_m, s, n


def streaming_logmeanexp_finalize(state):
    m, s, n = state
    return m + jnp.log(s) - jnp.log(n.astype(s.dtype))
