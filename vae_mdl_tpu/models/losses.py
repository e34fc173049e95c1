"""IWAE / ELBO objectives: single-layer, two-layer, and generic L-layer.

Parity sources:
- ``iwae_loss`` / ``elbo_loss``: /root/reference/models/loss.py:26-70
- two-stochastic-layer spelled-out bound: /root/reference/models/model06.py:38-72
- generic L-layer bound over ``DistributionTuple`` collections:
  /root/reference/tests/test_hierarchical_setup.py:13-58

All log-probs are reduced over each distribution's explicit event axes —
the reference's ``axes`` monkey-patch contract, made structural.

TPU notes: each term is a pure-VPU reduction that XLA fuses with the decoder;
the only cross-sample op is ``logmeanexp`` over the leading importance-sample
axis (axis 0), which stays local per batch element and shards trivially over
both the data and the k mesh axes.
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from vae_mdl_tpu.distributions import DistributionTuple
from vae_mdl_tpu.ops.math import logmeanexp

_LOG2 = math.log(2.0)

Metrics = Dict[str, jax.Array]


def effective_sample_size(log_w: jax.Array, axis: int = 0) -> jax.Array:
    """Normalised importance-weight ESS in [1, k]: (sum w)^2 / sum w^2.

    A weight-degeneracy diagnostic for the IWAE bound (not in the
    reference); ESS ~ 1 means one sample dominates the bound.
    """
    lse1 = jax.scipy.special.logsumexp(log_w, axis=axis)
    lse2 = jax.scipy.special.logsumexp(2.0 * log_w, axis=axis)
    return jnp.exp(2.0 * lse1 - lse2)


def _reduce(dist, value: jax.Array, axes=None) -> jax.Array:
    if axes is None:
        return dist.reduced_log_prob(value)
    return jnp.sum(dist.log_prob(value), axis=tuple(axes))


def _bits_per_dim(iwae_elbo: jax.Array, x: jax.Array) -> jax.Array:
    """-elbo / (log 2 * dims(x)) over ALL non-batch dims of the observation
    (reference formula models/loss.py:42; counting from x rather than from
    the event axes keeps per-pixel likelihoods like pmdl correct — their
    event axes index the log-prob array, not x)."""
    n_dims = 1.0
    for s in x.shape[1:]:
        n_dims *= s
    return -iwae_elbo / (_LOG2 * n_dims)


def iwae_loss(x, z, pz, qzx, pxz, beta: float = 1.0) -> Tuple[jax.Array, Metrics]:
    """Importance-weighted bound for one stochastic layer.

    ``z``: latent samples with leading importance-sample axis ``[k, B, ...]``.
    ``pz``/``qzx``/``pxz``: distributions exposing ``log_prob`` + ``event_axes``.
    Parity: /root/reference/models/loss.py:26-55 (including the metrics dict).
    """
    lpz = _reduce(pz, z)
    lqzx = _reduce(qzx, z)
    lpxz = _reduce(pxz, x)

    log_w = lpxz + beta * (lpz - lqzx)

    # logmeanexp over importance samples, mean over batch
    iwae_elbo = jnp.mean(logmeanexp(log_w, axis=0), axis=-1)
    bpd = _bits_per_dim(iwae_elbo, x)
    kl = -jnp.mean(lpz - lqzx, axis=0)

    return -iwae_elbo, {
        "iwae_elbo": iwae_elbo,
        "bpd": bpd,
        "lpxz": lpxz,
        "lqzx": lqzx,
        "lpz": lpz,
        "kl": kl,
        "ess": effective_sample_size(log_w),
    }


def elbo_loss(x, z, pz, qzx, pxz) -> Tuple[jax.Array, Metrics]:
    """Plain ELBO: mean over samples instead of logmeanexp.
    Parity: /root/reference/models/loss.py:58-70."""
    lpz = _reduce(pz, z)
    lqzx = _reduce(qzx, z)
    lpxz = _reduce(pxz, x)
    log_w = lpxz + (lpz - lqzx)
    elbo = jnp.mean(jnp.mean(log_w, axis=0), axis=-1)
    return -elbo, {"loss": -elbo, "lpxz": lpxz}


def two_layer_iwae_loss(
    x, pz, qz1x, qz2z1, pz1z2, pxz1, beta: float = 1.0
) -> Tuple[jax.Array, Metrics]:
    """Spelled-out two-stochastic-layer bound.

    Arguments are ``DistributionTuple``s except ``pz`` (top prior
    distribution). Parity: /root/reference/models/model06.py:38-72, including
    per-layer KL metrics (the reference hardcodes beta=1).
    """
    lqz2z1 = _reduce(qz2z1.dist, qz2z1.z, qz2z1.axes)
    lqz1x = _reduce(qz1x.dist, qz1x.z, qz1x.axes)

    lpz2 = _reduce(pz, qz2z1.z)
    lpz1z2 = _reduce(pz1z2.dist, qz1x.z, qz1x.axes)
    lpxz = _reduce(pxz1.dist, x, pxz1.axes)

    log_w = lpxz + beta * ((lpz2 - lqz2z1) + (lpz1z2 - lqz1x))

    iwae_elbo = jnp.mean(logmeanexp(log_w, axis=0), axis=-1)
    bpd = _bits_per_dim(iwae_elbo, x)

    kl1 = -jnp.mean(lpz1z2 - lqz1x, axis=0)
    kl2 = -jnp.mean(lpz2 - lqz2z1, axis=0)

    return -iwae_elbo, {
        "iwae_elbo": iwae_elbo,
        "bpd": bpd,
        "lpxz": lpxz,
        "lqz1x": lqz1x,
        "lqz2z1": lqz2z1,
        "lpz2": lpz2,
        "lpz1z2": lpz1z2,
        "kl1": kl1,
        "kl2": kl2,
        "ess": effective_sample_size(log_w),
    }


def hierarchical_iwae_loss(
    x: jax.Array,
    Qs: Union[Dict[int, DistributionTuple], Sequence[DistributionTuple]],
    Ps: Union[Dict[int, DistributionTuple], Sequence[DistributionTuple]],
    pxz: DistributionTuple,
    prior: DistributionTuple,
    beta: float = 1.0,
) -> Tuple[jax.Array, Metrics]:
    """Generic L-layer importance-weighted bound.

    Layer convention (parity with
    /root/reference/tests/test_hierarchical_setup.py:13-58):

    - ``Qs[i]``, i = 1..L: inference distributions q(z_i | ·) with their
      samples attached. ``Qs[L]`` is the top layer.
    - ``Ps[i]``, i = 1..L-1: generative conditionals p(z_i | z_{i+1}); the
      sample slot is unused (each is evaluated at ``Qs[i]``'s sample).
    - ``pxz``: observation model p(x | z_1) as a DistributionTuple.
    - ``prior``: top prior p(z_L) as a DistributionTuple (axes may differ
      from ``Qs[L]``'s, as in the reference).

    Accepts dicts keyed 1..L or plain sequences [q1, ..., qL] / [p1, ...].
    """
    if not isinstance(Qs, dict):
        Qs = {i + 1: q for i, q in enumerate(Qs)}
    if not isinstance(Ps, dict):
        Ps = {i + 1: p for i, p in enumerate(Ps)}

    top = max(Qs.keys())

    # top layer against the prior
    zq_top = Qs[top]
    log_p = _reduce(prior.dist, zq_top.z, prior.axes)
    log_q = _reduce(zq_top.dist, zq_top.z, zq_top.axes)
    kls: List[jax.Array] = [log_p - log_q]

    # intermediate layers 1 .. L-1
    for i in range(1, top):
        q = Qs[i]
        p = Ps[i]
        log_q = _reduce(q.dist, q.z, q.axes)
        log_p = _reduce(p.dist, q.z, p.axes)
        kls.append(log_p - log_q)

    lpxz = _reduce(pxz.dist, x, pxz.axes)

    log_w = lpxz + beta * sum(kls)

    iwae_elbo = jnp.mean(logmeanexp(log_w, axis=0), axis=-1)
    bpd = _bits_per_dim(iwae_elbo, x)

    return -iwae_elbo, {
        "iwae_elbo": iwae_elbo,
        "bpd": bpd,
        "lpxz": lpxz,
        "kl": [-jnp.mean(k, axis=0) for k in kls],
        "ess": effective_sample_size(log_w),
    }
