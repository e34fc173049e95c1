"""Objective dispatch: one entry point from a VAE forward pass to the bound.

Picks the exact-parity loss for each stochastic depth:
  L == 1 -> iwae_loss            (/root/reference/models/loss.py:26-55)
  L == 2 -> two_layer_iwae_loss  (/root/reference/models/model06.py:38-72,
                                  per-layer kl1/kl2 metrics preserved)
  L >= 3 -> hierarchical_iwae_loss (the generic ladder the reference only
                                  prototyped in tests/test_hierarchical_setup.py)
"""
from __future__ import annotations

from typing import Tuple

import jax

from vae_mdl_tpu.distributions import DistributionTuple, Normal
from vae_mdl_tpu.models.losses import (
    Metrics,
    _bits_per_dim,
    _reduce,
    hierarchical_iwae_loss,
    iwae_loss,
    two_layer_iwae_loss,
)


def log_weights(
    prior: Normal,
    Qs: Tuple[DistributionTuple, ...],
    Ps: Tuple[DistributionTuple, ...],
    pxz: DistributionTuple,
    x: jax.Array,
    beta: float = 1.0,
) -> jax.Array:
    """Unnormalised importance log-weights ``[k, B]`` for any stochastic
    depth — the quantity the 5000-IS evaluator streams over k-chunks (the
    reference reduces it immediately, models/loss.py:28-37). Bound terms go
    through losses._reduce — ONE source of truth for train and eval."""
    top = Qs[-1]
    lw = _reduce(pxz.dist, x, pxz.axes)
    kl = _reduce(prior, top.z, prior.event_axes) - _reduce(top.dist, top.z, top.axes)
    for i in range(len(Qs) - 1):
        kl = kl + (
            _reduce(Ps[i].dist, Qs[i].z, Ps[i].axes)
            - _reduce(Qs[i].dist, Qs[i].z, Qs[i].axes)
        )
    return lw + beta * kl


def compute_loss(
    prior: Normal,
    Qs: Tuple[DistributionTuple, ...],
    Ps: Tuple[DistributionTuple, ...],
    pxz: DistributionTuple,
    x: jax.Array,
    beta: float = 1.0,
    objective: str = "iwae",
) -> Tuple[jax.Array, Metrics]:
    if objective == "elbo":
        # plain ELBO at any depth: mean over importance samples instead of
        # logmeanexp (reference elbo_loss, models/loss.py:58-70, generalised)
        import jax.numpy as jnp

        lw = log_weights(prior, Qs, Ps, pxz, x, beta=beta)
        elbo = jnp.mean(lw)
        bpd = _bits_per_dim(elbo, x)
        return -elbo, {"elbo": elbo, "bpd": bpd, "loss": -elbo}
    L = len(Qs)
    if L == 1:
        return iwae_loss(x, Qs[0].z, prior, Qs[0].dist, pxz.dist, beta=beta)
    if L == 2:
        return two_layer_iwae_loss(x, prior, Qs[0], Qs[1], Ps[0], pxz,
                                   beta=beta)
    return hierarchical_iwae_loss(
        x,
        Qs,
        Ps,
        pxz,
        DistributionTuple(prior, None, axes=prior.event_axes),
        beta=beta,
    )
