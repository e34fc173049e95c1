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
    hierarchical_iwae_loss,
    iwae_loss,
    two_layer_iwae_loss,
)


def compute_loss(
    prior: Normal,
    Qs: Tuple[DistributionTuple, ...],
    Ps: Tuple[DistributionTuple, ...],
    pxz: DistributionTuple,
    x: jax.Array,
    beta: float = 1.0,
) -> Tuple[jax.Array, Metrics]:
    L = len(Qs)
    if L == 1:
        return iwae_loss(x, Qs[0].z, prior, Qs[0].dist, pxz.dist, beta=beta)
    if L == 2:
        return two_layer_iwae_loss(x, prior, Qs[0], Qs[1], Ps[0], pxz)
    return hierarchical_iwae_loss(
        x,
        Qs,
        Ps,
        pxz,
        DistributionTuple(prior, None, axes=prior.event_axes),
        beta=beta,
    )
