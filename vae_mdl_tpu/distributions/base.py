"""Distribution protocol with explicit event axes.

The reference monkey-patches a read/write ``axes`` property onto every TFP
distribution at import time (/root/reference/models/loss.py:9-23) so losses
know which trailing axes of ``log_prob`` to sum over. Later reference models
move to an explicit ``DistributionTuple(dist, sample, axes)`` NamedTuple
(/root/reference/utils/utils.py:83-97) — that is the design adopted here,
framework-wide: every distribution carries ``event_axes`` as a static field,
and model code passes ``DistributionTuple``s to losses.

All distributions are ``flax.struct`` pytrees so they can be returned from
jitted functions and ``nn.Module``s, crossed over ``vmap``/``scan``, and
sharded like any other array container. Sampling takes an explicit
``jax.random`` key (TPU-native determinism; replaces the stateful-TF-RNG bug
class preserved in /root/reference/tests/dataloader_issue.py).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from flax import struct

Axes = Tuple[int, ...]


class Distribution:
    """Mixin namespace: concrete distributions are flax.struct dataclasses
    exposing ``log_prob(x)``, ``sample(key, sample_shape=())``, ``mean()``
    and a static ``event_axes`` field."""

    event_axes: Axes

    def reduced_log_prob(self, x: jax.Array) -> jax.Array:
        """``log_prob`` summed over this distribution's event axes."""
        import jax.numpy as jnp

        return jnp.sum(self.log_prob(x), axis=self.event_axes)


@struct.dataclass
class DistributionTuple:
    """A distribution together with a sample drawn from it and reduction axes.

    Parity: /root/reference/utils/utils.py:83-97. ``axes`` defaults to the
    image event axes ``(-1, -2, -3)`` as in the reference.
    """

    dist: Any
    sample: Optional[jax.Array] = None
    axes: Axes = struct.field(pytree_node=False, default=(-1, -2, -3))

    @property
    def z(self):
        return self.sample

    @property
    def x(self):
        return self.sample

    @property
    def p(self):
        return self.dist

    @property
    def q(self):
        return self.dist
