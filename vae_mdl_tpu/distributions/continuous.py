"""Normal / Logistic / Bernoulli distributions (f32 likelihood math).

These replace the TFP distributions used throughout the reference
(e.g. ``tfd.Normal`` at /root/reference/models/model01.py:85,135 and
``tfd.Bernoulli`` at /root/reference/models/model01.py:117). Likelihood math
stays float32 — on TPU only matmuls/convs should drop to bf16, never the
log-prob cascades.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vae_mdl_tpu.distributions.base import Distribution

_LOG_2PI = math.log(2.0 * math.pi)


@struct.dataclass
class Normal(Distribution):
    loc: jax.Array
    scale: jax.Array
    event_axes: Tuple[int, ...] = struct.field(pytree_node=False, default=(-1,))

    def log_prob(self, x: jax.Array) -> jax.Array:
        z = (x - self.loc) / self.scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale)

    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale)
        )
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(self.loc, float))
        return self.loc + self.scale * eps

    def mean(self) -> jax.Array:
        return jnp.broadcast_to(self.loc, jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale)))

    def kl_to_standard_normal(self) -> jax.Array:
        """Analytic KL(N(loc, scale) || N(0, 1)) — not in the reference (it
        always uses the stochastic KL estimate); provided as a framework
        extension."""
        var = self.scale * self.scale
        return 0.5 * (self.loc * self.loc + var - 1.0) - jnp.log(self.scale)


@struct.dataclass
class Logistic(Distribution):
    """Logistic(loc, scale); the base of the discretized likelihoods."""

    loc: jax.Array
    scale: jax.Array
    event_axes: Tuple[int, ...] = struct.field(pytree_node=False, default=(-1,))

    def log_prob(self, x: jax.Array) -> jax.Array:
        z = (x - self.loc) / self.scale
        return -z - 2.0 * jax.nn.softplus(-z) - jnp.log(self.scale)

    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale)
        )
        # inverse-CDF sampling; clip u away from {0, 1} like tfd.Logistic
        u = jax.random.uniform(
            key, shape, dtype=jnp.result_type(self.loc, float),
            minval=jnp.finfo(jnp.float32).tiny, maxval=1.0,
        )
        return self.loc + self.scale * (jnp.log(u) - jnp.log1p(-u))

    def mean(self) -> jax.Array:
        return jnp.broadcast_to(self.loc, jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale)))


@struct.dataclass
class Bernoulli(Distribution):
    logits: jax.Array
    event_axes: Tuple[int, ...] = struct.field(pytree_node=False, default=(-1, -2, -3))

    def log_prob(self, x: jax.Array) -> jax.Array:
        # x * logits - softplus(logits): stable cross-entropy form
        return x * self.logits - jax.nn.softplus(self.logits)

    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        shape = tuple(sample_shape) + jnp.shape(self.logits)
        u = jax.random.uniform(key, shape)
        return (u < jax.nn.sigmoid(self.logits)).astype(jnp.float32)

    def mean(self) -> jax.Array:
        return jax.nn.sigmoid(self.logits)
