"""Encoder networks: amortized inference q(z | x).

Parity targets:
- ``MLPEncoder``  — /root/reference/models/model01.py:90-99 (flatten -> MLPBlock)
- ``ConvEncoder`` — /root/reference/models/model02.py:25-54 (32/64/128/256
  stride-2 relu convs), model04.py:24-50 (128/256 stride-2 + 5xGLU stack),
  model06.py:102-132 (gelu variant); all end in Dense(2*n_latent) ->
  Normal(mu, softplus(logstd)).

The conv stack geometry is data, not code: a tuple of :class:`ConvSpec` plus
an optional GLU stack, so every reference encoder is a config, and new ones
need no new modules.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from vae_mdl_tpu.distributions import Normal
from vae_mdl_tpu.nn.blocks import _KERNEL_INIT, GLU, MLPBlock, _activation

Dtype = Any


@struct.dataclass
class ConvSpec:
    """One conv (or transposed-conv) layer: static architecture data."""

    features: int = struct.field(pytree_node=False, default=64)
    kernel: int = struct.field(pytree_node=False, default=3)
    stride: int = struct.field(pytree_node=False, default=1)
    transpose: bool = struct.field(pytree_node=False, default=False)
    activation: str = struct.field(pytree_node=False, default="relu")


def apply_conv_stack(
    specs: Tuple[ConvSpec, ...], x: jax.Array, dtype, prefix: str = "conv"
) -> jax.Array:
    for i, s in enumerate(specs):
        cls = nn.ConvTranspose if s.transpose else nn.Conv
        x = cls(
            s.features,
            (s.kernel, s.kernel),
            strides=(s.stride, s.stride),
            padding="SAME",
            dtype=dtype,
            kernel_init=_KERNEL_INIT,
            name=f"{prefix}_{i}",
        )(x)
        x = _activation(s.activation)(x)
    return x


class MLPEncoder(nn.Module):
    """Flatten image -> MLPBlock -> Normal over the latent."""

    n_hidden: int = 200
    n_latent: int = 100
    activation: str = "tanh"
    std_transform: str = "exp"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Normal:
        flat = x.reshape(x.shape[:-3] + (-1,))
        return MLPBlock(
            self.n_hidden,
            self.n_latent,
            activation=self.activation,
            std_transform=self.std_transform,
            dtype=self.dtype,
        )(flat)


class ConvEncoder(nn.Module):
    """Conv stack (+ optional GLU stack) -> flatten -> Dense(2*n_latent).

    ``std`` is softplus(logstd) as in every reference conv model
    (/root/reference/models/model02.py:54).
    """

    conv_specs: Tuple[ConvSpec, ...]
    n_latent: int = 20
    n_glu: int = 0
    glu_features: int = 64
    glu_activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Normal:
        h = apply_conv_stack(self.conv_specs, x, self.dtype)
        for i in range(self.n_glu):
            h = GLU(self.glu_features, self.glu_activation, self.dtype,
                    name=f"glu_{i}")(h)
        flat = h.reshape(h.shape[:-3] + (-1,)).astype(jnp.float32)
        out = nn.Dense(2 * self.n_latent, dtype=jnp.float32,
                       kernel_init=_KERNEL_INIT)(flat)
        mu, logstd = jnp.split(out, 2, axis=-1)
        return Normal(mu, jax.nn.softplus(logstd), event_axes=(-1,))
