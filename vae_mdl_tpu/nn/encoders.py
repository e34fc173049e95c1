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


def use_polyphase_deconv() -> bool:
    """AUTO policy for the polyphase transposed conv: OFF.

    In isolation the polyphase forms beat lax.conv_transpose 3-6x on the
    model05 decoder shapes (scripts/deconv_forms_bench.py), but in the
    COMPOSED train/eval programs they measure 10-20% slower end-to-end
    (docs/design.md §7c): XLA's layout assignment is global, and its
    fusion of the dilated conv with the surrounding ops beats the rewrite.
    The module stays as a tested, checkpoint-compatible opt-in
    (``apply_conv_stack(..., polyphase=True)``) — same honest-measurement
    policy as the DL Pallas kernel."""
    return False


class PolyphaseConvTranspose(nn.Module):
    """``nn.ConvTranspose(k=2s, stride s, SAME)`` computed the MXU-dense way.

    A stride-s transposed conv lowers to a conv over the s-dilated input:
    on TPU the systolic array then multiplies inserted zeros for all but
    1/s^2 of its MACs. The polyphase decomposition evaluates the SAME
    function as ONE dense (k/s x k/s) conv producing s^2 * features
    channels, followed by a depth-to-space transpose. For k=4, s=2, SAME
    padding, lax.conv_transpose's dilated-correlation form (pad 2/2)
    reduces per phase to

        y[2i,   2j+c] = W[0,.] x[i-1, .] + W[2,.] x[i, .]
        y[2i+1, 2j+c] = W[1,.] x[i,   .] + W[3,.] x[i+1, .]   (same in j)

    Both phases read the same 3-wide window (x[i-1], x[i], x[i+1]), so the
    whole op is ONE dense SAME 3x3 conv whose per-phase kernels carry
    static zeros ([W0, W2, 0] / [0, W1, W3]) — output keeps the aligned
    (h, w, s^2 f) shape and the interleave is one transpose. The static
    zeros cost 9/4 of the useful MACs but every MAC is dense MXU work,
    against conv_transpose's input-dilated lowering. Measured on the
    model05 decoder shapes at the 5000-IS eval batch (v5e-1,
    scripts/deconv_forms_bench.py): 3.1-5.7x faster forward; fwd+bwd 4.4x
    at the 4x4 base layer, parity at the larger ones (XLA already
    canonicalizes conv_transpose well inside grad programs).

    Parameters are IDENTICAL to ``nn.ConvTranspose`` (kernel [kh, kw, in,
    out] + bias) — checkpoints interchange freely; equivalence is pinned in
    tests/test_blocks.py.
    """

    features: int
    kernel: int  # square, must equal 2 * stride
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, f = self.kernel, self.stride, self.features
        # the phase/tap map below is written for s=2 specifically
        assert (k, s) == (4, 2), "polyphase path requires kernel 4, stride 2"
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", _KERNEL_INIT, (k, k, c_in, f), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)

        w = jnp.asarray(kernel, self.dtype)
        x = x.astype(self.dtype)
        h, wd = x.shape[-3], x.shape[-2]
        lead = x.shape[:-3]
        x4 = x.reshape((-1,) + x.shape[-3:])

        # 3x3 kernel with static zeros: phase r row-taps are
        # (W[0], W[2], 0) for r=0 and (0, W[1], W[3]) for r=1, over the
        # common SAME window (x[i-1], x[i], x[i+1]); same in columns.
        # Built by scattering W[a, b] into tap positions (traced once,
        # weight-sized — negligible).
        a_of = ({0: 0, 1: 2}, {1: 1, 2: 3})  # phase -> {window pos: a}
        w3 = jnp.zeros((3, 3, c_in, s, s, f), w.dtype)
        for r in range(s):
            for c in range(s):
                for pi, ai in a_of[r].items():
                    for pj, aj in a_of[c].items():
                        w3 = w3.at[pi, pj, :, r, c, :].set(w[ai, aj])
        w3 = w3.reshape(3, 3, c_in, s * s * f)

        y = jax.lax.conv_general_dilated(
            x4, w3, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [N, h, w, s*s*f] — aligned shapes throughout
        y = y.reshape(y.shape[0], h, wd, s, s, f)
        y = y.transpose(0, 1, 3, 2, 4, 5)  # depth-to-space
        out = y.reshape(y.shape[0], s * h, s * wd, f)
        out = out + jnp.asarray(bias, self.dtype)
        return out.reshape(lead + out.shape[1:])


def apply_conv_spec(
    s: ConvSpec, x: jax.Array, dtype, name: str,
    polyphase: bool | None = None,
) -> jax.Array:
    """One ConvSpec layer (conv / transposed conv / opt-in polyphase) +
    its activation, at the given compute dtype."""
    if polyphase is None:
        polyphase = use_polyphase_deconv()
    if s.transpose and polyphase and (s.kernel, s.stride) == (4, 2):
        x = PolyphaseConvTranspose(
            s.features, s.kernel, s.stride, dtype, name=name,
        )(x)
    else:
        cls = nn.ConvTranspose if s.transpose else nn.Conv
        x = cls(
            s.features,
            (s.kernel, s.kernel),
            strides=(s.stride, s.stride),
            padding="SAME",
            dtype=dtype,
            kernel_init=_KERNEL_INIT,
            name=name,
        )(x)
    return _activation(s.activation)(x)


def apply_conv_stack(
    specs: Tuple[ConvSpec, ...], x: jax.Array, dtype, prefix: str = "conv",
    polyphase: bool | None = None,
) -> jax.Array:
    for i, s in enumerate(specs):
        x = apply_conv_spec(s, x, dtype, f"{prefix}_{i}", polyphase)
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
