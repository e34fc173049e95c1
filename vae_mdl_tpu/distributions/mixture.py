"""Mixtures of discretized logistics over RGB pixels.

Two variants, mirroring the reference's capability surface:

- ``MixtureDiscretizedLogistic`` — PixelCNN++-style: the green/blue location
  parameters are conditioned on the *observed* red/green sub-pixel values
  (channel autoregression). Parity: /root/reference/utils/mdl.py, which is
  asserted numerically equal to OpenAI's pixel_cnn_pp/nn.py (the golden test
  in tests/test_distributions.py re-derives the OpenAI formula as the oracle).

- ``PixelMixtureDiscretizedLogistic`` — no conditioning on observed x; the
  autoregression is folded into the locations themselves, which makes
  ``log_prob`` observation-free and sampling non-sequential.
  Parity: /root/reference/utils/mdl_plain.py.

Parameter layout per pixel, ``n_mix * 10`` channels
(/root/reference/utils/mdl.py:24-31):
  [n_mix mixture logits | n_mix*3 locs | n_mix*3 logscales | n_mix*3 coeffs]
with the last three groups interleaved per sub-pixel after reshaping to
``[..., 3, 3*n_mix]``.

TPU note: ``log_prob`` is the hottest op of the MoDL models (model05) — pure
VPU elementwise + a logsumexp over n_mix. ``vae_mdl_tpu.ops.pallas.mdl``
provides a fused kernel; this module is the jnp reference implementation and
the kernel's test oracle.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vae_mdl_tpu.distributions.base import Distribution
from vae_mdl_tpu.distributions.discretized import discretized_logistic_log_prob
from vae_mdl_tpu.ops.math import log_prob_from_logits

# image space is mapped [0,1] -> [-1,1]; 256 levels => bin width 2/255
_INTERVAL_WIDTH = 2.0 / 255.0
_LOW, _HIGH = -1.0, 1.0


def split_mixture_params(parameters: jax.Array):
    """Split ``[..., n_mix*10]`` into (loc, logscale, coeffs, mix_logits).

    loc/logscale/coeffs: ``[..., 3, n_mix]``; mix_logits: ``[..., n_mix]``.
    Parity: /root/reference/utils/mdl.py:94-112 (logscale clamped at -7,
    coeffs tanh-squashed).
    """
    if parameters.shape[-1] % 10 != 0:
        raise ValueError(
            "mixture parameters need a trailing dim of n_mix*10 "
            f"(logits + 3 locs + 3 logscales + 3 coeffs per mix); got {parameters.shape[-1]}"
        )
    n_mix = parameters.shape[-1] // 10
    mix_logits = parameters[..., :n_mix]
    rest = parameters[..., n_mix:].reshape(parameters.shape[:-1] + (3, 3 * n_mix))
    loc, logscale, coeffs = jnp.split(rest, 3, axis=-1)
    logscale = jnp.maximum(logscale, -7.0)
    coeffs = jnp.tanh(coeffs)
    return loc, logscale, coeffs, mix_logits


def autoregressive_locs(loc: jax.Array, coeffs: jax.Array, x: jax.Array) -> jax.Array:
    """Condition green/blue locs on observed red/green values.

    p(R,G,B) = p(R) p(G|R=r) p(B|R=r,G=g); x is in [-1, 1].
    Parity: /root/reference/utils/mdl.py:137-149.
    """
    loc_r = loc[..., 0, :]
    loc_g = loc[..., 1, :] + coeffs[..., 0, :] * x[..., 0, None]
    loc_b = (
        loc[..., 2, :]
        + coeffs[..., 1, :] * x[..., 0, None]
        + coeffs[..., 2, :] * x[..., 1, None]
    )
    return jnp.stack([loc_r, loc_g, loc_b], axis=-2)


def mixture_log_prob(x01: jax.Array, parameters: jax.Array) -> jax.Array:
    """Per-pixel MoDL log-prob with channel autoregression.

    ``x01``: observations in [0, 1], shape ``[..., h, w, 3]``.
    ``parameters``: ``[..., h, w, n_mix*10]`` (may carry extra leading
    importance-sample dims; broadcasting handles them — no reshape/repeat
    tricks needed, cf. /root/reference/utils/mdl_openai_iwae.py:37-67).

    Returns ``[..., h, w, 1]`` (trailing singleton channel so the usual
    ``(-1, -2, -3)`` event reduction applies, reference utils/mdl.py:92).
    """
    x = x01 * 2.0 - 1.0
    loc, logscale, coeffs, mix_logits = split_mixture_params(parameters)
    loc = autoregressive_locs(loc, coeffs, x)

    # [..., h, w, 3, n_mix] elementwise discretized-logistic log-probs
    sub_pixel_lp = discretized_logistic_log_prob(
        x[..., None], loc, logscale,
        low=_LOW, high=_HIGH, interval_width=_INTERVAL_WIDTH,
    )

    # pixel-cnn style: sum sub-pixels, then mixture-weigh, then logsumexp
    weighted = jnp.sum(sub_pixel_lp, axis=-2) + log_prob_from_logits(mix_logits)
    lp = jax.scipy.special.logsumexp(weighted, axis=-1)
    return lp[..., None]


@struct.dataclass
class MixtureDiscretizedLogistic(Distribution):
    """PixelCNN++-compatible MoDL. Parity: /root/reference/utils/mdl.py."""

    parameters: jax.Array
    event_axes: Tuple[int, ...] = struct.field(pytree_node=False, default=(-1, -2, -3))
    use_pallas: bool = struct.field(pytree_node=False, default=False)

    @property
    def n_mix(self) -> int:
        return self.parameters.shape[-1] // 10

    def log_prob(self, x: jax.Array) -> jax.Array:
        """``x`` in [0, 1] (the internal [0,1]->[-1,1] rescale matches the
        models' usage, /root/reference/models/loss.py:32)."""
        if self.use_pallas:
            from vae_mdl_tpu.ops.pallas.mdl_kernel import (
                mdl_log_prob,
                mdl_log_prob_batch_lanes,
                mdl_log_prob_lane_tiled,
                prefer_batch_lanes,
                prefer_lane_tiled,
            )

            # bf16-boundary shapes take a batch-lanes layout (no relayout
            # copy at the custom-call boundary, no in-VMEM transpose;
            # design.md §12n/§12o): whole-L blocks for training-sized
            # k*B (+9..+42% across the swept range), k-grid lane tiles
            # for the eval regime's huge k*B (+19% at k_chunk=100,
            # B=128). Everything else — f32 boundaries, ragged lane
            # counts — keeps the standard kernel (measured rules in
            # prefer_batch_lanes / prefer_lane_tiled).
            if prefer_batch_lanes(x, self.parameters):
                return mdl_log_prob_batch_lanes(x, self.parameters)
            if prefer_lane_tiled(x, self.parameters):
                return mdl_log_prob_lane_tiled(x, self.parameters)
            return mdl_log_prob(x, self.parameters)
        # likelihood math stays float32 even when the boundary tensor is
        # quantized (config.likelihood_io_dtype): the upcast fuses into the
        # elementwise chain's reads, so no f32 copy materializes
        return mixture_log_prob(x, self.parameters.astype(jnp.float32))

    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        """Ancestral-ish sampling: logistic draws autoregressed on *samples*
        (not on data), then mixture selection via one categorical draw per
        pixel. Parity: /root/reference/utils/mdl.py:209-252."""
        loc, logscale, coeffs, mix_logits = split_mixture_params(
            self.parameters.astype(jnp.float32))
        k_logistic, k_cat = jax.random.split(key)

        from vae_mdl_tpu.distributions.continuous import Logistic

        ls = Logistic(loc, jnp.exp(logscale)).sample(k_logistic, sample_shape)

        r = jnp.clip(ls[..., 0, :], _LOW, _HIGH)
        g = jnp.clip(ls[..., 1, :] + coeffs[..., 0, :] * r, _LOW, _HIGH)
        b = jnp.clip(
            ls[..., 2, :] + coeffs[..., 1, :] * r + coeffs[..., 2, :] * g,
            _LOW, _HIGH,
        )
        auto = jnp.stack([r, g, b], axis=-2)  # [..., 3, n_mix]

        onehot = jax.nn.one_hot(
            jax.random.categorical(
                k_cat, mix_logits, shape=tuple(sample_shape) + mix_logits.shape[:-1]
            ),
            self.n_mix,
            dtype=auto.dtype,
        )  # [..., n_mix]
        selected = jnp.sum(auto * onehot[..., None, :], axis=-1)
        return selected * 0.5 + 0.5  # back to [0, 1]

    def mean(self, key: jax.Array | None = None, n: int = 100) -> jax.Array:
        """Monte-Carlo mean of ``n`` samples, as the reference defines it
        (/root/reference/utils/mdl.py:254-255)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        return jnp.mean(self.sample(key, (n,)), axis=0)


@struct.dataclass
class PixelMixtureDiscretizedLogistic(Distribution):
    """Loc-conditioned MoDL (no dependence on observed x).

    Parity: /root/reference/utils/mdl_plain.py. ``log_prob`` expects x in
    [0, 1] and returns per-pixel values ``[..., h, w]`` (reference
    :35-65 returns without the dummy channel dim — preserved here, so use
    ``event_axes=(-1, -2)``).
    """

    parameters: jax.Array
    low: float = struct.field(pytree_node=False, default=-1.0)
    high: float = struct.field(pytree_node=False, default=1.0)
    levels: float = struct.field(pytree_node=False, default=256.0)
    event_axes: Tuple[int, ...] = struct.field(pytree_node=False, default=(-1, -2))

    @property
    def n_mix(self) -> int:
        return self.parameters.shape[-1] // 10

    def _params(self):
        """Fold the autoregression into the locs themselves
        (/root/reference/utils/mdl_plain.py:158-162)."""
        loc, logscale, coeffs, mix_logits = split_mixture_params(self.parameters)
        loc_r = loc[..., 0, :]
        loc_g = loc[..., 1, :] + coeffs[..., 0, :] * loc_r
        loc_b = loc[..., 2, :] + coeffs[..., 1, :] * loc_r + coeffs[..., 2, :] * loc_g
        loc = jnp.stack([loc_r, loc_g, loc_b], axis=-2)
        return loc, logscale, mix_logits

    def log_prob(self, x: jax.Array) -> jax.Array:
        x = x * 2.0 - 1.0
        loc, logscale, mix_logits = self._params()
        interval_width = (self.high - self.low) / (self.levels - 1.0)
        sub_pixel_lp = discretized_logistic_log_prob(
            x[..., None], loc, logscale,
            low=self.low, high=self.high, interval_width=interval_width,
        )
        weighted = jnp.sum(sub_pixel_lp, axis=-2) + log_prob_from_logits(mix_logits)
        return jax.scipy.special.logsumexp(weighted, axis=-1)

    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        """Non-sequential sampling — valid because nothing conditions on x
        (/root/reference/utils/mdl_plain.py:67-75)."""
        loc, logscale, mix_logits = self._params()
        k_logistic, k_cat = jax.random.split(key)

        from vae_mdl_tpu.distributions.continuous import Logistic

        ls = Logistic(loc, jnp.exp(logscale)).sample(k_logistic, sample_shape)
        ls = jnp.clip(ls, self.low, self.high)  # [..., 3, n_mix]

        onehot = jax.nn.one_hot(
            jax.random.categorical(
                k_cat, mix_logits, shape=tuple(sample_shape) + mix_logits.shape[:-1]
            ),
            self.n_mix,
            dtype=ls.dtype,
        )
        selected = jnp.sum(ls * onehot[..., None, :], axis=-1)
        return (selected + 1.0) / 2.0

    def mean(self, key: jax.Array | None = None) -> jax.Array:
        """Locs of one sampled mixture component
        (/root/reference/utils/mdl_plain.py:102-121)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        loc, _, mix_logits = self._params()
        onehot = jax.nn.one_hot(
            jax.random.categorical(key, mix_logits), self.n_mix, dtype=loc.dtype
        )
        selected = jnp.sum(loc * onehot[..., None, :], axis=-1)
        return (jnp.clip(selected, self.low, self.high) + 1.0) / 2.0
