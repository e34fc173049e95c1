"""Bidirectional ladder VAE: top-down posterior with bottom-up merge.

The simple conv ladder (models/ladder.py) parameterises q(z_i | z_{i-1})
purely bottom-up. The stronger, standard hierarchical design (Ladder VAE,
Sonderby et al. 2016; VDVAE) infers top-down:

    bottom-up (deterministic):  h_1 .. h_L = EncoderBlocks(stem(x))
    top level:                  q(z_L | h_L)
    top-down, i = L-1 .. 1:     d_i     = upsample(z_{i+1})
                                p(z_i | z_{i+1}) = prior head(d_i)
                                q(z_i | x, z_{>i}) = merge head([h_i, d_i])
    observation:                p(x | z_1)

so every posterior sees both the data path and the generative context. The
generic L-layer bound (models/losses.hierarchical_iwae_loss) applies
unchanged — it only needs q/p evaluated at the inference samples.

Built from the same nn blocks; importance samples ride as a leading axis on
every z (the deterministic h_i are broadcast against it — no recompute).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vae_mdl_tpu.distributions import DistributionTuple, Normal
from vae_mdl_tpu.nn.blocks import (
    _KERNEL_INIT,
    _activation,
    DecoderBlock,
    EncoderBlock,
)
from vae_mdl_tpu.models.vae import prior_for
from vae_mdl_tpu.nn.decoders import head_channels, ladder_observation

_SPATIAL_AXES = (-1, -2, -3)

# (hidden_width, latent_channels, n_blocks, scale_rate) per stochastic scale
Stage = Tuple[int, int, int, int]


@dataclasses.dataclass(frozen=True)
class BiLadderConfig:
    name: str = "biladder"
    image_shape: Tuple[int, int, int] = (32, 32, 3)
    stem_features: int = 32
    stages: Tuple[Stage, ...] = ((48, 16, 1, 2), (48, 8, 1, 2))
    n_samples: int = 5
    likelihood: str = "dl"
    bound_logstd: bool = False
    n_mix: int = 5
    rezero: bool = True
    use_pallas: Optional[bool] = None
    compute_dtype: str = "float32"
    beta: float = 1.0
    # tanh-approximate gelu by default: the ladders are this repo's own
    # families (no reference checkpoint to stay bit-exact against) and the
    # exact erf gelu costs them ~34% throughput (docs/design.md §12h)
    activation: str = "gelu_tanh"
    # split each merge head's conv over concat([h, d]) into
    # conv_h(h) + conv_d(d): algebraically the same linear map (a conv over
    # a channel concat IS the sum of convs over the parts), but h carries no
    # importance-sample axis — its half runs ONCE per batch instead of k
    # times, the [k,B,H,W,Ch+Cd] concat never materialises, and the
    # backward's weight-gradient conv for the h half contracts over B
    # instead of k*B. Values match to float roundoff (summation order
    # changes); parameter tree differs (conv_h/conv_d vs one fused conv),
    # so flipping this breaks checkpoint compatibility within the family.
    # DEFAULT ON since round 5: +7.7% measured on the 64x64 biladder train
    # step (1472 vs 1366 imgs/s, scripts/biladder_r5_probe.py, design.md
    # §12o) — the family is this repo's own extension, no reference
    # checkpoints exist; pre-r5 protocol checkpoints need
    # split_merge=False to load.
    split_merge: bool = True

    @property
    def n_stochastic(self) -> int:
        return len(self.stages)

    def top_latent_shape(self) -> Tuple[int, int, int]:
        h, w, _ = self.image_shape
        for (_, lat, _, rate) in self.stages:
            h, w = h // rate, w // rate
            c = lat
        return (h, w, c)


class _GaussianHead(nn.Module):
    """conv -> (mu, softplus std) over spatial latents.

    Always float32 by design: distribution parameters are likelihood math
    (CLAUDE.md convention / docs/design.md §3) — deliberately NOT a dtype
    knob, so a bf16 compute body can never quantize the heads."""

    channels: int

    @nn.compact
    def __call__(self, h: jax.Array) -> Normal:
        out = nn.Conv(2 * self.channels, (3, 3), padding="SAME",
                      dtype=jnp.float32, kernel_init=_KERNEL_INIT)(
            h.astype(jnp.float32))
        mu, logstd = jnp.split(out, 2, axis=-1)
        return Normal(mu, jax.nn.softplus(logstd), event_axes=_SPATIAL_AXES)


class _SplitMergeGaussianHead(nn.Module):
    """Merge head as conv_h(h) + conv_d(d) instead of conv(concat([h, d])).

    The same linear map (a conv over a channel concat is the sum of convs
    over the parts; one bias), but the data-path half h carries no
    importance-sample axis: conv_h runs once per batch and its output
    broadcasts into the k-shaped sum, so the k-fold redundant h-half work
    and the materialised [k,B,H,W,Ch+Cd] concat both disappear
    (BiLadderConfig.split_merge). f32 by design, like _GaussianHead."""

    channels: int

    @nn.compact
    def __call__(self, h: jax.Array, d: jax.Array) -> Normal:
        out_h = nn.Conv(2 * self.channels, (3, 3), padding="SAME",
                        dtype=jnp.float32, kernel_init=_KERNEL_INIT,
                        use_bias=False, name="conv_h")(h.astype(jnp.float32))
        out_d = nn.Conv(2 * self.channels, (3, 3), padding="SAME",
                        dtype=jnp.float32, kernel_init=_KERNEL_INIT,
                        name="conv_d")(d.astype(jnp.float32))
        out = out_h + out_d  # h [B,...] broadcasts against d's leading k
        mu, logstd = jnp.split(out, 2, axis=-1)
        return Normal(mu, jax.nn.softplus(logstd), event_axes=_SPATIAL_AXES)


class BiLadderVAE(nn.Module):
    config: BiLadderConfig

    def setup(self):
        cfg = self.config
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            cfg.compute_dtype
        ]
        self._dtype = dtype
        self._act = _activation(cfg.activation)
        L = len(cfg.stages)

        self.stem = nn.Conv(cfg.stem_features, (3, 3), padding="SAME",
                            dtype=dtype, kernel_init=_KERNEL_INIT)
        # bottom-up deterministic feature extractors
        self.enc_blocks = tuple(
            EncoderBlock(h, h, n, r, cfg.rezero, dtype, cfg.activation,
                         name=f"enc_{i}")
            for i, (h, lat, n, r) in enumerate(cfg.stages)
        )
        # top posterior head
        self.top_head = _GaussianHead(cfg.stages[-1][1], name="q_top")
        # per lower scale: upsampler from z_{i+1}, prior head, merge head
        ups, priors, merges = [], [], []
        for i in range(L - 1):
            h_w, lat, n_b, _ = cfg.stages[i]
            rate_above = cfg.stages[i + 1][3]
            ups.append(DecoderBlock(h_w, h_w, n_b, rate_above, cfg.rezero,
                                    dtype, cfg.activation, name=f"up_{i}"))
            priors.append(_GaussianHead(lat, name=f"p_{i}"))
            merges.append(
                _SplitMergeGaussianHead(lat, name=f"q_{i}")
                if cfg.split_merge else _GaussianHead(lat, name=f"q_{i}"))
        self.up_blocks = tuple(ups)
        self.prior_heads = tuple(priors)
        self.merge_heads = tuple(merges)

        h0 = cfg.stages[0]
        self.obs_up = DecoderBlock(h0[0], h0[0], h0[2], h0[3], cfg.rezero,
                                   dtype, cfg.activation, name="obs_up")
        self.obs_head = nn.Conv(
            head_channels(cfg.likelihood, cfg.image_shape[-1], cfg.n_mix),
            (3, 3), padding="SAME", dtype=jnp.float32,
            kernel_init=_KERNEL_INIT, name="obs_head",
        )

    # -- bottom-up deterministic path ---------------------------------------

    def _features(self, x: jax.Array):
        h = self._act(self.stem(x.astype(self._dtype)))
        hs = []
        for block in self.enc_blocks:
            h = block(h)
            hs.append(h)
        return hs  # scale i features at resolution of z_i

    # -- full inference + generative pass ------------------------------------

    def __call__(self, x: jax.Array, n_samples=None):
        cfg = self.config
        k = cfg.n_samples if n_samples is None else n_samples
        L = len(cfg.stages)
        hs = self._features(x)

        q_top = self.top_head(hs[-1])
        z = q_top.sample(self.make_rng("sample"), (k,))
        Qs = [DistributionTuple(q_top, z, axes=_SPATIAL_AXES)]
        Ps = []

        for i in range(L - 2, -1, -1):
            d = self.up_blocks[i](z)
            p_i = self.prior_heads[i](d)
            if cfg.split_merge:
                q_i = self.merge_heads[i](hs[i], d)
            else:
                h_b = jnp.broadcast_to(hs[i],
                                       d.shape[:-1] + hs[i].shape[-1:])
                q_i = self.merge_heads[i](jnp.concatenate([h_b, d], axis=-1))
            z = q_i.sample(self.make_rng("sample"))
            Qs.append(DistributionTuple(q_i, z, axes=_SPATIAL_AXES))
            Ps.append(DistributionTuple(p_i, None, axes=_SPATIAL_AXES))

        Qs = tuple(reversed(Qs))  # order 1..L (bottom first)
        Ps = tuple(reversed(Ps))
        pxz = self.decode(Qs[0].z)
        return Qs, Ps, pxz

    def encode(self, x: jax.Array, n_samples: int = 1):
        """Posterior chain q(z_1|x, z_>1) .. q(z_L|h_L) with samples — runs
        the full top-down inference (the posterior conditions on the
        generative path by design), matching the other families' serving
        surface (models/inference.make_encoder_fn)."""
        Qs, _, _ = self(x, n_samples)
        return Qs

    def decode(self, z1: jax.Array) -> DistributionTuple:
        return ladder_observation(self, z1)

    def generate(self, z_top: jax.Array) -> DistributionTuple:
        z = z_top
        for i in range(len(self.config.stages) - 2, -1, -1):
            d = self.up_blocks[i](z)
            z = self.prior_heads[i](d).sample(self.make_rng("sample"))
        return self.decode(z)

    def prior(self) -> Normal:
        return prior_for(self.config)


BILADDER_SVHN = BiLadderConfig(
    name="biladder_svhn",
    stages=((48, 24, 2, 2), (48, 16, 1, 2), (48, 8, 1, 2)),
)

# 64x64 CelebA-scale ladder (the reference ships the celeba data path but no
# model for it, utils/data.py:65-105) — four spatial scales down to 4x4.
# bf16 conv bodies by default: measured +50% (914 -> ~1370 imgs/s on v5e-1,
# docs/design.md §12) — the ladder's resizes/concats are bandwidth-bound and
# every likelihood/posterior head is f32 by construction (_GaussianHead).
# tanh gelu by default: +52% over exact erf gelu (design.md §12h).
BILADDER_CELEBA = BiLadderConfig(
    name="biladder_celeba",
    image_shape=(64, 64, 3),
    stem_features=48,
    stages=((64, 32, 2, 2), (64, 24, 2, 2), (64, 16, 1, 2), (64, 8, 1, 2)),
    likelihood="dl",
    compute_dtype="bfloat16",
)
