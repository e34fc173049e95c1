"""Conv-ladder hierarchical VAE: spatial latents at multiple scales.

The reference's ``modules/enc.py``/``dec.py`` stochastic blocks are the
toolkit for a ladder of spatial latents, but the models that used them live
in the gitignored ``models/old/`` and never shipped (SURVEY.md §2.1). This
module is that capability, built on the same blocks
(nn.blocks.Stochastic{Encoder,Decoder}Block) and the generic L-layer bound
(models/losses.hierarchical_iwae_loss):

    bottom-up:  stem conv -> q(z_1|x) at scale /r -> q(z_2|z_1) ... q(z_L|.)
    top-down:   p(z_{L-1}|z_L) ... p(z_1|z_2), observation head from z_1
    prior:      standard normal over the top spatial latent

Latents are SPATIAL ([h_i, w_i, c_i], event axes (-1, -2, -3)); importance
samples ride as a leading axis exactly as in the dense models.
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
    StochasticDecoderBlock,
    StochasticEncoderBlock,
)
from vae_mdl_tpu.models.vae import prior_for
from vae_mdl_tpu.nn.decoders import head_channels, ladder_observation

_SPATIAL_AXES = (-1, -2, -3)

# (hidden_width, out_width, n_blocks, scale_rate) per stochastic scale
Stage = Tuple[int, int, int, int]


@dataclasses.dataclass(frozen=True)
class LadderConfig:
    name: str = "ladder"
    image_shape: Tuple[int, int, int] = (32, 32, 3)
    stem_features: int = 32
    # bottom-up scales; latent i lives at resolution H / prod(rates[:i+1])
    stages: Tuple[Stage, ...] = ((32, 16, 1, 2), (32, 8, 1, 2))
    n_samples: int = 5
    likelihood: str = "dl"
    bound_logstd: bool = False
    n_mix: int = 5
    rezero: bool = True
    use_pallas: Optional[bool] = None
    compute_dtype: str = "float32"
    beta: float = 1.0  # KL weight in the bound
    # tanh-approximate gelu by default: the ladders are this repo's own
    # families (no reference checkpoint to stay bit-exact against) and the
    # exact erf gelu costs them ~34% throughput (docs/design.md §12h)
    activation: str = "gelu_tanh"

    @property
    def n_stochastic(self) -> int:
        return len(self.stages)

    def top_latent_shape(self) -> Tuple[int, int, int]:
        h, w, _ = self.image_shape
        for (_, out, _, rate) in self.stages:
            h, w = h // rate, w // rate
            c = out
        return (h, w, c)


class ConvLadderVAE(nn.Module):
    config: LadderConfig

    def setup(self):
        cfg = self.config
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            cfg.compute_dtype
        ]
        self._dtype = dtype
        self._act = _activation(cfg.activation)
        self.stem = nn.Conv(cfg.stem_features, (3, 3), padding="SAME",
                            dtype=dtype, kernel_init=_KERNEL_INIT)
        self.enc_blocks = tuple(
            StochasticEncoderBlock(h, o, n, r, cfg.rezero, dtype,
                                   cfg.activation, name=f"enc_{i}")
            for i, (h, o, n, r) in enumerate(cfg.stages)
        )
        # top-down generative blocks: p(z_i | z_{i+1}) upsamples scale i+1 -> i
        self.dec_blocks = tuple(
            StochasticDecoderBlock(
                cfg.stages[i][0], cfg.stages[i][1], cfg.stages[i][2],
                cfg.stages[i + 1][3], cfg.rezero, dtype, cfg.activation,
                name=f"dec_{i}"
            )
            for i in range(len(cfg.stages) - 1)
        )
        # observation head: upsample z_1 back to image resolution
        h0 = cfg.stages[0]
        self.obs_up = DecoderBlock(h0[0], h0[0], h0[2], h0[3], cfg.rezero,
                                   dtype, cfg.activation, name="obs_up")
        self.obs_head = nn.Conv(
            head_channels(cfg.likelihood, cfg.image_shape[-1], cfg.n_mix),
            (3, 3), padding="SAME", dtype=jnp.float32,
            kernel_init=_KERNEL_INIT, name="obs_head",
        )

    # ------------------------------------------------------------- inference

    def encode(self, x: jax.Array, n_samples: int = 1):
        h = self._act(self.stem(x.astype(self._dtype)))
        Qs = []
        z = h
        for i, block in enumerate(self.enc_blocks):
            q = block(z)
            z = q.sample(
                self.make_rng("sample"), (n_samples,) if i == 0 else ()
            )
            Qs.append(DistributionTuple(q, z, axes=_SPATIAL_AXES))
        return tuple(Qs)

    # ------------------------------------------------------------ generation

    def decode(self, z1: jax.Array) -> DistributionTuple:
        return ladder_observation(self, z1)

    def decode_down(self, Qs):
        Ps = []
        for i, block in enumerate(self.dec_blocks):
            p = block(Qs[i + 1].z)
            Ps.append(DistributionTuple(p, None, axes=_SPATIAL_AXES))
        return tuple(Ps), self.decode(Qs[0].z)

    def generate(self, z_top: jax.Array) -> DistributionTuple:
        z = z_top
        for block in reversed(self.dec_blocks):
            p = block(z)
            z = p.sample(self.make_rng("sample"))
        return self.decode(z)

    def __call__(self, x: jax.Array, n_samples=None):
        k = self.config.n_samples if n_samples is None else n_samples
        Qs = self.encode(x, k)
        Ps, pxz = self.decode_down(Qs)
        return Qs, Ps, pxz

    def prior(self) -> Normal:
        return prior_for(self.config)


# a ready-made config: 3 spatial scales on 32x32 images
LADDER_SVHN = LadderConfig(
    name="ladder_svhn",
    stages=((48, 24, 2, 2), (48, 16, 1, 2), (48, 8, 1, 2)),
)
