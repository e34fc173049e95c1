"""The VAE/IWAE model family as ONE configurable module.

The reference implements six vertically-integrated ~300-line model files
(models/model01.py .. model06.py) that are >80% copy-paste (SURVEY.md §1).
Here the whole ladder is a single :class:`VAE` linen module driven by
:class:`~vae_mdl_tpu.config.ModelConfig`:

- one stochastic layer (models 01-05): encoder -> q(z|x), k importance
  samples as a leading axis, decoder -> p(x|z) with the configured
  likelihood head. Parity: /root/reference/models/model01.py:151-165.
- L >= 2 stochastic layers (model06 and the generic ladder the reference
  only prototyped in tests/test_hierarchical_setup.py:13-58): MLP blocks
  q(z_i | z_{i-1}) up, MLP blocks p(z_{i-1} | z_i) down, a standard-normal
  prior on the top latent. Parity: /root/reference/models/model06.py:75-220.

TPU notes: sampling uses linen RNG streams (``make_rng("sample")``) so a
jitted train step takes explicit keys; the importance-sample axis is a plain
leading axis handled by broadcasting + ``merge_leading`` in the conv stacks
(never a Python loop).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vae_mdl_tpu.config import ModelConfig
from vae_mdl_tpu.distributions import DistributionTuple, Normal
from vae_mdl_tpu.nn.blocks import MLPBlock
from vae_mdl_tpu.nn.decoders import ConvDecoder, MLPDecoder
from vae_mdl_tpu.nn.encoders import ConvEncoder, ConvSpec, MLPEncoder

_LATENT_AXES = (-1,)


def _specs(layers) -> Tuple[ConvSpec, ...]:
    return tuple(
        ConvSpec(features=f, kernel=k, stride=s, transpose=t, activation=a)
        for (f, k, s, t, a) in layers
    )


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class VAE(nn.Module):
    """Configurable importance-weighted autoencoder."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dtype = _dtype(cfg.compute_dtype)
        latents = cfg.latents()

        if cfg.encoder.kind == "mlp":
            self.encoder = MLPEncoder(
                n_hidden=cfg.encoder.n_hidden,
                n_latent=latents[0],
                activation=cfg.encoder.activation,
                std_transform=cfg.encoder.std_transform,
                dtype=dtype,
            )
        else:
            self.encoder = ConvEncoder(
                conv_specs=_specs(cfg.encoder.conv_layers),
                n_latent=latents[0],
                n_glu=cfg.encoder.n_glu,
                glu_features=cfg.encoder.glu_features,
                glu_activation=cfg.encoder.glu_activation,
                dtype=dtype,
            )

        if cfg.decoder.kind == "mlp":
            self.decoder = MLPDecoder(
                out_shape=cfg.image_shape,
                n_hidden=cfg.decoder.n_hidden,
                activation=cfg.decoder.activation,
                likelihood=cfg.likelihood,
                n_mix=cfg.n_mix,
                bound_logstd=cfg.bound_logstd,
                use_pallas=cfg.use_pallas,
                likelihood_io_dtype=cfg.likelihood_io_dtype,
                dtype=dtype,
            )
        else:
            self.decoder = ConvDecoder(
                conv_specs=_specs(cfg.decoder.conv_layers),
                base_size=cfg.decoder.base_size,
                out_shape=cfg.image_shape,
                pre_specs=_specs(cfg.decoder.pre_layers),
                n_glu=cfg.decoder.n_glu,
                glu_features=cfg.decoder.glu_features,
                glu_activation=cfg.decoder.glu_activation,
                fc_activation=cfg.decoder.fc_activation,
                likelihood=cfg.likelihood,
                n_mix=cfg.n_mix,
                bound_logstd=cfg.bound_logstd,
                use_pallas=cfg.use_pallas,
                likelihood_io_dtype=cfg.likelihood_io_dtype,
                head_pad=cfg.decoder.head_pad,
                dtype=dtype,
            )

        # stochastic layers 2..L: inference (up) and generative (down) MLPs
        # (parity: model06's mlp_encoder/mlp_decoder, model06.py:188-191)
        ups, downs = [], []
        for i in range(1, cfg.n_stochastic):
            ups.append(
                MLPBlock(cfg.mlp_hidden, latents[i],
                         activation=cfg.mlp_activation,
                         std_transform="softplus", dtype=dtype,
                         name=f"mlp_encoder_{i}")
            )
            downs.append(
                MLPBlock(cfg.mlp_hidden, latents[i - 1],
                         activation=cfg.mlp_activation,
                         std_transform="softplus", dtype=dtype,
                         name=f"mlp_decoder_{i}")
            )
        self.mlp_encoders = tuple(ups)
        self.mlp_decoders = tuple(downs)

    # -- inference ----------------------------------------------------------

    def encode(self, x: jax.Array, n_samples: int = 1) -> Tuple[DistributionTuple, ...]:
        """q(z_1 | x) .. q(z_L | z_{L-1}) with samples attached.

        Importance samples appear as a leading axis on z_1 and ride through
        the upper layers (model06 samples upper layers once per z_1 sample,
        model06.py:89-98 — preserved)."""
        q1 = self.encoder(x)
        z1 = q1.sample(self.make_rng("sample"), (n_samples,))
        Qs = [DistributionTuple(q1, z1, axes=_LATENT_AXES)]
        z = z1
        for block in self.mlp_encoders:
            q = block(z)
            z = q.sample(self.make_rng("sample"))
            Qs.append(DistributionTuple(q, z, axes=_LATENT_AXES))
        return tuple(Qs)

    def posterior_at(
        self, x: jax.Array, zs: Tuple[jax.Array, ...]
    ) -> Tuple[DistributionTuple, ...]:
        """q(z_1|x), q(z_2|z_1), .. evaluated at GIVEN latents (no sampling):
        q_i's parameters are computed from ``zs[i-1]`` and each returned
        tuple carries ``zs[i]`` as its sample.

        Exists for the DReG estimator (models/objective.py): eq. 12 of
        Tucker et al. 2019 needs the log-weight under stop-gradiented
        inference *parameter maps* with the latents pathwise-live. Calling
        this with fully stop-gradiented weights on live ``zs`` keeps the
        hierarchical route z_{i-1} -> q_i's parameters alive — stopping the
        evaluated parameter VALUES instead would sever it and bias the
        estimator for ``n_stochastic >= 2``."""
        q1 = self.encoder(x)
        Qs = [DistributionTuple(q1, zs[0], axes=_LATENT_AXES)]
        for i, block in enumerate(self.mlp_encoders):
            q = block(zs[i])
            Qs.append(DistributionTuple(q, zs[i + 1], axes=_LATENT_AXES))
        return tuple(Qs)

    # -- generation ---------------------------------------------------------

    def decode(self, z1: jax.Array) -> DistributionTuple:
        """p(x | z_1) with a sample attached (model06.py:157-167)."""
        pxz = self.decoder(z1)
        x = pxz.sample(self.make_rng("sample"))
        return DistributionTuple(pxz, x, axes=pxz.event_axes)

    def decode_down(self, Qs: Tuple[DistributionTuple, ...]):
        """Generative conditionals p(z_i | z_{i+1}) evaluated at the
        *inference* samples, plus p(x | z_1)."""
        Ps = []
        for i, block in enumerate(self.mlp_decoders):
            p = block(Qs[i + 1].z)  # p(z_i | z_{i+1}) from the layer above
            Ps.append(DistributionTuple(p, None, axes=_LATENT_AXES))
        pxz = self.decode(Qs[0].z)
        return tuple(Ps), pxz

    def generate(self, z_top: jax.Array) -> DistributionTuple:
        """Ancestral sampling z_L -> ... -> z_1 -> x
        (parity: model06.generate, model06.py:212-215)."""
        z = z_top
        for block in reversed(self.mlp_decoders):
            p = block(z)
            z = p.sample(self.make_rng("sample"))
        return self.decode(z)

    def __call__(self, x: jax.Array, n_samples: Optional[int] = None):
        """Full forward pass: (Qs, Ps, pxz)."""
        k = self.config.n_samples if n_samples is None else n_samples
        Qs = self.encode(x, k)
        Ps, pxz = self.decode_down(Qs)
        return Qs, Ps, pxz

    # -- prior ---------------------------------------------------------------

    def prior(self) -> Normal:
        """Standard-normal prior over the top latent
        (parity: pz at model01.py:135-136)."""
        n_top = self.config.latents()[-1]
        return Normal(jnp.zeros((n_top,)), jnp.ones((n_top,)), event_axes=_LATENT_AXES)


def prior_for(config) -> Normal:
    """Standard-normal prior over the top latent; parameter-free, so usable
    outside ``apply`` (e.g. inside jitted train steps). Dispatches on config
    family: spatial top latent (conv ladders) vs dense vector."""
    if hasattr(config, "top_latent_shape"):
        shape = config.top_latent_shape()
        return Normal(jnp.zeros(shape), jnp.ones(shape),
                      event_axes=(-1, -2, -3))
    n_top = config.latents()[-1]
    return Normal(jnp.zeros((n_top,)), jnp.ones((n_top,)), event_axes=_LATENT_AXES)


def build_model(config):
    from vae_mdl_tpu.models.bidirectional import BiLadderConfig, BiLadderVAE
    from vae_mdl_tpu.models.ladder import ConvLadderVAE, LadderConfig

    if isinstance(config, BiLadderConfig):
        return BiLadderVAE(config)
    if isinstance(config, LadderConfig):
        return ConvLadderVAE(config)
    return VAE(config)
