"""Inference/serving APIs: jitted encode / reconstruct / sample.

The reference's only "serving" surface is the plotting code inside each
model's ``report`` (models/model01.py:228-261). These are first-class,
jit-cached equivalents for programmatic use.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp


def make_sampler(model, config):
    """Returns ``sample(params, key, n) -> uint8 images [n, H, W, C]`` —
    ancestral sampling from the top prior through the generative path."""
    top_shape = (
        config.top_latent_shape()
        if hasattr(config, "top_latent_shape")
        else (config.latents()[-1],)
    )

    @partial(jax.jit, static_argnums=(2,))
    def sample(params, key, n: int):
        k_prior, k_gen = jax.random.split(key)
        z_top = jax.random.normal(k_prior, (n,) + top_shape)
        out = model.apply(params, z_top, rngs={"sample": k_gen},
                          method="generate")
        # Gaussian obs: the mean function, not noisy draws (reference
        # parity: models/model02.py:205-221)
        img = (out.dist.mean()
               if getattr(config, "likelihood", None) == "gaussian"
               else out.sample)
        img = jnp.clip(img, 0.0, 1.0)
        return (img * 255.0 + 0.5).astype(jnp.uint8)

    return sample


def make_reconstructor(model, config):
    """Returns ``reconstruct(params, key, x01) -> float images [B, H, W, C]``
    (posterior-mean reconstruction, one importance sample)."""

    @jax.jit
    def reconstruct(params, key, x01):
        Qs, Ps, pxz = model.apply(params, x01, 1, rngs={"sample": key})
        dist = pxz.dist
        from vae_mdl_tpu.distributions import MixtureDiscretizedLogistic

        if isinstance(dist, MixtureDiscretizedLogistic):
            mean = dist.mean(jax.random.fold_in(key, 1), n=32)
        else:
            mean = dist.mean()
        return mean[0]

    return reconstruct


def make_encoder_fn(model):
    """Returns ``encode(params, key, x01) -> latent means per layer``."""

    @jax.jit
    def encode(params, key, x01):
        Qs = model.apply(params, x01, 1, rngs={"sample": key},
                         method="encode")
        return tuple(q.dist.loc for q in Qs)

    return encode
