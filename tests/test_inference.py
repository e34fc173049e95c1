"""Inference/serving API tests."""
import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.models import MODELS, build_model
from vae_mdl_tpu.models.inference import (
    make_encoder_fn,
    make_reconstructor,
    make_sampler,
)


def _init(name):
    cfg = MODELS[name]
    model = build_model(cfg)
    h, w, c = cfg.image_shape
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, h, w, c))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    return cfg, model, params, x


def test_sampler_produces_uint8_images():
    cfg, model, params, _ = _init("model06")
    sample = make_sampler(model, cfg)
    imgs = sample(params, jax.random.PRNGKey(0), 4)
    assert imgs.shape == (4,) + cfg.image_shape
    assert imgs.dtype == jnp.uint8


def test_reconstructor_and_encoder():
    cfg, model, params, x = _init("model02")
    recon = make_reconstructor(model, cfg)(params, jax.random.PRNGKey(0), x)
    assert recon.shape == x.shape
    assert np.isfinite(np.asarray(recon)).all()

    latents = make_encoder_fn(model)(params, jax.random.PRNGKey(0), x)
    assert latents[0].shape == (2, cfg.n_latent)


def test_sampler_spatial_ladder():
    cfg, model, params, _ = _init("ladder_svhn")
    imgs = make_sampler(model, cfg)(params, jax.random.PRNGKey(0), 2)
    assert imgs.shape == (2,) + cfg.image_shape


def test_gaussian_sampler_uses_mean_function():
    """model02's prior-sample grids show the observation MEAN, not noisy
    draws (reference parity: models/model02.py:205-221)."""
    cfg, model, params, _ = _init("model02")
    sample = make_sampler(model, cfg)
    imgs = np.asarray(sample(params, jax.random.PRNGKey(0), 4))

    # replicate the sampler's ancestral path and pin the mean dispatch
    k_prior, k_gen = jax.random.split(jax.random.PRNGKey(0))
    z_top = jax.random.normal(k_prior, (4, cfg.latents()[-1]))
    out = model.apply(params, z_top, rngs={"sample": k_gen}, method="generate")
    expected = np.asarray(
        (jnp.clip(out.dist.mean(), 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    )
    assert np.array_equal(imgs, expected)
    # and the mean is NOT what a raw draw would give
    raw = np.asarray(
        (jnp.clip(out.sample, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    )
    assert not np.array_equal(imgs, raw)
