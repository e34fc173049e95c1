"""Conv-ladder hierarchical VAE (spatial latents) tests."""
import dataclasses

import jax
import jax.numpy as jnp
import pytest

from vae_mdl_tpu.models.ladder import LADDER_SVHN, LadderConfig
from vae_mdl_tpu.models.objective import compute_loss, log_weights
from vae_mdl_tpu.models.vae import build_model, prior_for

B, K = 2, 3


def _forward(cfg):
    model = build_model(cfg)
    h, w, c = cfg.image_shape
    x = jax.random.uniform(jax.random.PRNGKey(9), (B, h, w, c))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    Qs, Ps, pxz = model.apply(params, x, K, rngs={"sample": jax.random.PRNGKey(2)})
    return model, params, x, Qs, Ps, pxz


def test_spatial_latents_and_loss():
    cfg = LADDER_SVHN
    model, params, x, Qs, Ps, pxz = _forward(cfg)

    assert len(Qs) == 3
    assert Qs[0].z.shape == (K, B, 16, 16, 24)  # scale /2
    assert Qs[1].z.shape == (K, B, 8, 8, 16)    # scale /4
    assert Qs[2].z.shape == (K, B, 4, 4, 8)     # scale /8
    assert cfg.top_latent_shape() == (4, 4, 8)
    assert pxz.z.shape == (K, B) + cfg.image_shape

    prior = prior_for(cfg)
    loss, metrics = compute_loss(prior, Qs, Ps, pxz, x)
    assert jnp.isfinite(loss)
    lw = log_weights(prior, Qs, Ps, pxz, x)
    assert lw.shape == (K, B)


def test_generate_from_spatial_prior():
    cfg = LADDER_SVHN
    model, params, x, *_ = _forward(cfg)
    z_top = jax.random.normal(jax.random.PRNGKey(5), (B,) + cfg.top_latent_shape())
    gen = model.apply(
        params, z_top, rngs={"sample": jax.random.PRNGKey(6)}, method="generate"
    )
    assert gen.sample.shape == (B,) + cfg.image_shape


def test_ladder_trains_with_standard_step():
    """The ladder plugs into the same train step as the dense models."""
    from vae_mdl_tpu.config import DataConfig, ExperimentConfig, TrainConfig
    from vae_mdl_tpu.train.state import create_train_state, make_optimizer
    from vae_mdl_tpu.train.steps import make_train_step

    cfg = ExperimentConfig(
        model=dataclasses.replace(
            LadderConfig(stages=((8, 4, 1, 2), (8, 4, 1, 2))), n_samples=2
        ),
        data=DataConfig(dataset="synthetic:svhn_cropped", batch_size=4),
        train=TrainConfig(),
    )
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x = jnp.zeros((4, 32, 32, 3))
    state = create_train_state(model, cfg.train, x, 2)
    step = make_train_step(model, cfg, tx, donate=False)

    import numpy as np

    batch = np.random.default_rng(0).integers(0, 256, (4, 32, 32, 3),
                                              dtype=np.uint8)
    losses = []
    for _ in range(5):
        state, m = step(state, jnp.asarray(batch))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("likelihood", ["gaussian", "mdl"])
def test_ladder_likelihood_heads(likelihood):
    cfg = dataclasses.replace(
        LadderConfig(stages=((8, 4, 1, 2), (8, 4, 1, 2))), likelihood=likelihood
    )
    model, params, x, Qs, Ps, pxz = _forward(cfg)
    loss, _ = compute_loss(prior_for(cfg), Qs, Ps, pxz, x)
    assert jnp.isfinite(loss)
