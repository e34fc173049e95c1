"""Active-units diagnostic (Burda et al. 2016 §5.2).

Closed-form check on a fake posterior plus shape/determinism coverage on
real families (dense MLP latents and the spatial biladder chain).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.distributions import DistributionTuple
from vae_mdl_tpu.distributions.continuous import Normal
from vae_mdl_tpu.evaluation import active_units
from vae_mdl_tpu.models.zoo import experiment


class _FakePosterior:
    """q(z|x) whose mean is [10 * mean(x), 0.5]: dimension 0 varies with
    the input, dimension 1 is constant — AU must be exactly 1 of 2."""

    def apply(self, params, x, n_samples, rngs=None, method=None):
        m0 = 10.0 * jnp.mean(x, axis=(1, 2, 3))
        m1 = jnp.full_like(m0, 0.5)
        loc = jnp.stack([m0, m1], axis=-1)
        q = Normal(loc, jnp.ones_like(loc))
        return (DistributionTuple(q, None, axes=(-1,)),)


def test_active_units_closed_form():
    cfg = experiment("model05")  # no binarization in preprocess
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (64, 8, 8, 3), dtype=np.uint8)
    out = active_units(_FakePosterior(), cfg, params=None, images=images,
                       batch_size=16)
    assert out["au"] == [1]
    assert out["n_dims"] == [2]
    assert out["au_total"] == 1
    # the constant dimension's variance is numerically zero
    assert out["variance"][0][1] == pytest.approx(0.0, abs=1e-12)


def test_active_units_requires_a_full_batch():
    cfg = experiment("model05")
    with pytest.raises(ValueError, match="full batch"):
        active_units(_FakePosterior(), cfg, None,
                     np.zeros((4, 8, 8, 3), np.uint8), batch_size=16)
    # batch_size=0 (e.g. an empty test split upstream) is a named error,
    # not a ZeroDivisionError
    with pytest.raises(ValueError, match="positive"):
        active_units(_FakePosterior(), cfg, None,
                     np.zeros((4, 8, 8, 3), np.uint8), batch_size=0)


def _real_au(name, images):
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.train.state import create_train_state

    cfg = experiment(name)
    model = build_model(cfg.model)
    x0 = jnp.zeros((8,) + cfg.model.image_shape, jnp.float32)
    state = create_train_state(model, cfg.train, x0, 1)
    return active_units(model, cfg, state.params, images, batch_size=16), cfg


def test_active_units_real_families():
    rng = np.random.default_rng(1)

    # dense MLP latents (binarized-bernoulli preprocess path)
    imgs = rng.integers(0, 256, (32, 16, 16, 1), dtype=np.uint8)
    out, cfg = _real_au("digits", imgs)
    assert out["n_dims"] == [cfg.model.n_latent]
    assert 0 <= out["au"][0] <= cfg.model.n_latent

    # spatial multi-layer chain: per-layer dims follow the stage latents,
    # layer 1 (nearest the observation) first
    imgs = rng.integers(0, 256, (32, 32, 32, 3), dtype=np.uint8)
    out, cfg = _real_au("biladder_svhn", imgs)
    stages = cfg.model.stages
    h, w = cfg.model.image_shape[:2]
    dims = []
    for (_h, lat, _n, rate) in stages:
        h, w = h // rate, w // rate
        dims.append(h * w * lat)
    assert out["n_dims"] == dims
    for a, d in zip(out["au"], dims):
        assert 0 <= a <= d

    # deterministic: same inputs, same seed, same counts
    again, _ = _real_au("biladder_svhn", imgs)
    assert again["au"] == out["au"]
