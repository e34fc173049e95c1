"""Ground-truth evidence tests: the IS harness against exact quadrature.

The reference's only scientific regression is reproducing -85.02 nats on
MNIST (README.md:8-13) — an end-to-end number with no independent ground
truth. These tests construct one: on models with 1-D latents, log p(x) is
computable EXACTLY by Gauss-Hermite quadrature through the very same
decoder, so the whole estimation pipeline — encoder proposal, log-weight
assembly (models/objective.py), streaming k-chunked logsumexp
(evaluation/harness.py) — must converge to it. Calibration: at k=5000 the
harness lands within ~0.01 nats of truth for both depths; the 0.05
tolerance is a 5x margin.

This closes a class of bugs formula-parity tests cannot see: a consistent
sign/axes/normalisation error on both sides of a parity check cancels, but
it cannot match an independent numerical integral.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.config import DataConfig
from vae_mdl_tpu.evaluation.harness import evaluate_llh
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.state import create_train_state, make_optimizer
from vae_mdl_tpu.train.steps import make_train_step

_PROTOS = np.array(
    [[[1, 1, 0, 0]] * 2 + [[0, 0, 1, 1]] * 2, [[0, 1, 0, 1]] * 4],
    np.float32,
)[..., None]  # two 4x4x1 prototypes


def _make_batch(rng, n, grayscale=False):
    """Structured images: a prototype with 5% pixel flips; ``grayscale``
    adds jitter towards mid-levels so a discretized-logistic head sees
    interior bins as well as the 0/255 edge bins."""
    x = _PROTOS[rng.integers(0, 2, n)]
    flip = rng.random(x.shape) < 0.05
    x = (x + flip) % 2
    if grayscale:
        g = rng.integers(0, 64, x.shape)
        return (x * 255 - x * g + (1 - x) * g).clip(0, 255).astype(np.uint8)
    return (x * 255).astype(np.uint8)


def _tiny_trained(n_stochastic: int, likelihood: str = "bernoulli",
                  steps: int = 400):
    """A 1-D-latent Bernoulli VAE (depth 1 or 2) trained enough that the
    encoder is a usable proposal; returns (model, cfg, state, rng)."""
    cfg = experiment("model01")
    model_cfg = dataclasses.replace(
        cfg.model,
        image_shape=(4, 4, 1),
        n_latent=1,
        likelihood=likelihood,
        n_stochastic=n_stochastic,
        latent_sizes=(1,) * n_stochastic,
        mlp_hidden=16,
        encoder=dataclasses.replace(cfg.model.encoder, n_hidden=16),
        decoder=dataclasses.replace(cfg.model.decoder, n_hidden=16),
    )
    cfg = dataclasses.replace(
        cfg,
        model=model_cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=64,
                        dynamic_binarization=False),
    )
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_train_state(model, cfg.train, jnp.zeros((64, 4, 4, 1)),
                               cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)
    rng = np.random.default_rng(0)
    gray = likelihood == "dl"
    for _ in range(steps):
        state, _ = step(state, jnp.asarray(_make_batch(rng, 64, gray)))
    return model, cfg, state, rng


def _gh(n_nodes):
    """Gauss-Hermite nodes for E_{z~N(0,1)}[f(z)] = sum_i e^{logc_i} f(s_i):
    s = sqrt(2)*t, logc = log(w) - log(sqrt(pi))."""
    t, w = np.polynomial.hermite.hermgauss(n_nodes)
    return (jnp.asarray(np.sqrt(2.0) * t, jnp.float32),
            jnp.asarray(np.log(w) - 0.5 * np.log(np.pi), jnp.float32))


def _decoder_logp(model, params, z1, x):
    """log p(x_b | z1_i) for every (image, node) pair -> [B, N]."""
    obs = model.apply(params, z1, method=lambda m, a: m.decoder(a))
    return obs.log_prob(x[:, None]).sum(axis=(-1, -2, -3))


def _quad_depth1(model, params, x, n_nodes):
    """log p(x) = log E_{z~N(0,1)} p(x|z), exactly."""
    s, logc = _gh(n_nodes)
    lp = _decoder_logp(model, params, s[:, None], x)  # [B, N]
    return jax.scipy.special.logsumexp(lp + logc[None], axis=1)


def _quad_depth2(model, params, x, n_nodes):
    """log p(x) = log E_{z2~N(0,1)} E_{z1~p(z1|z2)} p(x|z1), exactly —
    the inner integral uses the location-scale transform of the learned
    Normal p(z1|z2) (models/vae.py decode_down)."""
    s, logc = _gh(n_nodes)
    p12 = model.apply(params, s[:, None],
                      method=lambda m, a: m.mlp_decoders[0](a))
    loc, scale = p12.loc[:, 0], p12.scale[:, 0]  # [N]
    z1 = (loc[:, None] + scale[:, None] * s[None, :]).reshape(-1, 1)
    lp = _decoder_logp(model, params, z1, x)  # [B, N*N]
    lp = lp.reshape(x.shape[0], n_nodes, n_nodes)
    inner = jax.scipy.special.logsumexp(lp + logc[None, None, :], axis=2)
    return jax.scipy.special.logsumexp(inner + logc[None, :], axis=1)


@pytest.mark.parametrize("depth,likelihood,quad", [
    (1, "bernoulli", _quad_depth1),
    (2, "bernoulli", _quad_depth2),
    # discretized-logistic head: the where-cascade's edge bins (x=0, x=1)
    # AND interior bins enter a full-evidence check
    (1, "dl", _quad_depth1),
])
def test_is_harness_matches_exact_evidence(depth, likelihood, quad):
    model, cfg, state, rng = _tiny_trained(depth, likelihood)
    test_u8 = _make_batch(rng, 6, grayscale=likelihood == "dl")
    x = jnp.asarray(test_u8.astype(np.float32) / 255.0)

    truth = quad(model, state.params, x, 201)
    # the quadrature itself must be converged (node-count stability; the
    # sharp DL likelihood needs denser nodes than the Bernoulli cases)
    truth_hi = quad(model, state.params, x, 301)
    np.testing.assert_allclose(np.asarray(truth), np.asarray(truth_hi),
                               atol=2e-3)

    _, per_image, metrics = evaluate_llh(
        model, cfg, state.params, test_u8,
        n_samples=5000, k_chunk=1000, batch_size=6, seed=0, progress=False)
    np.testing.assert_allclose(per_image, np.asarray(truth), atol=0.05)
    # and the summary metrics agree with the per-image vector
    assert metrics["llh"] == pytest.approx(float(per_image.mean()), rel=1e-6)
