"""Ground-truth evidence tests: the IS harness against exact quadrature.

The reference's only scientific regression is reproducing -85.02 nats on
MNIST (README.md:8-13) — an end-to-end number with no independent ground
truth. These tests construct one: on models with 1-D latents, log p(x) is
computable EXACTLY by Gauss-Hermite quadrature through the very same
decoder, so the whole estimation pipeline — encoder proposal, log-weight
assembly (models/objective.py), streaming k-chunked logsumexp
(evaluation/harness.py) — must converge to it. ALL FIVE likelihood heads
(bernoulli / gaussian / dl / mdl / pmdl — the reference's full
observation-model ladder plus its exported loc-conditioned alternative,
SURVEY.md §2.1) are covered, plus the two-layer hierarchical bound via
nested location-scale quadrature.

Calibration: at the chosen k the harness lands within 0.01-0.02 nats of
truth across seeds; tolerances carry a >3x margin. This closes a class of
bugs formula-parity tests cannot see: a consistent sign/axes/
normalisation error on both sides of a parity check cancels, but it
cannot match an independent numerical integral.
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


def _make_batch(rng, n, channels=1, grayscale=False):
    """Structured images: a prototype with 5% pixel flips; ``grayscale``
    adds jitter towards mid-levels so discretized heads see interior bins
    as well as the 0/255 edge bins."""
    x = np.repeat(_PROTOS, channels, axis=-1)[rng.integers(0, 2, n)]
    flip = rng.random(x.shape) < 0.05
    x = (x + flip) % 2
    if grayscale:
        g = rng.integers(0, 64, x.shape)
        return (x * 255 - x * g + (1 - x) * g).clip(0, 255).astype(np.uint8)
    return (x * 255).astype(np.uint8)


def _tiny_trained(n_stochastic: int, likelihood: str, channels: int,
                  grayscale: bool, steps: int = 400):
    """A 1-D-latent VAE (depth 1 or 2) trained enough that the encoder is
    a usable proposal; returns (model, cfg, state, rng)."""
    cfg = experiment("model01")
    model_cfg = dataclasses.replace(
        cfg.model,
        image_shape=(4, 4, channels),
        n_latent=1,
        likelihood=likelihood,
        n_mix=2,
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
    state = create_train_state(model, cfg.train,
                               jnp.zeros((64, 4, 4, channels)),
                               cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)
    rng = np.random.default_rng(0)
    for _ in range(steps):
        state, _ = step(state, jnp.asarray(
            _make_batch(rng, 64, channels, grayscale)))
    return model, cfg, state, rng


def _gh(n_nodes):
    """Gauss-Hermite nodes for E_{z~N(0,1)}[f(z)] = sum_i e^{logc_i} f(s_i):
    s = sqrt(2)*t, logc = log(w) - log(sqrt(pi))."""
    t, w = np.polynomial.hermite.hermgauss(n_nodes)
    return (jnp.asarray(np.sqrt(2.0) * t, jnp.float32),
            jnp.asarray(np.log(w) - 0.5 * np.log(np.pi), jnp.float32))


def _per_image_logp(model, params, z1, x):
    """log p(x_b | z1_i) -> [B, N]. Evaluated one image at a time with x
    broadcast to the node axis — the MoDL likelihood conditions its locs
    on the OBSERVED x (distributions/mixture.py autoregressive_locs), so x
    and the head parameters must share their batch shape."""
    obs = model.apply(params, z1, method=lambda m, a: m.decoder(a))
    rows = []
    for b in range(x.shape[0]):
        xb = jnp.broadcast_to(x[b], (z1.shape[0],) + x.shape[1:])
        lp = obs.log_prob(xb)
        rows.append(lp.sum(axis=tuple(range(1, lp.ndim))))
    return jnp.stack(rows)


def _quad_depth1(model, params, x, n_nodes):
    """log p(x) = log E_{z~N(0,1)} p(x|z), exactly."""
    s, logc = _gh(n_nodes)
    lp = _per_image_logp(model, params, s[:, None], x)  # [B, N]
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
    lp = _per_image_logp(model, params, z1, x)  # [B, N*N]
    lp = lp.reshape(x.shape[0], n_nodes, n_nodes)
    inner = jax.scipy.special.logsumexp(lp + logc[None, None, :], axis=2)
    return jax.scipy.special.logsumexp(inner + logc[None, :], axis=1)


# (depth, likelihood, channels, grayscale data, n_samples, tolerance):
# bernoulli converges fastest (0.01 at k=5000); the sharper dl head and
# the mdl/gaussian heads need k=20000 for a >3x margin (calibrated over
# three seeds each)
_CASES = [
    (1, "bernoulli", 1, False, 5000, 0.05),
    (2, "bernoulli", 1, False, 5000, 0.05),
    (1, "dl", 1, True, 5000, 0.05),
    (1, "mdl", 3, True, 20000, 0.08),
    (1, "pmdl", 3, True, 20000, 0.08),
    (1, "gaussian", 1, True, 20000, 0.08),
]


@pytest.mark.parametrize("depth,likelihood,channels,gray,k,tol", _CASES)
def test_is_harness_matches_exact_evidence(depth, likelihood, channels,
                                           gray, k, tol):
    quad = _quad_depth1 if depth == 1 else _quad_depth2
    model, cfg, state, rng = _tiny_trained(depth, likelihood, channels, gray)
    test_u8 = _make_batch(rng, 6, channels, gray)
    x = jnp.asarray(test_u8.astype(np.float32) / 255.0)

    truth = quad(model, state.params, x, 201)
    # the quadrature itself must be converged (node-count stability; the
    # sharp discretized likelihoods need denser nodes than bernoulli)
    truth_hi = quad(model, state.params, x, 301)
    np.testing.assert_allclose(np.asarray(truth), np.asarray(truth_hi),
                               atol=0.01)

    _, per_image, metrics = evaluate_llh(
        model, cfg, state.params, test_u8,
        n_samples=k, k_chunk=1000, batch_size=6, seed=0, progress=False)
    np.testing.assert_allclose(per_image, np.asarray(truth), atol=tol)
    # and the summary metrics agree with the per-image vector
    assert metrics["llh"] == pytest.approx(float(per_image.mean()), rel=1e-6)
