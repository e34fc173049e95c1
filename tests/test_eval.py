"""5000-IS evaluation harness tests: streaming logsumexp exactness, padding,
and determinism."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.config import DataConfig
from vae_mdl_tpu.evaluation.harness import evaluate_llh, make_batch_evaluator
from vae_mdl_tpu.models.objective import log_weights
from vae_mdl_tpu.models.vae import build_model, prior_for
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.ops.math import logmeanexp


def _setup(name="model01", binarize=False):
    cfg = experiment(name)
    cfg = dataclasses.replace(
        cfg, data=DataConfig(dataset="synthetic:mnist",
                             dynamic_binarization=binarize)
    )
    model = build_model(cfg.model)
    h, w, c = cfg.model.image_shape
    x = (jax.random.uniform(jax.random.PRNGKey(3), (4, h, w, c)) > 0.5).astype(
        jnp.float32
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    return cfg, model, params, x


def test_streaming_matches_direct_logmeanexp():
    """k-chunked streaming == one-shot logmeanexp with the same keys."""
    cfg, model, params, x = _setup()
    ev = make_batch_evaluator(model, cfg, n_samples=20, k_chunk=5)
    llh_stream = ev(params, x, jax.random.PRNGKey(7))

    keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), 1), 4)
    prior = prior_for(cfg.model)
    lws = [
        log_weights(prior, *model.apply(params, x, 5, rngs={"sample": k}), x=x)
        for k in keys
    ]
    llh_direct = logmeanexp(jnp.concatenate(lws, 0), axis=0)
    np.testing.assert_allclose(
        np.asarray(llh_stream), np.asarray(llh_direct), rtol=1e-5, atol=1e-3
    )


def test_streaming_logmeanexp_all_neg_inf_is_neg_inf():
    """logsumexp convention: a column whose every log-weight is -inf (a
    fully diverged posterior) finalizes to -inf, not NaN — and does not
    poison neighbouring finite columns."""
    from vae_mdl_tpu.ops.math import (
        streaming_logmeanexp_finalize,
        streaming_logmeanexp_init,
        streaming_logmeanexp_update,
    )

    state = streaming_logmeanexp_init((3,))
    chunk1 = jnp.asarray([[-jnp.inf, 0.0, -jnp.inf],
                          [-jnp.inf, 1.0, -jnp.inf]])
    chunk2 = jnp.asarray([[-jnp.inf, 2.0, 5.0],
                          [-jnp.inf, 3.0, 6.0]])
    state = streaming_logmeanexp_update(state, chunk1, axis=0)
    state = streaming_logmeanexp_update(state, chunk2, axis=0)
    out = np.asarray(streaming_logmeanexp_finalize(state))
    assert out[0] == -np.inf
    want1 = jax.scipy.special.logsumexp(jnp.asarray([0.0, 1.0, 2.0, 3.0])) - np.log(4)
    # column 2 saw -inf entries in its first chunk only
    want2 = jax.scipy.special.logsumexp(jnp.asarray([5.0, 6.0])) - np.log(4)
    np.testing.assert_allclose(out[1], float(want1), rtol=1e-6)
    np.testing.assert_allclose(out[2], float(want2), rtol=1e-6)


def test_evaluate_llh_handles_ragged_tail():
    cfg, model, params, _ = _setup()
    imgs = (np.random.default_rng(0).random((11, 28, 28, 1)) * 255).astype(np.uint8)
    mean_llh, per_image, metrics = evaluate_llh(
        model, cfg, params, imgs, n_samples=10, k_chunk=5, batch_size=4,
        progress=False,
    )
    assert per_image.shape == (11,)
    assert np.isfinite(per_image).all()
    assert metrics["bpd"] > 0


def test_evaluation_is_deterministic():
    cfg, model, params, _ = _setup(binarize=True)
    imgs = (np.random.default_rng(1).random((6, 28, 28, 1)) * 255).astype(np.uint8)
    a = evaluate_llh(model, cfg, params, imgs, n_samples=10, k_chunk=5,
                     batch_size=3, seed=5, progress=False)[1]
    b = evaluate_llh(model, cfg, params, imgs, n_samples=10, k_chunk=5,
                     batch_size=3, seed=5, progress=False)[1]
    assert np.array_equal(a, b)


def test_evaluate_llh_small_tail_large_batch():
    """Regression: leftover*2 < batch_size must still pad correctly."""
    cfg, model, params, _ = _setup()
    imgs = (np.random.default_rng(2).random((3, 28, 28, 1)) * 255).astype(np.uint8)
    _, per_image, _ = evaluate_llh(
        model, cfg, params, imgs, n_samples=10, k_chunk=5, batch_size=8,
        progress=False,
    )
    assert per_image.shape == (3,)
    assert np.isfinite(per_image).all()


def test_k_curve_rows_are_exact_partial_bounds():
    """with_curve: row j of the curve IS the k=(j+1)*k_chunk bound over the
    same weight stream — pinned against logmeanexp of the concatenated
    chunk log-weights, and the last row equals the returned llh."""
    cfg, model, params, x = _setup()
    ev = make_batch_evaluator(model, cfg, n_samples=20, k_chunk=5,
                              with_curve=True)
    llh, curve = ev(params, x, jax.random.PRNGKey(7))
    assert curve.shape == (4, x.shape[0])

    keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), 1), 4)
    prior = prior_for(cfg.model)
    lws = [
        log_weights(prior, *model.apply(params, x, 5, rngs={"sample": k}), x=x)
        for k in keys
    ]
    for j in range(4):
        partial = logmeanexp(jnp.concatenate(lws[: j + 1], 0), axis=0)
        np.testing.assert_allclose(np.asarray(curve[j]), np.asarray(partial),
                                   rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(curve[-1]), np.asarray(llh),
                               rtol=1e-6, atol=1e-6)


def test_k_curve_through_evaluate_llh_with_ragged_tail_and_khat():
    """The test-set mean curve survives batching, tail padding (the pad
    columns must NOT contribute), and composes with the khat extra; its
    final entry is the returned mean."""
    cfg, model, params, _ = _setup()
    imgs = (np.random.default_rng(3).random((11, 28, 28, 1)) * 255).astype(
        np.uint8
    )
    mean_llh, per_image, metrics = evaluate_llh(
        model, cfg, params, imgs, n_samples=30, k_chunk=10, batch_size=4,
        progress=False, khat=True, k_curve=True,
    )
    assert list(metrics["k_curve_ks"]) == [10, 20, 30]
    assert metrics["k_curve_llh"].shape == (3,)
    assert mean_llh == pytest.approx(metrics["k_curve_llh"][-1], rel=1e-6)
    # curve mean at full k must also equal the per-image mean directly
    assert metrics["k_curve_llh"][-1] == pytest.approx(
        float(per_image.mean(dtype=np.float64)), rel=1e-6)
    assert "khat_mean" in metrics  # extras compose
