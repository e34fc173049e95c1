"""DReG gradient estimator + free-bits objective tests.

DReG (``objective="iwae_dreg"``, Tucker et al. 2019, arXiv:1810.04152): the
loss VALUE is the unchanged IWAE bound; the generative-half gradient is
exactly the IWAE gradient; the inference-half gradient is the
doubly-reparameterized estimator, whose variance vanishes at the true
posterior — pinned EXACTLY on a conjugate linear-Gaussian model below.

Free bits (``free_bits > 0``, Kingma et al. 2016, arXiv:1606.04934 §C.8):
per-layer expected-KL floors on the ELBO objective — below the floor the
KL term contributes no gradient; above it the objective is the plain ELBO.

The reference has neither knob (its only objectives are models/loss.py's
iwae/elbo); both are production extensions recorded in PARITY.md.
"""
import dataclasses
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.config import DataConfig
from vae_mdl_tpu.distributions import DistributionTuple, Normal
from vae_mdl_tpu.models.objective import (
    compute_loss,
    log_weights,
    training_loss_fn,
)
from vae_mdl_tpu.models.vae import build_model, prior_for
from vae_mdl_tpu.models.zoo import experiment


def _tiny(objective="iwae", n_stochastic=1, **model_over):
    cfg = experiment("model01")
    model_cfg = dataclasses.replace(
        cfg.model,
        n_latent=8,
        n_samples=4,
        n_stochastic=n_stochastic,
        mlp_hidden=16,
        objective=objective,
        encoder=dataclasses.replace(cfg.model.encoder, n_hidden=32),
        decoder=dataclasses.replace(cfg.model.decoder, n_hidden=32),
        **model_over,
    )
    cfg = dataclasses.replace(
        cfg,
        model=model_cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=8),
    )
    model = build_model(cfg.model)
    x = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.3, (8, 28, 28, 1)
    ).astype(jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(2)},
        x,
        cfg.model.n_samples,
    )
    return cfg, model, params, x


def _loss_and_grads(cfg, model, params, x):
    prior = prior_for(cfg.model)
    loss_fn = training_loss_fn(
        model, cfg, prior, x, cfg.model.n_samples, jax.random.PRNGKey(7),
        cfg.model.beta,
    )
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return float(loss), metrics, grads


def _max_abs(tree) -> float:
    return max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(tree))


def _max_abs_diff(a, b) -> float:
    return _max_abs(jax.tree.map(lambda u, v: u - v, a, b))


# -- DReG ---------------------------------------------------------------------


def test_dreg_value_is_the_iwae_bound():
    """The reported loss under DReG is the IWAE bound itself — only the
    gradient changes."""
    cfg_i, model, params, x = _tiny("iwae")
    cfg_d = dataclasses.replace(
        cfg_i, model=dataclasses.replace(cfg_i.model, objective="iwae_dreg")
    )
    loss_i, metrics_i, _ = _loss_and_grads(cfg_i, model, params, x)
    loss_d, metrics_d, _ = _loss_and_grads(cfg_d, model, params, x)
    assert loss_d == pytest.approx(loss_i, rel=1e-6)
    assert float(metrics_d["iwae_elbo"].mean()) == pytest.approx(
        float(metrics_i["iwae_elbo"].mean()), rel=1e-6
    )


@pytest.mark.parametrize("n_stochastic", [1, 2])
def test_dreg_generative_grads_match_iwae(n_stochastic):
    """DReG leaves the generative-half gradient exactly the IWAE gradient
    (sum_k w~_k d log w_k); the inference half differs (squared weights, no
    score term)."""
    cfg_i, model, params, x = _tiny("iwae", n_stochastic=n_stochastic)
    cfg_d = dataclasses.replace(
        cfg_i, model=dataclasses.replace(cfg_i.model, objective="iwae_dreg")
    )
    _, _, g_i = _loss_and_grads(cfg_i, model, params, x)
    _, _, g_d = _loss_and_grads(cfg_d, model, params, x)

    gen = [k for k in g_i["params"] if "decoder" in k]
    inf = [k for k in g_i["params"] if "encoder" in k]
    assert gen and inf and set(gen + inf) == set(g_i["params"])

    for name in gen:
        scale = max(_max_abs(g_i["params"][name]), 1e-8)
        diff = _max_abs_diff(g_i["params"][name], g_d["params"][name])
        assert diff / scale < 1e-4, f"{name}: {diff} vs scale {scale}"
    # the inference estimator is genuinely different
    enc_diff = max(
        _max_abs_diff(g_i["params"][n], g_d["params"][n]) for n in inf
    )
    enc_scale = max(_max_abs(g_i["params"][n]) for n in inf)
    assert enc_diff > 1e-3 * enc_scale


def test_dreg_zero_variance_at_true_posterior():
    """The paper's flagship property, pinned exactly: on the conjugate model
    p(z)=N(0,1), p(x|z)=N(z,1) with q(z|x)=N(a*x+b, s) AT the true posterior
    (a=1/2, b=0, s^2=1/2), every log-weight equals log p(x) — constant in z —
    so the DReG inference gradient is ~0 for EVERY seed, while the plain
    IWAE estimator still carries its score-function noise."""
    B, k = 16, 4
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 1))
    eps = jax.random.normal(jax.random.PRNGKey(4), (k, B, 1))
    phi_star = {
        "a": jnp.asarray(0.5),
        "b": jnp.asarray(0.0),
        "log_s": jnp.asarray(0.5 * float(np.log(0.5))),
    }

    def surrogates(phi):
        mu = phi["a"] * x + phi["b"]
        s = jnp.exp(phi["log_s"]) * jnp.ones_like(mu)
        z = mu + s * eps
        q = Normal(mu, s, event_axes=(-1,))
        prior = Normal(jnp.zeros(1), jnp.ones(1), event_axes=(-1,))
        pxz = DistributionTuple(
            Normal(z, jnp.ones_like(z), event_axes=(-1,)), None, axes=(-1,)
        )
        Qs = (DistributionTuple(q, z, axes=(-1,)),)
        lw = log_weights(prior, Qs, (), pxz, x)
        lw_hat = log_weights(prior, Qs, (), pxz, x, stop_q_params=True)
        w = jax.lax.stop_gradient(jax.nn.softmax(lw, axis=0))
        iwae = -jnp.mean(jnp.sum(w * lw, axis=0))
        dreg = -jnp.mean(jnp.sum(w * w * lw_hat, axis=0))
        return iwae, dreg, lw

    # sanity: at the true posterior the weights are flat (lw constant over k)
    _, _, lw = surrogates(phi_star)
    assert float(jnp.max(jnp.std(lw, axis=0))) < 1e-4

    g_dreg = jax.grad(lambda p: surrogates(p)[1])(phi_star)
    g_iwae = jax.grad(lambda p: surrogates(p)[0])(phi_star)
    assert _max_abs(g_dreg) < 1e-4, jax.tree.map(float, g_dreg)
    assert _max_abs(g_iwae) > 1e-2, jax.tree.map(float, g_iwae)


def test_dreg_hierarchical_inference_grad_matches_explicit_eq12():
    """For n_stochastic=2 the estimator must equal the EXPLICIT two-stage
    construction of Tucker et al. eq. 12: latents as a function of the live
    inference weights, composed with the log-weight as a pure function of
    the latents under fully stop-gradiented weights. The subtlety pinned
    here: q_2's parameters are mlp_encoder(z_1) — eq. 12 keeps the live
    route z_1 -> parameters, while stop-gradienting the evaluated parameter
    VALUES (the single-layer shortcut) severs it and biases the layer-1
    encoder gradient."""
    from vae_mdl_tpu.models.objective import stop_gradient_half
    from vae_mdl_tpu.models.vae import VAE

    cfg, model, params, x = _tiny("iwae_dreg", n_stochastic=2)
    prior = prior_for(cfg.model)
    k = cfg.model.n_samples
    rngs = {"sample": jax.random.PRNGKey(7)}

    _, _, g = _loss_and_grads(cfg, model, params, x)

    # normalised weights: values are sg-placement-independent
    Qs, Ps, pxz = model.apply(params, x, k, rngs=rngs)
    w = jax.nn.softmax(log_weights(prior, Qs, Ps, pxz, x), axis=0)

    sg_all = jax.tree.map(jax.lax.stop_gradient, params)

    def zs_of(p):
        Qs_p, _, _ = model.apply(p, x, k, rngs=rngs)
        return tuple(q.z for q in Qs_p)

    def lw_of(zs):
        Qs_hat = model.apply(sg_all, x, zs, method=VAE.posterior_at)
        Ps_hat, pxz_hat = model.apply(sg_all, Qs_hat,
                                      method=VAE.decode_down, rngs=rngs)
        return log_weights(prior, Qs_hat, Ps_hat, pxz_hat, x)

    def enc_surr(p):
        return -jnp.mean(jnp.sum(w * w * lw_of(zs_of(p)), axis=0))

    g_ref = jax.grad(enc_surr)(params)

    inf = [n for n in g["params"] if "encoder" in n]
    assert len(inf) == 2  # encoder + mlp_encoder_1
    for name in inf:
        scale = max(_max_abs(g_ref["params"][name]), 1e-8)
        diff = _max_abs_diff(g["params"][name], g_ref["params"][name])
        assert diff / scale < 1e-4, f"{name}: {diff} vs scale {scale}"

    # regression guard: the value-stopping shortcut is NOT eq. 12 here —
    # it must differ on the layer-1 encoder leaves (the severed route)
    def enc_surr_value_stopped(p):
        Qs2, Ps2, pxz2 = model.apply(
            stop_gradient_half(p, "generative"), x, k, rngs=rngs
        )
        lw_hat = log_weights(prior, Qs2, Ps2, pxz2, x, stop_q_params=True)
        return -jnp.mean(jnp.sum(w * w * lw_hat, axis=0))

    g_biased = jax.grad(enc_surr_value_stopped)(params)
    enc_scale = max(_max_abs(g_ref["params"]["encoder"]), 1e-8)
    assert (_max_abs_diff(g_biased["params"]["encoder"],
                          g_ref["params"]["encoder"]) / enc_scale) > 1e-3


def test_dreg_free_bits_rejected_at_construction():
    """free_bits + iwae_dreg must refuse when the train step is BUILT — the
    dreg gradient path never consults free_bits, so without the check the
    run would train with the floor silently dropped and die at the first
    eval trace instead."""
    cfg, model, params, x = _tiny("iwae_dreg", free_bits=0.25)
    with pytest.raises(ValueError, match="free_bits"):
        training_loss_fn(model, cfg, prior_for(cfg.model), x,
                         cfg.model.n_samples, jax.random.PRNGKey(0), 1.0)


def test_dreg_rejects_non_vae_family():
    """The ladder families share top-down parameters between inference and
    generation — the DReG parameter partition is undefined there and must
    refuse loudly."""
    cfg = experiment("ladder_svhn")
    model = build_model(cfg.model)
    fake = SimpleNamespace(
        model=SimpleNamespace(objective="iwae_dreg", free_bits=0.0)
    )
    with pytest.raises(ValueError, match="VAE family"):
        training_loss_fn(model, fake, None, None, 1, jax.random.PRNGKey(0),
                         1.0)


def test_dreg_train_step_runs():
    """End-to-end: a jitted train step under objective='iwae_dreg' produces
    finite metrics and moves the params."""
    from vae_mdl_tpu.train.state import create_train_state, make_optimizer
    from vae_mdl_tpu.train.steps import make_train_step

    cfg, model, _, x = _tiny("iwae_dreg")
    tx = make_optimizer(cfg.train)
    state = create_train_state(model, cfg.train, x, cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)
    batch = (x * 255).astype(jnp.uint8)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    moved = _max_abs_diff(new_state.params, state.params)
    assert moved > 0


# -- free bits ----------------------------------------------------------------


def test_free_bits_inactive_floor_is_the_elbo():
    """With the floor below every layer's actual KL, the free-bits objective
    IS the ELBO: same value, same gradients (up to summation-order noise)."""
    cfg_e, model, params, x = _tiny("elbo")
    cfg_f = dataclasses.replace(
        cfg_e, model=dataclasses.replace(cfg_e.model, free_bits=1e-6)
    )
    loss_e, _, g_e = _loss_and_grads(cfg_e, model, params, x)
    loss_f, metrics_f, g_f = _loss_and_grads(cfg_f, model, params, x)
    assert loss_f == pytest.approx(loss_e, rel=1e-5)
    scale = max(_max_abs(g_e), 1e-8)
    assert _max_abs_diff(g_e, g_f) / scale < 1e-4
    assert float(metrics_f["kl_floored_layers"]) == 0.0


def test_free_bits_floor_blocks_the_kl_gradient():
    """With the floor above every layer's KL, the objective reduces to
    reconstruction-only: gradients equal those of -E[log p(x|z)] alone."""
    cfg, model, params, x = _tiny("elbo", free_bits=1e6)
    _, metrics, g_f = _loss_and_grads(cfg, model, params, x)
    assert float(metrics["kl_floored_layers"]) == 1.0

    prior = prior_for(cfg.model)

    def recon_only(p):
        Qs, Ps, pxz = model.apply(
            p, x, cfg.model.n_samples, rngs={"sample": jax.random.PRNGKey(7)}
        )
        from vae_mdl_tpu.models.objective import bound_terms

        lpxz, _ = bound_terms(prior, Qs, Ps, pxz, x)
        return -jnp.mean(lpxz)

    g_r = jax.grad(recon_only)(params)
    scale = max(_max_abs(g_r), 1e-8)
    assert _max_abs_diff(g_r, g_f) / scale < 1e-4


def test_eval_step_free_bits_reports_true_bound():
    """Eval (and hence best-checkpoint selection) ranks by the TRUE bound:
    the free-bits floor is a training-only regularizer — a floored layer's
    KL is invisible to the floored objective, so selecting on it would rank
    checkpoints by reconstruction alone."""
    from vae_mdl_tpu.train.state import create_train_state
    from vae_mdl_tpu.train.steps import make_eval_step

    cfg_f, model, params, x = _tiny("elbo", free_bits=1e6)
    cfg_0 = dataclasses.replace(
        cfg_f, model=dataclasses.replace(cfg_f.model, free_bits=0.0)
    )
    state = create_train_state(model, cfg_f.train, x, cfg_f.model.n_samples)
    batch = (x * 255).astype(jnp.uint8)
    m_f = make_eval_step(model, cfg_f)(state, batch)
    m_0 = make_eval_step(model, cfg_0)(state, batch)
    assert float(m_f["loss"]) == pytest.approx(float(m_0["loss"]), rel=1e-6)
    # the floored objective would have been ~1e6 (the floor replaces the
    # KL term wholesale) — make sure eval really dodged it
    assert abs(float(m_f["loss"])) < 1e5


def test_free_bits_two_layer_counts_floored_layers():
    cfg, model, params, x = _tiny("elbo", n_stochastic=2, free_bits=1e6)
    _, metrics, _ = _loss_and_grads(cfg, model, params, x)
    assert float(metrics["kl_floored_layers"]) == 2.0
    assert len(metrics["kl"]) == 2


def test_free_bits_requires_elbo():
    cfg, model, params, x = _tiny("iwae", free_bits=0.1)
    with pytest.raises(ValueError, match="free_bits"):
        _loss_and_grads(cfg, model, params, x)
