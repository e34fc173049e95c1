"""Model zoo tests: every reference model config builds, runs forward,
computes a finite bound, and generates samples of the right shape.

This replaces the reference's eyeball-driven ``__main__`` smoke tests
(SURVEY.md §4) with assertions.
"""
import jax
import jax.numpy as jnp
import pytest

from vae_mdl_tpu.models import MODELS, build_model, compute_loss
from vae_mdl_tpu.models.objective import log_weights
from vae_mdl_tpu.models.vae import prior_for

B, K = 2, 3


def _forward(name):
    cfg = MODELS[name]
    model = build_model(cfg)
    h, w, c = cfg.image_shape
    x = jax.random.uniform(jax.random.PRNGKey(9), (B, h, w, c))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    Qs, Ps, pxz = model.apply(params, x, K, rngs={"sample": jax.random.PRNGKey(2)})
    return cfg, model, params, x, Qs, Ps, pxz


# ladder_svhn has spatial latents and its own test file (test_ladder.py)
_DENSE = sorted(n for n in MODELS if hasattr(MODELS[n], "latents"))


@pytest.mark.parametrize("name", _DENSE)
def test_forward_and_loss(name):
    cfg, model, params, x, Qs, Ps, pxz = _forward(name)
    latents = cfg.latents()

    assert len(Qs) == cfg.n_stochastic
    assert Qs[0].z.shape == (K, B, latents[0])
    for i, q in enumerate(Qs):
        assert q.z.shape[-1] == latents[i]
    assert pxz.z.shape == (K, B) + cfg.image_shape

    prior = prior_for(cfg)
    loss, metrics = compute_loss(prior, Qs, Ps, pxz, x)
    assert jnp.isfinite(loss)
    assert jnp.isfinite(metrics["bpd"])
    # log-weights agree with the loss: -logmeanexp(log_w).mean() == loss
    from vae_mdl_tpu.ops.math import logmeanexp

    lw = log_weights(prior, Qs, Ps, pxz, x)
    assert lw.shape == (K, B)
    recon = -jnp.mean(logmeanexp(lw, axis=0))
    assert jnp.allclose(recon, loss, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("name", ["model01", "model05", "model06"])
def test_generate(name):
    cfg, model, params, x, Qs, Ps, pxz = _forward(name)
    n_top = cfg.latents()[-1]
    z_top = jax.random.normal(jax.random.PRNGKey(5), (B, n_top))
    gen = model.apply(
        params, z_top, rngs={"sample": jax.random.PRNGKey(6)}, method="generate"
    )
    assert gen.sample.shape == (B,) + cfg.image_shape
    assert jnp.isfinite(gen.sample).all()


def test_model06_metrics_have_per_layer_kls():
    cfg, model, params, x, Qs, Ps, pxz = _forward("model06")
    loss, metrics = compute_loss(prior_for(cfg), Qs, Ps, pxz, x)
    assert "kl1" in metrics and "kl2" in metrics


def test_deeper_than_two_layers():
    """The generic ladder: 3 stochastic layers via config only."""
    import dataclasses

    cfg = dataclasses.replace(MODELS["model06"], n_stochastic=3, name="deep")
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (B, 32, 32, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    Qs, Ps, pxz = model.apply(params, x, K, rngs={"sample": jax.random.PRNGKey(2)})
    assert len(Qs) == 3 and len(Ps) == 2
    loss, metrics = compute_loss(prior_for(cfg), Qs, Ps, pxz, x)
    assert jnp.isfinite(loss)


def test_bound_logstd_flag():
    """The reference's commented-out tanh(logstd) variant as a config flag."""
    import dataclasses

    cfg = dataclasses.replace(MODELS["model03"], bound_logstd=True)
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (B, 32, 32, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    Qs, Ps, pxz = model.apply(params, x, K, rngs={"sample": jax.random.PRNGKey(2)})
    # tanh bounds logscale to [-1, 1] => scale of the DL in [e^-1, e]
    assert jnp.all(pxz.dist.logscale <= 1.0 + 1e-6)
    assert jnp.all(pxz.dist.logscale >= -1.0 - 1e-6)


def test_pmdl_likelihood_head():
    """Loc-conditioned mixture head (the reference's exported alternative,
    utils/mdl_plain.py) as a config: per-pixel log-prob, event axes (-1,-2)."""
    import dataclasses

    cfg = dataclasses.replace(
        MODELS["model05"], likelihood="pmdl", name="model05_pmdl"
    )
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (B, 32, 32, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    Qs, Ps, pxz = model.apply(params, x, K, rngs={"sample": jax.random.PRNGKey(2)})
    assert pxz.axes == (-1, -2)
    assert pxz.dist.log_prob(x).shape == (K, B, 32, 32)
    loss, metrics = compute_loss(prior_for(cfg), Qs, Ps, pxz, x)
    assert jnp.isfinite(loss)


def test_bf16_body_keeps_f32_likelihood_head():
    """compute_dtype='bfloat16' must NOT quantize the likelihood parameters:
    the head layer (even when the zoo folds it into conv_layers) runs f32.
    A bf16 head step near |mu|~1 is 2^-8 — a whole 1/255 DL bin width
    (code-review finding; docs/design.md §3 contract)."""
    import dataclasses

    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment

    for name in ("model03", "model05"):
        cfg = dataclasses.replace(
            experiment(name).model, compute_dtype="bfloat16")
        model = build_model(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
        params = model.init(
            {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
            x, 1,
        )
        Qs, Ps, pxz = model.apply(params, x, 1,
                                  rngs={"sample": jax.random.PRNGKey(3)})
        raw = (pxz.dist.parameters if hasattr(pxz.dist, "parameters")
               else pxz.dist.loc)
        assert raw.dtype == jnp.float32
        # values must be OFF the bf16 grid (a pure astype would pass the
        # dtype check while carrying quantized values)
        rt = raw.astype(jnp.bfloat16).astype(jnp.float32)
        assert float(jnp.max(jnp.abs(raw - rt))) > 0, name


def test_head_pad_keeps_observation_contract():
    """head_pad emits an aligned head channel count and slices back: the
    observation still carries exactly n_mix*10 parameters, the loss is
    finite, and the padded head kernel has the padded width (lane-alignment
    experiment hook, docs/design.md §12b — measured SLOWER, kept opt-in)."""
    import dataclasses

    from vae_mdl_tpu.models.objective import compute_loss
    from vae_mdl_tpu.models.vae import build_model, prior_for
    from vae_mdl_tpu.models.zoo import MODELS

    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    cfg = dataclasses.replace(
        MODELS["model05"],
        decoder=dataclasses.replace(MODELS["model05"].decoder, head_pad=64),
    )
    model = build_model(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)}, x, 1
    )
    Qs, Ps, pxz = model.apply(params, x, 3, rngs={"sample": jax.random.PRNGKey(3)})
    assert pxz.dist.parameters.shape[-1] == 50

    kernels = [
        (jax.tree_util.keystr(p), leaf.shape)
        for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    ]
    assert any("conv_3" in name and shape[-1] == 64 for name, shape in kernels), kernels

    loss, _ = compute_loss(prior_for(cfg), Qs, Ps, pxz, x)
    assert bool(jnp.isfinite(loss))


def test_likelihood_io_dtype_quantizes_boundary_only():
    """likelihood_io_dtype='bfloat16' quantizes the decoder-head ->
    likelihood boundary tensor (the §12n traffic lever, +9% measured on
    the chip) while the likelihood MATH stays float32: the log-prob is
    f32-typed, matches the f32-boundary value to bf16 resolution, and is
    BIT-EQUAL to the f32 jnp chain evaluated on the quantized params —
    i.e. only the boundary quantization changed, not the arithmetic."""
    import dataclasses

    import numpy as np

    from vae_mdl_tpu.distributions.mixture import mixture_log_prob
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment

    base = experiment("model05").model
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    init_rngs = {"params": jax.random.PRNGKey(1),
                 "sample": jax.random.PRNGKey(2)}

    cfg16 = dataclasses.replace(base, likelihood_io_dtype="bfloat16",
                                use_pallas=False)
    cfg32 = dataclasses.replace(base, use_pallas=False)
    m16, m32 = build_model(cfg16), build_model(cfg32)
    params = m32.init(init_rngs, x, 1)  # same tree for both configs

    r = {"sample": jax.random.PRNGKey(3)}
    _, _, pxz16 = m16.apply(params, x, 1, rngs=r)
    _, _, pxz32 = m32.apply(params, x, 1, rngs=r)

    assert pxz16.dist.parameters.dtype == jnp.bfloat16
    assert pxz32.dist.parameters.dtype == jnp.float32

    lp16 = pxz16.dist.log_prob(x)
    lp32 = pxz32.dist.log_prob(x)
    assert lp16.dtype == jnp.float32  # math stays f32
    # boundary quantization moves values at bf16 resolution, nothing more
    np.testing.assert_allclose(np.asarray(lp16), np.asarray(lp32),
                               rtol=0.05, atol=0.05)
    # and the quantized-path value IS the f32 chain on quantized params
    ref = mixture_log_prob(
        x, pxz32.dist.parameters.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(lp16), np.asarray(ref))

    # the Pallas kernel consumes the bf16 boundary identically (interpret
    # mode on CPU; same program compiles via Mosaic on TPU)
    cfg16k = dataclasses.replace(cfg16, use_pallas=True)
    m16k = build_model(cfg16k)
    _, _, pxzk = m16k.apply(params, x, 1, rngs=r)
    lpk = pxzk.dist.log_prob(x)
    np.testing.assert_allclose(np.asarray(lpk), np.asarray(lp16),
                               rtol=1e-5, atol=1e-5)


def test_likelihood_io_dtype_validated_at_config_time():
    """A typo'd dtype or a non-mdl likelihood raises at ModelConfig
    construction, not as an opaque astype error deep in the decoder
    (ADVICE r4)."""
    import dataclasses

    import pytest

    from vae_mdl_tpu.models.zoo import experiment

    base = experiment("model05").model
    with pytest.raises(ValueError, match="likelihood_io_dtype"):
        dataclasses.replace(base, likelihood_io_dtype="bfloat61")
    with pytest.raises(ValueError, match="mdl"):
        dataclasses.replace(experiment("model01").model,
                            likelihood_io_dtype="bfloat16")
    # valid value still constructs
    dataclasses.replace(base, likelihood_io_dtype="bfloat16")
