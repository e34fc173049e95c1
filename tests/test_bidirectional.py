"""Bidirectional (top-down posterior) ladder VAE tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.models.bidirectional import BILADDER_SVHN, BiLadderConfig
from vae_mdl_tpu.models.objective import compute_loss, log_weights
from vae_mdl_tpu.models.vae import build_model, prior_for

B, K = 2, 3


def _small():
    return BiLadderConfig(stages=((8, 4, 1, 2), (8, 4, 1, 2)), n_samples=2)


def test_forward_shapes_and_loss():
    cfg = BILADDER_SVHN
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (B, 32, 32, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    Qs, Ps, pxz = model.apply(params, x, K, rngs={"sample": jax.random.PRNGKey(2)})

    assert len(Qs) == 3 and len(Ps) == 2
    # bottom-first ordering; every z carries the importance axis
    assert Qs[0].z.shape == (K, B, 16, 16, 24)
    assert Qs[2].z.shape == (K, B, 4, 4, 8)
    # the prior conditionals p(z_i | z_{i+1}) live at z_i's resolution
    assert Ps[0].dist.loc.shape == (K, B, 16, 16, 24)

    prior = prior_for(cfg)
    loss, metrics = compute_loss(prior, Qs, Ps, pxz, x)
    assert jnp.isfinite(loss)
    assert log_weights(prior, Qs, Ps, pxz, x).shape == (K, B)


def test_posterior_sees_data_and_context():
    """The merge posterior must depend on BOTH x and the latent above."""
    cfg = _small()
    model = build_model(cfg)
    x1 = jnp.zeros((B, 32, 32, 3))
    x2 = jnp.ones((B, 32, 32, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x1, 1
    )
    r = {"sample": jax.random.PRNGKey(2)}
    Qs1, _, _ = model.apply(params, x1, 1, rngs=r)
    Qs2, _, _ = model.apply(params, x2, 1, rngs=r)
    # different data -> different bottom posterior locs
    assert not np.allclose(np.asarray(Qs1[0].dist.loc), np.asarray(Qs2[0].dist.loc))


def test_split_merge_is_the_same_linear_map():
    """split_merge=True (conv_h(h) + conv_d(d)) computes the same posterior
    as the fused conv over concat([h, d]) when its two kernels are the
    channel-slices of the fused kernel: same locs/scales to float roundoff,
    same loss. (The h-half just loses its redundant importance-sample axis
    — the round-5 biladder throughput lever, design.md §12o.)"""
    cfg = dataclasses.replace(_small(), split_merge=False)
    fused = build_model(cfg)
    split = build_model(dataclasses.replace(cfg, split_merge=True))
    x = jax.random.uniform(jax.random.PRNGKey(9), (B, 32, 32, 3))
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "sample": jax.random.PRNGKey(1)}
    pf = fused.init(init_rngs, x, 1)
    ps = split.init(init_rngs, x, 1)

    # assemble the split params from the fused conv's channel slices
    ps = jax.tree_util.tree_map(lambda a: a, ps)  # mutable copy via dicts
    import flax

    ps = flax.core.unfreeze(ps) if hasattr(flax.core, "unfreeze") else ps
    for name in ("q_0",):
        fk = pf["params"][name]["Conv_0"]["kernel"]  # [3,3,Ch+Cd,2c]
        fb = pf["params"][name]["Conv_0"]["bias"]
        ch = ps["params"][name]["conv_h"]["kernel"].shape[2]
        ps["params"][name]["conv_h"]["kernel"] = fk[:, :, :ch, :]
        ps["params"][name]["conv_d"]["kernel"] = fk[:, :, ch:, :]
        ps["params"][name]["conv_d"]["bias"] = fb
    # every other module shares its tree between the two configs
    for name in pf["params"]:
        if name not in ("q_0",):
            ps["params"][name] = pf["params"][name]

    r = {"sample": jax.random.PRNGKey(2)}
    Qf, Pf, pxf = fused.apply(pf, x, K, rngs=r)
    Qs, Ps_, pxs = split.apply(ps, x, K, rngs=r)
    np.testing.assert_allclose(np.asarray(Qs[0].dist.loc),
                               np.asarray(Qf[0].dist.loc),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Qs[0].dist.scale),
                               np.asarray(Qf[0].dist.scale),
                               rtol=1e-5, atol=1e-5)
    prior = prior_for(cfg)
    lf, _ = compute_loss(prior, Qf, Pf, pxf, x)
    ls, _ = compute_loss(prior, Qs, Ps_, pxs, x)
    np.testing.assert_allclose(float(ls), float(lf), rtol=1e-5)


def test_generate_and_training_step():
    cfg = _small()
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (B, 32, 32, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    z_top = jax.random.normal(jax.random.PRNGKey(5), (B,) + cfg.top_latent_shape())
    gen = model.apply(params, z_top, rngs={"sample": jax.random.PRNGKey(6)},
                      method="generate")
    assert gen.sample.shape == (B,) + cfg.image_shape

    from vae_mdl_tpu.config import DataConfig, ExperimentConfig, TrainConfig
    from vae_mdl_tpu.train.state import create_train_state, make_optimizer
    from vae_mdl_tpu.train.steps import make_train_step

    exp = ExperimentConfig(
        model=cfg,
        data=DataConfig(dataset="synthetic:svhn_cropped", batch_size=4),
        train=TrainConfig(),
    )
    tx = make_optimizer(exp.train)
    state = create_train_state(model, exp.train, jnp.zeros((4, 32, 32, 3)), 2)
    step = make_train_step(model, exp, tx, donate=False)
    batch = np.random.default_rng(0).integers(0, 256, (4, 32, 32, 3),
                                              dtype=np.uint8)
    losses = []
    for _ in range(5):
        state, m = step(state, jnp.asarray(batch))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_celeba_scale_config():
    """64x64 four-scale ladder builds and computes a finite bound (the
    reference ships the celeba data path but never a model for it)."""
    from vae_mdl_tpu.models.bidirectional import BILADDER_CELEBA

    cfg = dataclasses.replace(  # slim widths: shape coverage, fast compile
        BILADDER_CELEBA,
        stem_features=8,
        stages=((8, 8, 1, 2), (8, 8, 1, 2), (8, 8, 1, 2), (8, 8, 1, 2)),
    )
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 64, 64, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    Qs, Ps, pxz = model.apply(params, x, 2, rngs={"sample": jax.random.PRNGKey(2)})
    assert len(Qs) == 4
    assert cfg.top_latent_shape() == (4, 4, 8)
    assert BILADDER_CELEBA.top_latent_shape() == (4, 4, 8)
    loss, _ = compute_loss(prior_for(cfg), Qs, Ps, pxz, x)
    assert jnp.isfinite(loss)
