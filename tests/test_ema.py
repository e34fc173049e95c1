"""EMA parameter averaging (TrainConfig.ema_decay).

Not in the reference — standard hierarchical-VAE practice (VDVAE et al.):
keep an exponential moving average of the params during training and use it
for validation/test/reporting. Tests: the EMA recursion matches a manual
replay, decay=1 freezes the EMA at init (and eval then uses it), and the
checkpoint roundtrip carries the EMA copy.
"""
import dataclasses
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.config import DataConfig, TrainConfig
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.state import (create_train_state, eval_params,
                                     make_optimizer)
from vae_mdl_tpu.train.steps import make_eval_step, make_train_step


def _cfg(ema_decay, tmp="/tmp"):
    cfg = experiment("model01")
    return dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=8,
                        val_batch_size=8),
        train=TrainConfig(ema_decay=ema_decay, report_images=False,
                          checkpoint_dir=tmp + "/ckpt", log_dir=tmp + "/tb"),
    )


def _setup(cfg):
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x = jnp.zeros((8, 28, 28, 1), jnp.float32)
    state = create_train_state(model, cfg.train, x, cfg.model.n_samples)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 256, (8, 28, 28, 1), dtype=np.uint8))
    return model, tx, state, batch


def test_ema_matches_manual_replay():
    decay = 0.9
    cfg = _cfg(decay)
    model, tx, state, batch = _setup(cfg)
    step = make_train_step(model, cfg, tx, donate=False)

    # params trajectory is independent of the EMA; replay the recursion
    ema = jax.tree.map(np.asarray, state.params)
    for _ in range(5):
        state, _ = step(state, batch)
        ema = jax.tree.map(
            lambda e, p: decay * e + (1 - decay) * np.asarray(p),
            ema, state.params,
        )

    actual = jax.tree.map(np.asarray, state.ema_params)
    chex_ok = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        actual, ema,
    )
    del chex_ok
    # and the EMA genuinely lags the raw params
    diffs = jax.tree.leaves(jax.tree.map(
        lambda e, p: float(np.max(np.abs(e - np.asarray(p)))),
        actual, state.params,
    ))
    assert max(diffs) > 0


def test_ema_disabled_keeps_state_empty():
    cfg = _cfg(0.0)
    model, tx, state, batch = _setup(cfg)
    assert state.ema_params is None
    step = make_train_step(model, cfg, tx, donate=False)
    state, _ = step(state, batch)
    assert state.ema_params is None
    # eval falls back to the raw params
    assert eval_params(cfg.train, state) is state.params


def test_eval_uses_frozen_ema_at_decay_one():
    """decay=1.0 pins the EMA at the init params, so the eval metrics must
    equal those of an untrained state — proving the eval path reads EMA."""
    cfg = _cfg(1.0)
    model, tx, state, batch = _setup(cfg)
    init_params = jax.tree.map(np.asarray, state.params)
    step = make_train_step(model, cfg, tx, donate=False)
    for _ in range(3):
        state, _ = step(state, batch)

    # EMA is exactly the init params
    jax.tree.map(
        lambda e, p: np.testing.assert_array_equal(np.asarray(e), p),
        state.ema_params, init_params,
    )

    ev = make_eval_step(model, cfg)
    m_ema = ev(state, batch)

    cfg_off = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.0))
    ev_off = make_eval_step(model, cfg_off)
    # same state stripped of EMA: eval on the TRAINED params
    m_raw = ev_off(state.replace(ema_params=None), batch)
    # and on the init params (what the EMA eval should reproduce exactly:
    # same state -> same eval RNG streams)
    m_init = ev_off(state.replace(params=state.ema_params, ema_params=None),
                    batch)

    assert float(m_ema["loss"]) == pytest.approx(float(m_init["loss"]),
                                                 rel=1e-6)
    assert float(m_ema["loss"]) != pytest.approx(float(m_raw["loss"]),
                                                 rel=1e-4)


def test_ema_checkpoint_roundtrip():
    from vae_mdl_tpu.train.checkpoint import Checkpointer

    cfg = _cfg(0.99)
    model, tx, state, batch = _setup(cfg)
    step = make_train_step(model, cfg, tx, donate=False)
    for _ in range(3):
        state, _ = step(state, batch)

    with tempfile.TemporaryDirectory() as tmp:
        ckpt = Checkpointer(tmp, "ema_test", async_save=False)
        ckpt.save(state, "latest")
        ckpt.wait()
        fresh = create_train_state(model, cfg.train,
                                   jnp.zeros((8, 28, 28, 1), jnp.float32),
                                   cfg.model.n_samples)
        restored = ckpt.restore(fresh, "latest")

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.ema_params, state.ema_params,
    )


def test_ema_checkpoint_structure_mismatch_reconciles():
    """A checkpoint written with EMA restores into an EMA-less state (flag
    dropped on eval/resume) and vice versa (EMA turned on mid-run seeds from
    the restored params) — code-review finding: strict Orbax restore would
    hard-fail on the pytree structure change either way."""
    from vae_mdl_tpu.train.checkpoint import Checkpointer

    cfg_ema = _cfg(0.9)
    model, tx, state, batch = _setup(cfg_ema)
    step = make_train_step(model, cfg_ema, tx, donate=False)
    for _ in range(2):
        state, _ = step(state, batch)

    cfg_off = _cfg(0.0)
    _, _, plain, _ = _setup(cfg_off)
    assert plain.ema_params is None

    with tempfile.TemporaryDirectory() as tmp:
        ck = Checkpointer(tmp, "mismatch", async_save=False)
        # EMA ckpt -> plain target: params restored, EMA dropped
        ck.save(state, "with_ema")
        ck.wait()
        restored = ck.restore(plain, "with_ema")
        assert restored.ema_params is None
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            restored.params, state.params,
        )

        # plain ckpt -> EMA target: EMA seeded from the restored params
        ck.save(plain, "plain")
        ck.wait()
        fresh_ema = _setup(cfg_ema)[2]
        restored2 = ck.restore(fresh_ema, "plain")
        assert restored2.ema_params is not None
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            restored2.ema_params, restored2.params,
        )


def test_ema_multi_step_scan_matches_single_steps():
    """The scanned multi-step path carries the EMA identically."""
    from vae_mdl_tpu.train.steps import make_multi_train_step

    decay = 0.95
    cfg = _cfg(decay)
    model, tx, state, batch = _setup(cfg)

    single = make_train_step(model, cfg, tx, donate=False)
    s1 = state
    for _ in range(4):
        s1, _ = single(s1, batch)

    multi = make_multi_train_step(model, cfg, tx, n_steps=4, donate=False)
    batches = jnp.stack([batch] * 4)
    s2, _ = multi(state, batches)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        s1.ema_params, s2.ema_params,
    )
