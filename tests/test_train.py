"""Trainer tests: schedule parity, loss decrease, full-state resume, bias init.

The 200-step loss-decrease test is SURVEY.md §4's recommendation (d); the
reference has no automated equivalent.
"""
import dataclasses
import math
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.config import DataConfig, TrainConfig
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.schedule import staircase_schedule
from vae_mdl_tpu.train.state import create_train_state, init_output_bias, make_optimizer
from vae_mdl_tpu.train.trainer import Trainer


def test_staircase_schedule_parity():
    """lr = 1e-3 * 10^(-m/896000) with m the last milestone passed
    (/root/reference/models/model01.py:143-149)."""
    sched = staircase_schedule(1e-3, 7000, 8)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(6999)) == pytest.approx(1e-3)
    for i in range(8):
        m = 2 ** i * 7000
        expected = 1e-3 * 10 ** (-m / (2 ** 7 * 7000))
        assert float(sched(m)) == pytest.approx(expected, rel=1e-5)
        if i < 7:
            # constant until the next milestone
            assert float(sched(2 ** (i + 1) * 7000 - 1)) == pytest.approx(
                expected, rel=1e-5
            )
    # final decade: one order of magnitude below base
    assert float(sched(10_000_000)) == pytest.approx(1e-4, rel=1e-5)


def test_warmup_composes_with_staircase():
    """Linear 0->lr over warmup_steps, base schedule untouched afterwards."""
    from vae_mdl_tpu.train.schedule import with_warmup

    base = staircase_schedule(1e-3, 7000, 8)
    sched = with_warmup(base, 100)
    assert float(sched(0)) == pytest.approx(1e-3 / 100)
    assert float(sched(49)) == pytest.approx(1e-3 * 0.5)
    assert float(sched(99)) == pytest.approx(1e-3)
    for step in (100, 7000, 14000):  # past warmup: exactly the staircase
        assert float(sched(step)) == pytest.approx(float(base(step)))
    assert with_warmup(base, 0) is base


def _tiny_cfg(tmp, n_updates=40, eval_interval=20):
    cfg = experiment("model01")
    return dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=16, val_batch_size=32),
        train=TrainConfig(
            n_updates=n_updates,
            eval_interval=eval_interval,
            report_images=False,
            checkpoint_dir=tmp + "/ckpt",
            log_dir=tmp + "/tb",
        ),
    )


def test_training_reduces_loss_and_resumes():
    tmp = tempfile.mkdtemp()
    cfg = _tiny_cfg(tmp)
    tr = Trainer(cfg)

    from vae_mdl_tpu.train.steps import make_eval_step

    eval_step = make_eval_step(tr.model, cfg)
    batch = jnp.asarray(next(tr.val_iter))
    loss_before = float(eval_step(tr.state, batch)["loss"])

    state = tr.fit(progress=False)
    loss_after = float(eval_step(state, batch)["loss"])
    assert loss_after < loss_before
    assert int(state.step) == cfg.train.n_updates

    # full-state auto-resume: step, params and optimizer state round-trip
    tr2 = Trainer(cfg)
    assert int(tr2.state.step) == cfg.train.n_updates
    restored_loss = float(eval_step(tr2.state, batch)["loss"])
    assert restored_loss == pytest.approx(loss_after, rel=1e-5)


def test_resume_is_data_deterministic():
    """Preempt + resume consumes the IDENTICAL batch sequence as an
    uninterrupted run: final params bit-equal. The step-derived rngs make
    everything else deterministic already; this pins the remaining piece —
    the trainer seeks its epoch stream to the checkpointed step instead of
    replaying data from the start (the reference can't do this at all: its
    tf.data iterator state is unrecoverable, SURVEY.md §5)."""
    tmp_a, tmp_b = tempfile.mkdtemp(), tempfile.mkdtemp()
    s_a = Trainer(_tiny_cfg(tmp_a, n_updates=40)).fit(progress=False)
    Trainer(_tiny_cfg(tmp_b, n_updates=20)).fit(progress=False)
    s_b = Trainer(_tiny_cfg(tmp_b, n_updates=40)).fit(progress=False)
    assert int(s_b.step) == 40
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(s_a.opt_state), jax.tree.leaves(s_b.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_snapshot_checkpoints_rotate_and_restore():
    """snapshot_interval writes immutable step_<N> checkpoints at the eval
    cadence, rotated to the newest max_snapshots; a snapshot restores as a
    full TrainState at exactly its step; latest/best are never pruned; an
    off-cadence interval is rejected up front."""
    tmp = tempfile.mkdtemp()
    cfg = _tiny_cfg(tmp, n_updates=50, eval_interval=10)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, snapshot_interval=10, max_snapshots=2))
    tr = Trainer(cfg)
    tr.fit(progress=False)
    # snapshots at loop values 10..40 -> steps 11..41, newest 2 kept
    assert tr.ckpt.snapshots() == ["step_31", "step_41"]
    assert tr.ckpt.has("latest") and tr.ckpt.has("best")

    fresh = Trainer(dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume=False)))
    restored = fresh.ckpt.restore(fresh.state, "step_31")
    assert int(restored.step) == 31

    bad = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, snapshot_interval=15))
    with pytest.raises(ValueError, match="snapshot_interval"):
        Trainer(bad)

    # a fit-time eval_interval override must re-satisfy the cadence too
    with pytest.raises(ValueError, match="snapshot_interval"):
        tr.fit(eval_interval=25, progress=False)

    # max_snapshots < 1 would otherwise delete the snapshot just written
    with pytest.raises(ValueError, match="max_snapshots"):
        Trainer(dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, max_snapshots=0)))
    # and prune with keep<=0 is keep-everything, not delete-everything
    before = tr.ckpt.snapshots()
    tr.ckpt.prune_snapshots(0)
    assert tr.ckpt.snapshots() == before


def test_restore_weights_across_optimizer_flags():
    """A checkpoint trained WITH grad_clip_norm (the optax.chain changes
    the opt_state pytree structure) still evaluates in a process without
    the flag: restore_weights restores params/step (and EMA when present),
    deliberately ignoring the optimizer state eval never uses."""
    tmp = tempfile.mkdtemp()
    cfg = _tiny_cfg(tmp, n_updates=4, eval_interval=2)
    cfg_clip = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, grad_clip_norm=100.0, ema_decay=0.9))
    trained = Trainer(cfg_clip).fit(progress=False)

    cfg_plain = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, resume=False))
    tr = Trainer(cfg_plain)
    with pytest.raises(Exception):  # full restore refuses: structure mismatch
        tr.ckpt.restore(tr.state, "latest")
    st = tr.ckpt.restore_weights(tr.state, "latest")
    assert int(st.step) == 4
    for a, b in zip(jax.tree.leaves(trained.params), jax.tree.leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert st.ema_params is None  # target without EMA stays without

    # target WITH ema picks up the checkpoint's EMA copy
    cfg_ema = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, resume=False, ema_decay=0.9))
    tr2 = Trainer(cfg_ema)
    st2 = tr2.ckpt.restore_weights(tr2.state, "latest")
    for a, b in zip(jax.tree.leaves(trained.ema_params),
                    jax.tree.leaves(st2.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_carries_updated_best_val_loss(tmp_path):
    """The 'latest' save must include the eval's best_val_loss update: a
    'latest' carrying the stale (higher) threshold would, after a
    hard-kill resume, let a worse model overwrite the 'best' checkpoint."""
    cfg = _tiny_cfg(str(tmp_path))
    tr = Trainer(cfg)
    tr.fit(progress=False)
    latest = tr.ckpt.restore(tr.state, "latest")
    best = tr.ckpt.restore(tr.state, "best")
    assert np.isfinite(float(latest.best_val_loss))
    # the final eval of this short monotonic run improved, so both tags
    # were written at the same eval with the same (updated) threshold
    assert float(latest.best_val_loss) == float(best.best_val_loss)


def test_resume_falls_back_to_best(tmp_path):
    """A checkpoint dir holding only 'best' — the layout ``cli convert``
    leaves behind — warm-starts the next run instead of reinitialising
    (and then clobbering the converted 'best' at the first eval)."""
    cfg = _tiny_cfg(str(tmp_path))
    tr = Trainer(cfg)
    marked = tr.state.replace(step=tr.state.step + 7)
    tr.ckpt.save(marked, "best")
    tr.ckpt.wait()
    assert not tr.ckpt.has("latest")

    restored = tr.ckpt.restore_latest(tr.state)
    assert restored is not None and int(restored.step) == 7
    # and the Trainer wiring picks it up end-to-end
    tr2 = Trainer(cfg)
    assert int(tr2.state.step) == 7


def test_init_output_bias():
    """Decoder bias init from train-mean logits
    (/root/reference/models/model01.py:294-301)."""
    cfg = experiment("model01")
    from vae_mdl_tpu.models.vae import build_model

    model = build_model(cfg.model)
    x = jnp.zeros((2, 28, 28, 1))
    state = create_train_state(model, cfg.train, x, 1)

    mean_img = jnp.full((28, 28, 1), 0.7)
    state2 = init_output_bias(state, mean_img)

    # decode the zero latent: output logits should be sigmoid^-1(0.7)-ish
    # exactly at the bias when weights map z=0 -> 0 contribution from h...
    # instead check the bias leaf directly
    bias = state2.params["params"]["decoder"]["out"]["bias"]
    expected = math.log(0.7 / 0.3)
    assert np.allclose(np.asarray(bias), expected, atol=1e-5)


def test_determinism_same_seed_same_loss():
    """Same seed -> identical metrics (the TF-RNG bug class the reference
    debugged for 529 lines, tests/dataloader_issue.py, is structural here)."""
    tmp1, tmp2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    losses = []
    for tmp in (tmp1, tmp2):
        cfg = _tiny_cfg(tmp, n_updates=5, eval_interval=100)
        tr = Trainer(cfg)
        state = tr.fit(progress=False)
        from vae_mdl_tpu.train.steps import make_eval_step

        batch = jnp.asarray(next(tr.val_iter))
        losses.append(float(make_eval_step(tr.model, cfg)(state, batch)["loss"]))
    assert losses[0] == losses[1]


def test_gradient_accumulation():
    """grad_accum_steps=2: params update only every 2nd step, matching the
    average-gradient update."""
    import jax
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.train.steps import make_train_step

    cfg = experiment("model01")
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=8),
        train=TrainConfig(grad_accum_steps=2, lr_staircase=False),
    )
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x = jnp.zeros((8, 28, 28, 1))
    state = create_train_state(model, cfg.train, x, cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)

    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (8, 28, 28, 1), dtype=np.uint8)
    )
    p0 = jax.tree.leaves(state.params)[0].copy()
    state1, _ = step(state, batch)
    p1 = jax.tree.leaves(state1.params)[0]
    assert np.array_equal(np.asarray(p0), np.asarray(p1))  # accumulating
    state2, _ = step(state1, batch)
    p2 = jax.tree.leaves(state2.params)[0]
    assert not np.array_equal(np.asarray(p1), np.asarray(p2))  # applied


def _state_and_step(cfg):
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.train.steps import make_train_step

    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x0 = jnp.zeros((8, 28, 28, 1), jnp.float32)
    state = create_train_state(model, cfg.train, x0, cfg.model.n_samples)
    return state, make_train_step(model, cfg, tx, donate=False)


def test_grad_skip_threshold_skips_whole_update():
    """With an always-exceeded threshold the step advances but params,
    optimizer moments and EMA stay bit-identical, and the skip is counted;
    with a never-exceeded threshold the update applies normally."""
    base = experiment("model01")
    base = dataclasses.replace(
        base, data=DataConfig(dataset="synthetic:mnist", batch_size=8))
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (8, 28, 28, 1), dtype=np.uint8))

    cfg = dataclasses.replace(base, train=dataclasses.replace(
        base.train, grad_skip_threshold=1e-9, ema_decay=0.99))
    state, step = _state_and_step(cfg)
    new, m = step(state, batch)
    assert float(m["skipped"]) == 1.0
    assert float(m["grad_norm"]) > 1e-9
    assert int(new.step) == 1  # schedule/data keep moving
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(new.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(new.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg = dataclasses.replace(base, train=dataclasses.replace(
        base.train, grad_skip_threshold=1e9))
    state, step = _state_and_step(cfg)
    new, m = step(state, batch)
    assert float(m["skipped"]) == 0.0
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new.params))
    )


def test_clip_applies_per_microbatch_with_accumulation():
    """With grad_accum_steps>1 the clip wraps OUTSIDE MultiSteps, so each
    raw micro-batch gradient is clipped before accumulation — the
    accumulator never sees an exploding micro-batch. Pinned on the
    accumulator state itself (the applied update direction is too
    Adam-normalised to distinguish the orders)."""
    import optax

    cfg = dataclasses.replace(TrainConfig(), grad_accum_steps=2,
                              grad_clip_norm=1.0, lr_staircase=False)
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros(4)}
    st = tx.init(params)
    g_big = {"w": jnp.full((4,), 100.0)}  # norm 200, way over the clip
    _, st = tx.update(g_big, st, params)
    ms_state = st[1]  # (clip EmptyState, MultiStepsState)
    acc_norm = float(optax.global_norm(ms_state.acc_grads))
    assert acc_norm <= 1.0 + 1e-5


def test_scanned_skip_counts_whole_window():
    """metrics['skipped'] from a steps_per_call scan is the SUM over the
    window (last-only would read 0 while earlier steps skipped) and
    grad_norm is the window max."""
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.train.steps import make_multi_train_step

    cfg = experiment("model01")
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=8),
        train=dataclasses.replace(cfg.train, grad_skip_threshold=1e-9),
    )
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x0 = jnp.zeros((8, 28, 28, 1), jnp.float32)
    state = create_train_state(model, cfg.train, x0, cfg.model.n_samples)
    step = make_multi_train_step(model, cfg, tx, n_steps=4, donate=False)
    batches = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (4, 8, 28, 28, 1), dtype=np.uint8))
    new, m = step(state, batches)
    assert float(m["skipped"]) == 4.0  # every step in the window skipped
    assert int(new.step) == 4


def test_update_ok_rule():
    from vae_mdl_tpu.train.steps import update_ok

    nan = jnp.asarray(jnp.nan)
    one = jnp.asarray(1.0)
    assert bool(update_ok(one, one, 10.0))
    assert not bool(update_ok(nan, one, 10.0))  # non-finite loss
    assert not bool(update_ok(one, nan, 10.0))  # non-finite grads
    assert not bool(update_ok(one, jnp.asarray(11.0), 10.0))  # blown up


def test_beta_warmup_effective_beta():
    """The annealed beta ramps linearly over beta_warmup_steps and is the
    plain config float when the knob is off (bit-identical program)."""
    from vae_mdl_tpu.train.steps import effective_beta

    base = experiment("model01")
    off = effective_beta(base, jnp.asarray(0, jnp.int32))
    assert isinstance(off, float) and off == base.model.beta

    cfg = dataclasses.replace(
        base, train=dataclasses.replace(base.train, beta_warmup_steps=10))
    for step, expect in [(0, 0.1), (4, 0.5), (9, 1.0), (1000, 1.0)]:
        got = float(effective_beta(cfg, jnp.asarray(step, jnp.int32)))
        assert got == pytest.approx(expect * base.model.beta)

    # under gradient accumulation the ramp counts APPLIED updates
    # (matching lr_warmup_steps) and beta is constant within each
    # accumulated group of micro-batches
    acc = dataclasses.replace(
        base, train=dataclasses.replace(base.train, beta_warmup_steps=10,
                                        grad_accum_steps=4))
    for step, expect in [(0, 0.1), (3, 0.1), (4, 0.2), (39, 1.0),
                         (1000, 1.0)]:
        got = float(effective_beta(acc, jnp.asarray(step, jnp.int32)))
        assert got == pytest.approx(expect * base.model.beta)


def test_beta_warmup_anneals_the_train_bound():
    """At step 0 a long warmup down-weights the KL term (higher bound,
    lower loss than the un-annealed step); warmup=1 is already complete at
    step 0 and reproduces the baseline loss exactly. The KL metric itself
    is beta-independent (it reads the raw log-probs)."""
    base = experiment("model01")
    base = dataclasses.replace(
        base, data=DataConfig(dataset="synthetic:mnist", batch_size=16))

    def loss_at_step0(warmup):
        cfg = dataclasses.replace(
            base,
            train=dataclasses.replace(base.train, beta_warmup_steps=warmup))
        state, step = _state_and_step(cfg)
        batch = jnp.zeros((16, 28, 28, 1), jnp.uint8) + 128
        _, m = step(state, batch)
        return float(m["loss"]), float(m["kl"])

    loss0, kl0 = loss_at_step0(0)
    loss_w, kl_w = loss_at_step0(1000)
    loss_1, kl_1 = loss_at_step0(1)
    assert kl_w == pytest.approx(kl0)  # metric reads raw log-probs
    assert loss_w < loss0  # KL down-weighted at step 0
    assert loss_1 == pytest.approx(loss0, rel=1e-6)  # ramp done at step 0


def test_grad_clip_norm_bounds_the_update():
    """grad_clip_norm is wired into the optimizer chain: a tight clip
    changes the first update, a loose clip is a no-op vs unclipped."""
    base = experiment("model01")
    base = dataclasses.replace(
        base, data=DataConfig(dataset="synthetic:mnist", batch_size=8))
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (8, 28, 28, 1), dtype=np.uint8))

    outs = {}
    for clip in (0.0, 1e-3, 1e9):
        cfg = dataclasses.replace(base, train=dataclasses.replace(
            base.train, grad_clip_norm=clip))
        state, step = _state_and_step(cfg)
        new, m = step(state, batch)
        outs[clip] = np.concatenate(
            [np.ravel(np.asarray(p)) for p in jax.tree.leaves(new.params)])
        if clip:
            gnorm = float(m["grad_norm"])  # reported (pre-clip) when on
        else:
            assert "grad_norm" not in m  # hot path untouched when off
    assert gnorm > 1e-3  # the tight clip actually binds at init
    assert not np.array_equal(outs[0.0], outs[1e-3])
    np.testing.assert_array_equal(outs[0.0], outs[1e9])


def test_adam_keras_optimizer_trains():
    """``optimizer: "adam_keras"`` (the reference's exact Adam formulation,
    train/state.keras_adam) works through make_optimizer + the jitted train
    step and reduces the loss; its update stays CLOSE to optax.adam (the
    formulations differ only in eps value/placement — the Keras-oracle pin
    lives in tests/test_gradient_parity.py)."""
    import jax
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.train.steps import make_train_step

    cfg = experiment("model01")
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=8),
        train=TrainConfig(optimizer="adam_keras", lr_staircase=False),
    )
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x = jnp.zeros((8, 28, 28, 1))
    state = create_train_state(model, cfg.train, x, cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (8, 28, 28, 1), dtype=np.uint8)
    )
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

    # the two Adam formulations agree to ~eps-effects on one step
    cfg_o = dataclasses.replace(cfg, train=TrainConfig(lr_staircase=False))
    state_o = create_train_state(model, cfg_o.train, x, cfg.model.n_samples)
    step_o = make_train_step(model, cfg_o, tx=make_optimizer(cfg_o.train),
                             donate=False)
    s1, _ = step(create_train_state(model, cfg.train, x, cfg.model.n_samples),
                 batch)
    s2, _ = step_o(state_o, batch)
    d1 = np.asarray(jax.tree.leaves(s1.params)[0])
    d2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(d1, d2, atol=5e-5)


def test_multi_step_scan_equals_single_steps():
    """lax.scan of n steps == n individual steps, bit-for-bit: per-step RNG
    derives from (rng, step) so the scan carries identical randomness."""
    import jax
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.train.steps import make_multi_train_step, make_train_step

    cfg = experiment("model01")
    cfg = dataclasses.replace(
        cfg, data=DataConfig(dataset="synthetic:mnist", batch_size=8)
    )
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x = jnp.zeros((8, 28, 28, 1))
    state_a = create_train_state(model, cfg.train, x, cfg.model.n_samples)
    state_b = state_a

    rng = np.random.default_rng(0)
    batches = rng.integers(0, 256, (4, 8, 28, 28, 1), dtype=np.uint8)

    single = make_train_step(model, cfg, tx, donate=False)
    for b in batches:
        state_a, m_a = single(state_a, jnp.asarray(b))

    multi = make_multi_train_step(model, cfg, tx, n_steps=4, donate=False)
    state_b, m_b = multi(state_b, jnp.asarray(batches))

    assert int(state_a.step) == int(state_b.step) == 4
    assert float(m_a["loss"]) == float(m_b["loss"])
    for la, lb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_trainer_steps_per_call():
    tmp = tempfile.mkdtemp()
    cfg = _tiny_cfg(tmp, n_updates=20, eval_interval=10)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps_per_call=5)
    )
    tr = Trainer(cfg)
    state = tr.fit(progress=False)
    assert int(state.step) == 20


def test_device_dataset_training():
    """Device-resident dataset: trains, improves, and resumes like the
    host-pipeline path."""
    tmp = tempfile.mkdtemp()
    cfg = _tiny_cfg(tmp, n_updates=30, eval_interval=15)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, steps_per_call=5,
                                  device_dataset=True),
    )
    tr = Trainer(cfg)
    from vae_mdl_tpu.train.steps import make_eval_step

    eval_step = make_eval_step(tr.model, cfg)
    batch = jnp.asarray(next(tr.val_iter))
    before = float(eval_step(tr.state, batch)["loss"])
    state = tr.fit(progress=False)
    after = float(eval_step(state, batch)["loss"])
    assert int(state.step) == 30
    assert after < before

    tr2 = Trainer(cfg)
    assert int(tr2.state.step) == 30


def test_augment_flip_train_only():
    """augment_flip changes the TRAIN step's inputs (flip applied on device)
    but never the eval step's (celeba parity, utils/data.py:88)."""
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.train.steps import make_eval_step, make_train_step

    cfg = experiment("model02")
    cfg = dataclasses.replace(
        cfg, data=DataConfig(dataset="synthetic:svhn_cropped", batch_size=8)
    )
    cfg_flip = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, augment_flip=True)
    )
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    state = create_train_state(model, cfg.train, x, cfg.model.n_samples)

    # left half bright, right half dark: flipping changes the batch
    batch = np.zeros((8, 32, 32, 3), np.uint8)
    batch[:, :, :16, :] = 200
    batch = jnp.asarray(batch)

    _, m_plain = make_train_step(model, cfg, tx, donate=False)(state, batch)
    _, m_flip = make_train_step(model, cfg_flip, tx, donate=False)(state, batch)
    assert float(m_plain["loss"]) != float(m_flip["loss"])

    e_plain = make_eval_step(model, cfg)(state, batch)
    e_flip = make_eval_step(model, cfg_flip)(state, batch)
    assert float(e_plain["loss"]) == float(e_flip["loss"])


def test_zoo_wires_celeba_flip_and_eval_samples():
    assert experiment("biladder_celeba").data.augment_flip
    assert not experiment("model05").data.augment_flip
    assert experiment("model01").train.n_eval_samples == 5000


def test_analytic_flops_accounting():
    """utils/flops: closed-form conv/dense counts match hand-derived values
    for the model05 decoder stack (bench.py's MFU denominator)."""
    from vae_mdl_tpu.models.zoo import MODELS
    from vae_mdl_tpu.utils.flops import analytic_model_flops, train_step_flops

    # model05 decoder fwd per sample: dense 20->2048 (~84k) + deconv128
    # (33.6M) + deconv64 (67.1M) + deconv32 (67.1M) + head conv50 (29.5M)
    # ~= 197M; encoder ~= 165M; fwd/img = enc + 5*dec
    f = analytic_model_flops(MODELS["model05"], 1)
    assert 0.8e9 < f < 1.3e9
    assert train_step_flops(MODELS["model05"], 1) == pytest.approx(3 * f)
    # every family yields a positive, finite count
    for name, m in MODELS.items():
        if hasattr(m, "latents"):
            assert analytic_flops_ok(m)


def analytic_flops_ok(m):
    from vae_mdl_tpu.utils.flops import analytic_model_flops

    f = analytic_model_flops(m, 2)
    return math.isfinite(f) and f > 0


def test_biladder_flops_accounting():
    """utils/flops.biladder_flops: linear in batch, grows with k, and
    forward_flops dispatches BiLadderConfig to it (bench.py's ladder MFU)."""
    from vae_mdl_tpu.models.bidirectional import BILADDER_CELEBA, BILADDER_SVHN
    from vae_mdl_tpu.utils.flops import biladder_flops, forward_flops

    f1 = biladder_flops(BILADDER_CELEBA, 1)
    assert math.isfinite(f1) and f1 > 0
    assert biladder_flops(BILADDER_CELEBA, 3) == pytest.approx(3 * f1)
    # top-down cost scales with importance samples; bottom-up does not
    f_k10 = biladder_flops(BILADDER_CELEBA, 1, n_samples=10)
    assert f1 < f_k10 < 2 * f1
    # 64x64/4-scale costs more than 32x32/3-scale
    assert f1 > biladder_flops(BILADDER_SVHN, 1)
    assert forward_flops(BILADDER_CELEBA, 1) == pytest.approx(f1)
    # dense-family dispatch unchanged
    from vae_mdl_tpu.models.zoo import MODELS
    from vae_mdl_tpu.utils.flops import analytic_model_flops

    assert forward_flops(MODELS["model05"], 1) == pytest.approx(
        analytic_model_flops(MODELS["model05"], 1))


def test_ladder_flops_accounting():
    """utils/flops.ladder_flops: forward_flops must dispatch LadderConfig
    (a registered zoo family — it used to crash with AttributeError), the
    count must land within the usual conservative band of XLA's static
    count for the FULL bound, and the per-image/per-sample split must
    respect where the k axis appears (at z_1)."""
    import jax

    from vae_mdl_tpu.models.ladder import LADDER_SVHN
    from vae_mdl_tpu.models.objective import log_weights
    from vae_mdl_tpu.models.vae import build_model, prior_for
    from vae_mdl_tpu.utils.flops import (
        compiled_flops,
        forward_flops,
        ladder_flops,
        train_step_flops,
    )

    f1 = ladder_flops(LADDER_SVHN, 1)
    assert math.isfinite(f1) and f1 > 0
    assert ladder_flops(LADDER_SVHN, 3) == pytest.approx(3 * f1)
    f_k10 = ladder_flops(LADDER_SVHN, 1, n_samples=10)
    assert f1 < f_k10 < 2 * f1  # stem + stage-0 encoder are per image
    assert forward_flops(LADDER_SVHN, 1) == pytest.approx(f1)
    assert train_step_flops(LADDER_SVHN, 4) == pytest.approx(
        3 * forward_flops(LADDER_SVHN, 4))

    # against XLA's static count of the full bound (matmul/conv terms only
    # -> analytic sits a little under; DCE-free because log_weights
    # consumes every Q and P)
    model = build_model(LADDER_SVHN)
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)}, x, 1)
    prior = prior_for(LADDER_SVHN)
    fn = jax.jit(lambda p, a: log_weights(
        prior, *model.apply(p, a, 5, rngs={"sample": jax.random.PRNGKey(2)}),
        x=a).sum())
    comp = compiled_flops(fn, params, x)
    if comp:  # backend cost model available
        assert 0.7 < forward_flops(LADDER_SVHN, 4) / comp < 1.05


def test_sigterm_checkpoints_and_exits_cleanly():
    """Graceful preemption: SIGTERM mid-fit finishes the in-flight step,
    checkpoints the exact state and returns — auto-resume then continues
    from the interrupted step with zero training-step loss."""
    import os
    import signal
    import subprocess
    import sys
    import time as _time

    tmp = tempfile.mkdtemp()
    code = f"""
import dataclasses, sys
import jax.numpy as jnp
from vae_mdl_tpu.config import DataConfig, TrainConfig
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.trainer import Trainer

cfg = experiment("model01")
cfg = dataclasses.replace(
    cfg,
    data=DataConfig(dataset="synthetic:mnist", batch_size=8, val_batch_size=8),
    train=TrainConfig(n_updates=1_000_000, eval_interval=500_000,
                      report_images=False, checkpoint_dir={tmp + "/ckpt"!r},
                      log_dir={tmp + "/tb"!r}),
)
tr = Trainer(cfg)
print("READY", flush=True)
state = tr.fit(progress=False)
print("STOPPED_AT", int(state.step), flush=True)
"""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen([sys.executable, "-u", "-c", code],
                            stdout=subprocess.PIPE, text=True, env=env)
    try:
        assert proc.stdout.readline().strip() == "READY"
        _time.sleep(8)  # let some steps run
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    stopped = [l for l in out.splitlines() if l.startswith("STOPPED_AT")]
    assert stopped, out
    step = int(stopped[0].split()[1])
    assert 0 < step < 1_000_000

    # the checkpoint is at the EXACT interrupted step and resume continues
    cfg = _tiny_cfg(tmp, n_updates=1_000_000, eval_interval=500_000)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=8,
                                      val_batch_size=8))
    tr2 = Trainer(cfg)  # auto-resume
    assert int(tr2.state.step) == step
