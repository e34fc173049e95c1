"""Retrace guard: the hot-loop jits must compile exactly once.

A silent recompile per step (input dtype/shape/weak-type drift) is a classic
TPU production failure — nothing crashes, throughput just collapses into
XLA compiles. The reference has no notion of this (its @tf.function retraces
are equally silent, /root/reference/models/model01.py:167-176); the trainer
checks its jit caches at every eval interval and warns loudly.
"""
import dataclasses
import tempfile

import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.config import DataConfig, TrainConfig
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.trainer import Trainer


def _tiny_cfg(tmp, **train_kw):
    cfg = experiment("model01")
    return dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=16,
                        val_batch_size=32),
        train=TrainConfig(
            n_updates=train_kw.pop("n_updates", 8),
            eval_interval=train_kw.pop("eval_interval", 4),
            report_images=False,
            checkpoint_dir=tmp + "/ckpt",
            log_dir=tmp + "/tb",
            **train_kw,
        ),
    )


def test_fit_compiles_each_step_exactly_once(capsys):
    """Across a multi-eval-interval run, train and eval steps each trace
    once — the data pipeline's shapes/dtypes are stable by construction."""
    tmp = tempfile.mkdtemp()
    tr = Trainer(_tiny_cfg(tmp))
    tr.fit(progress=False)
    assert tr.train_step._cache_size() == 1
    assert tr.eval_step._cache_size() == 1
    assert "WARNING" not in capsys.readouterr().out
    # train-side metrics reach the logger (the reference created a train
    # writer and never wrote to it — PARITY.md quirks)
    import json
    import os

    jsonl = os.path.join(tr.logger.dir, "metrics.jsonl")
    prefixes = {r.get("prefix") for r in map(json.loads, open(jsonl))}
    assert {"Train", "Evaluation", "Perf"} <= prefixes


def test_scanned_multistep_compiles_once(capsys):
    """The steps_per_call scan path (the production throughput path) also
    traces exactly once."""
    tmp = tempfile.mkdtemp()
    tr = Trainer(_tiny_cfg(tmp, steps_per_call=2))
    tr.fit(progress=False)
    assert tr.train_step._cache_size() == 1
    assert "WARNING" not in capsys.readouterr().out


def test_guard_checks_each_fn_independently(capsys):
    """A step fn without the private ``_cache_size`` hook (a future jax
    rename, or a non-jit wrapper) must not silently disable the guard for
    the OTHER step fns — eval_step drift is still caught when train_step
    is uninspectable."""
    tmp = tempfile.mkdtemp()
    tr = Trainer(_tiny_cfg(tmp))
    batch = np.zeros((32, 28, 28, 1), np.uint8)
    tr.eval_step(tr.state, jnp.asarray(batch))
    tr.eval_step(tr.state, jnp.asarray(batch, jnp.float32) / 255.0)
    assert tr.eval_step._cache_size() == 2
    real = tr.train_step
    tr.train_step = lambda s, b: real(s, b)  # no _cache_size attr
    tr._check_retrace()
    assert "eval_step has 2 compiled variants" in capsys.readouterr().out


def test_retrace_warns_once(capsys):
    """A drifting input signature triggers one loud warning, not one per
    eval interval."""
    tmp = tempfile.mkdtemp()
    tr = Trainer(_tiny_cfg(tmp))
    batch = np.zeros((16, 28, 28, 1), np.uint8)
    tr.state, _ = tr.train_step(tr.state, jnp.asarray(batch))
    # dtype drift: float32 batch retraces the same fn
    tr.state, _ = tr.train_step(tr.state, jnp.asarray(batch, jnp.float32) / 255.0)
    assert tr.train_step._cache_size() == 2
    tr._check_retrace()
    out1 = capsys.readouterr().out
    assert "train_step has 2 compiled variants" in out1
    tr._check_retrace()
    assert "WARNING" not in capsys.readouterr().out
