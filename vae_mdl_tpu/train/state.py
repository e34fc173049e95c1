"""Full training state as one pytree.

The reference checkpoints only Keras weights (``save_weights``,
/root/reference/models/model01.py:263-264) — optimizer state, global step and
RNG are lost on crash (SURVEY.md §5 'failure detection'). Here the state is
one pytree: params, optimizer state, step, RNG key and best-val-loss, so a
checkpoint is a full resume point.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vae_mdl_tpu.config import TrainConfig
from vae_mdl_tpu.train.schedule import (
    constant_schedule,
    staircase_schedule,
    with_warmup,
)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar
    rng: jax.Array  # base key; per-step keys are folded from (rng, step)
    best_val_loss: jax.Array  # f32 scalar; +inf at init
    # exponential moving average of params (TrainConfig.ema_decay > 0);
    # None (empty pytree) when EMA is disabled
    ema_params: Any = None

    def next_rngs(self, *streams: str):
        """Per-step, per-stream keys: fold_in(step), then fold_in a stable
        hash of the stream NAME — fully deterministic, no state mutation
        (replaces the reference's stateful TF seeds). Folding the name in
        (rather than splitting positionally) guarantees distinct streams
        (train vs eval vs report) never share randomness at the same step."""
        import zlib

        step_key = jax.random.fold_in(self.rng, self.step)
        return {
            name: jax.random.fold_in(
                step_key, zlib.crc32(name.encode()) & 0x7FFFFFFF
            )
            for name in streams
        }


class KerasAdamState(struct.PyTreeNode):
    count: jax.Array
    m: Any
    v: Any


def keras_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-7) -> optax.GradientTransformation:
    """Adam in the reference's exact formulation: ``tf.keras.optimizers.Adam``
    (/root/reference/models/model01.py:125) computes

        lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
        w   -= lr_t * m / (sqrt(v) + eps),   eps = 1e-7

    i.e. ``eps`` is added to the sqrt of the UNCORRECTED second moment, and
    Keras's default eps is 1e-7. ``optax.adam`` instead adds its default
    eps=1e-8 to the sqrt of the bias-CORRECTED moment — an update that
    differs by an effective eps factor of sqrt(1 - b2^t). Negligible at
    these gradient scales, but this transformation exists so a training run
    can be optimizer-step-identical to the reference (``optimizer:
    "adam_keras"``); pinned against a live tf.keras.optimizers.Adam in
    tests/test_gradient_parity.py. The framework default stays
    ``optax.adam`` (documented deviation, PARITY.md quirks)."""
    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return KerasAdamState(jnp.zeros((), jnp.int32), zeros(), zeros())

    def update_fn(updates, state, params=None):
        del params
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1.0 - b1) * g,
                         state.m, updates)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1.0 - b2) * (g * g),
                         state.v, updates)
        t = (state.count + 1).astype(jnp.float32)
        lr = learning_rate(state.count) if callable(learning_rate) \
            else learning_rate
        lr_t = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        out = jax.tree.map(
            lambda m_, v_: -lr_t * m_ / (jnp.sqrt(v_) + eps), m, v)
        return out, KerasAdamState(state.count + 1, m, v)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = (
        staircase_schedule(cfg.learning_rate, cfg.lr_staircase_base,
                           cfg.lr_staircase_levels)
        if cfg.lr_staircase
        else constant_schedule(cfg.learning_rate)
    )
    schedule = with_warmup(schedule, cfg.lr_warmup_steps)
    opts: dict[str, Callable] = {"adam": optax.adam, "adamax": optax.adamax,
                                 "adam_keras": keras_adam}
    tx = opts[cfg.optimizer](learning_rate=schedule)
    if cfg.grad_accum_steps > 1:
        # large effective batches without the memory (not in the reference;
        # production extension)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    if cfg.grad_clip_norm > 0:
        # clip OUTSIDE the accumulation wrapper: the clip sees each raw
        # micro-batch gradient individually, and MultiSteps accumulates the
        # already-clipped gradients — one exploding micro-batch cannot ride
        # into the average unclipped
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def create_train_state(
    model,
    cfg: TrainConfig,
    example_batch: jax.Array,
    n_samples: int = 1,
) -> TrainState:
    key = jax.random.PRNGKey(cfg.seed)
    k_params, k_sample, k_state = jax.random.split(key, 3)
    params = model.init(
        {"params": k_params, "sample": k_sample}, example_batch, n_samples
    )
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=k_state,
        best_val_loss=jnp.asarray(jnp.inf, jnp.float32),
        ema_params=jax.tree.map(jnp.copy, params) if cfg.ema_decay > 0 else None,
    )


def ema_update(decay: float, ema_params, params):
    """One EMA step: ``ema <- decay * ema + (1 - decay) * params``."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema_params, params)


def eval_params(cfg: TrainConfig, state: TrainState):
    """Weights for val/test/report: the EMA copy when enabled, else params."""
    if cfg.ema_decay > 0 and state.ema_params is not None:
        return state.ema_params
    return state.params


def init_output_bias(state: TrainState, train_mean: jax.Array) -> TrainState:
    """Initialise the MLP decoder's output bias to train-mean logits.

    Parity: /root/reference/models/model01.py:294-301 — biasing the Bernoulli
    logits towards the canvas mean speeds up early training. ``train_mean``
    is the per-pixel mean of (binarized) training images in [0, 1]; the
    clamp bounds are the reference's exact [0.001, 0.999]
    (models/model01.py:298).
    """
    p = jnp.clip(jnp.reshape(train_mean, (-1,)), 0.001, 0.999)
    logits = jnp.log(p) - jnp.log1p(-p)

    from vae_mdl_tpu.utils.trees import path_tuple

    params = state.params
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    target = None
    for path, leaf in flat:
        keys = path_tuple(path)
        if "out" in keys and keys[-1] == "bias":
            target = path
            break
    if target is None:
        raise ValueError("no decoder output bias ('out'/'bias') found in params")

    def replace(path, leaf):
        return logits.astype(leaf.dtype) if path == target else leaf

    new_params = jax.tree_util.tree_map_with_path(replace, params)
    ema = state.ema_params
    if ema is not None:  # keep the EMA copy in sync with the re-initialised bias
        # fresh buffer: sharing `logits` between params and ema_params would
        # be a double-donation under the train step's donate_argnums
        def replace_copy(path, leaf):
            return jnp.copy(logits).astype(leaf.dtype) if path == target else leaf

        ema = jax.tree_util.tree_map_with_path(replace_copy, ema)
    return state.replace(params=new_params, ema_params=ema)
