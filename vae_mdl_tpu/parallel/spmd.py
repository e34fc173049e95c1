"""Explicit-collective data-parallel train step via ``shard_map``.

Two equivalent data-parallel paths exist in this framework:

1. ``train.steps.make_train_step`` under ``jit`` with NamedShardings —
   GSPMD chooses and inserts the collectives (the default; simplest).
2. This module: ``shard_map`` over the ``data`` axis with an explicit
   ``jax.lax.pmean`` of the gradients — the collective is visible in the
   program, pinned to ICI, and independent of the partitioner's choices.
   This is the classic pmap-style recipe, SPMD-native.

The two paths differ only in RNG layout (here each device folds its axis
index into the sampling keys, so importance-sample noise is drawn per shard);
updates are identical in expectation and params remain exactly replicated.
Use this one for deterministic collective placement or to extend with custom
overlap (e.g. reduce-scatter optimizers) later.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vae_mdl_tpu.config import ExperimentConfig
from vae_mdl_tpu.models.objective import compute_loss
from vae_mdl_tpu.models.vae import prior_for
from vae_mdl_tpu.train.steps import preprocess
from vae_mdl_tpu.train.state import TrainState


def make_shard_map_train_step(
    model,
    cfg: ExperimentConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable:
    """(replicated state, data-sharded uint8 batch) -> (state, metrics).

    Inside the shard-mapped body every device sees its batch shard and the
    full (replicated) params; gradients are pmean'ed over ``data`` before the
    optimizer update, so each device applies the identical update.
    """
    prior = prior_for(cfg.model)
    k = cfg.model.n_samples

    def per_device_step(state: TrainState, batch: jax.Array):
        rngs = state.next_rngs("sample", "binarize")
        # decorrelate per-device sampling/binarisation noise
        didx = jax.lax.axis_index("data")
        rngs = {name: jax.random.fold_in(key, didx)
                for name, key in rngs.items()}
        x = preprocess(cfg, batch, rngs["binarize"])

        def loss_fn(params):
            Qs, Ps, pxz = model.apply(params, x, k,
                                      rngs={"sample": rngs["sample"]})
            return compute_loss(prior, Qs, Ps, pxz, x,
                                beta=cfg.model.beta,
                                objective=getattr(cfg.model, "objective",
                                                  "iwae"))

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # THE collective: average gradients (and the scalar metrics) over the
        # data axis — rides ICI
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        metrics = jax.tree.map(lambda m: jax.lax.pmean(jnp.mean(m), "data"),
                               metrics)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics["loss"] = loss
        return new_state, metrics

    replicated = P()

    mapped = shard_map(
        per_device_step,
        mesh=mesh,
        in_specs=(replicated, P("data")),
        out_specs=(replicated, replicated),
    )
    return jax.jit(mapped)
