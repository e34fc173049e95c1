"""Tensor parallelism as a GSPMD layout choice.

The reference is single-device (SURVEY.md §2.3) and these models are small
(≤3.4M params), so TP is capability, not necessity — but a framework that
claims the TPU scaling toolbox should carry the standard recipe. The
Megatron pattern maps onto a conv VAE as: shard each wide conv/dense kernel
over its OUTPUT-channel dim on a ``model`` mesh axis, leave the next
layer's kernel sharded on its INPUT-channel dim implicit — XLA's
partitioner propagates activation shardings through the program and
inserts the all-gather/reduce-scatter pairs where layers meet, riding ICI.

TPU-natively, that whole strategy is *data placement*, not new step code:
``shard_state_tp`` places params / EMA / Adam moments with the TP
``PartitionSpec``s and the UNCHANGED fused train step
(``train.steps.make_train_step``) runs under ``jit`` — GSPMD partitions
the very same program it runs in the replicated and data-parallel layouts.
Numerical equivalence with the single-device step is pinned in
tests/test_parallel.py.

Sharding rules (``tp_param_spec``):

- conv kernels HWIO with O divisible by the axis and O ≥ ``min_features``
  → ``P(None, None, None, "model")``;
- dense kernels IO under the same condition → ``P(None, "model")``;
- matching biases (O,) → ``P("model")``;
- everything else replicated — notably the likelihood head (its 50/6
  channel output feeds the fused Pallas MoDL kernel, which wants whole
  pixels per shard) and the latent-parameter heads (sampling reads full
  distributions).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """A ``("data", "model")`` mesh: batch over ``data``, hidden channels
    over ``model``."""
    devices = devices if devices is not None else jax.devices()
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def tp_param_spec(leaf, n_model: int, min_features: int = 64) -> P:
    """PartitionSpec for one parameter leaf under output-channel TP."""
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    out = shape[-1]
    if out % n_model != 0 or out < min_features:
        return P()
    return P(*([None] * (len(shape) - 1) + ["model"]))


def tp_state_sharding(state, mesh: Mesh, min_features: int = 64):
    """NamedSharding pytree for a TrainState: params, ema_params and the
    optimizer moments (same tree structure as params) follow
    ``tp_param_spec``; scalars and RNG keys replicate."""
    n_model = mesh.shape["model"]

    def spec_of(leaf):
        return NamedSharding(mesh, tp_param_spec(leaf, n_model, min_features))

    def shard_like_params(tree):
        return jax.tree.map(spec_of, tree)

    replicated = NamedSharding(mesh, P())
    specs = jax.tree.map(lambda _: replicated, state)
    specs = specs.replace(
        params=shard_like_params(state.params),
        # Adam mu/nu mirror the param tree (same shapes → same specs);
        # count/scalars fall through spec_of to replicated
        opt_state=jax.tree.map(spec_of, state.opt_state),
    )
    if state.ema_params is not None:
        specs = specs.replace(ema_params=shard_like_params(state.ema_params))
    return specs


def shard_state_tp(state, mesh: Mesh, min_features: int = 64):
    """Place a TrainState in the TP layout; the existing jitted train step
    then runs tensor-parallel with no code change."""
    return jax.device_put(state, tp_state_sharding(state, mesh, min_features))


def shard_batch_tp(batch, mesh: Mesh):
    return jax.device_put(batch, NamedSharding(mesh, P("data")))
