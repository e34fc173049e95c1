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
- everything else replicated — notably the likelihood head (its output
  feeds the fused Pallas MoDL kernel, which wants whole pixels per shard)
  and the latent-parameter heads (sampling reads full distributions).

The head exclusions are enforced BY PATH (``tp_replicated_by_path``), not
just by the shape test: model01's 784-wide Bernoulli head, a ``head_pad``-ed
MoDL head or the ladders' Gaussian heads all pass the width test yet must
replicate.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_mdl_tpu.utils.trees import path_tuple

# module names that are heads wherever they appear: the MLP decoder's
# Bernoulli head ('out', nn/decoders.py), the ladders' observation and
# per-scale Gaussian heads (models/bidirectional.py: obs_head / q_top /
# p_i / q_i)
_HEAD_NAME = re.compile(r"^(out|obs_head|q_top|p_\d+|q_\d+)$")


def _structural_head_pairs(params) -> tuple:
    """(parent, module) name pairs that are likelihood/latent heads in the
    VAE families, read off the params tree:

    - the decoder's LAST conv_i (the likelihood head, nn/decoders.py);
    - the conv encoder's Dense_0 (its fc emits [mu, logstd] — the
      latent-parameter head);
    - Dense_2/Dense_3 of every MLPBlock-shaped module (exactly four Dense
      children — the mu/std heads, nn/blocks.py MLPBlock).
    """
    tree = params.get("params", params) if hasattr(params, "get") else params
    pairs = []
    dec = tree.get("decoder") if hasattr(tree, "get") else None
    if dec is not None:
        idx = [int(k.split("_")[1]) for k in dec if k.startswith("conv_")]
        if idx:
            pairs.append(("decoder", f"conv_{max(idx)}"))
    enc = tree.get("encoder") if hasattr(tree, "get") else None
    if enc is not None and "conv_0" in enc and "Dense_0" in enc:
        pairs.append(("encoder", "Dense_0"))

    def walk(node, name):
        if not hasattr(node, "keys"):
            return
        dense = {k for k in node.keys() if k.startswith("Dense_")}
        if dense == {"Dense_0", "Dense_1", "Dense_2", "Dense_3"}:
            pairs.append((name, "Dense_2"))
            pairs.append((name, "Dense_3"))
        for k in node.keys():
            walk(node[k], k)

    walk(tree, "")
    return tuple(pairs)


def tp_replicated_by_path(path_names: Sequence[str],
                          head_pairs: Sequence[tuple]) -> bool:
    """True when the leaf at this key path belongs to a head module that the
    TP layout must keep replicated (works on params AND the mirrored Adam
    moment trees — the module names appear as a contiguous subpath)."""
    if any(_HEAD_NAME.match(n) for n in path_names):
        return True
    for a, b in head_pairs:
        for i in range(len(path_names) - 1):
            if path_names[i] == a and path_names[i + 1] == b:
                return True
    return False


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
    ``tp_param_spec`` — except head modules (``tp_replicated_by_path``),
    which replicate regardless of width; scalars and RNG keys replicate."""
    n_model = mesh.shape["model"]
    head_pairs = _structural_head_pairs(state.params)

    def spec_of(path, leaf):
        if tp_replicated_by_path(path_tuple(path), head_pairs):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, tp_param_spec(leaf, n_model, min_features))

    def shard_like_params(tree):
        return jax.tree_util.tree_map_with_path(spec_of, tree)

    replicated = NamedSharding(mesh, P())
    specs = jax.tree.map(lambda _: replicated, state)
    specs = specs.replace(
        params=shard_like_params(state.params),
        # Adam mu/nu mirror the param tree (same shapes + the module names
        # as a subpath → same specs); count/scalars replicate
        opt_state=shard_like_params(state.opt_state),
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
