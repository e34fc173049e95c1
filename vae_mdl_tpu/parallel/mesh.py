"""Device mesh + sharding layout.

The reference is strictly single-process single-device (SURVEY.md §2.3);
this module is the TPU-native scaling layer it never had:

- a 2-D ``Mesh`` with axes ``("data", "sample")`` — ``data`` shards the
  batch (the primary axis for 32x32 images), ``sample`` shards importance
  samples (the workload's one novel parallel axis: k=5 in training, k=5000
  in the eval harness);
- params and optimizer state are replicated; batches are sharded on
  ``data``; the k-axis of eval log-weights is sharded on ``sample``;
- gradient all-reduce and the eval logsumexp combine are inserted by GSPMD
  from these shardings — no hand-written collectives, they ride ICI;
- multi-host: ``jax.distributed.initialize`` + per-process data sharding
  (data.pipeline.shard_arrays) extend the same layout over DCN.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_mdl_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sample = max(1, cfg.sample)
    model = max(1, getattr(cfg, "model", 1))
    data = cfg.data if cfg.data > 0 else n // (sample * model)
    if data * sample * model != n:
        raise ValueError(f"mesh {data}x{sample}x{model} != {n} devices")
    if model > 1:
        # third axis: hidden channels (tensor parallelism, parallel/tensor.py)
        arr = np.asarray(devices).reshape(data, sample, model)
        return Mesh(arr, axis_names=("data", "sample", "model"))
    arr = np.asarray(devices).reshape(data, sample)
    return Mesh(arr, axis_names=("data", "sample"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over ``data``; image dims replicated."""
    return NamedSharding(mesh, P("data"))


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """Leading importance-sample axis sharded over ``sample``, batch over
    ``data`` (for [k, B, ...] tensors in the eval harness)."""
    return NamedSharding(mesh, P("sample", "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh))


def shard_state(mesh: Mesh, state):
    """Replicate a (state) pytree across the mesh."""
    return jax.device_put(state, replicated(mesh))
