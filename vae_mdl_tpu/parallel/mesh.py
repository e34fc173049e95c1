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


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None, *,
              slice_of=None) -> Mesh:
    """Build the ``(data[, sample][, model])`` mesh over ``devices``.

    Multi-slice topologies (several ICI slices joined by DCN — the standard
    multi-pod production layout) are detected automatically: when the devices
    carry distinct ``slice_index`` values, the mesh is ordered *slice-major on
    the data axis*, so that

    - the ``sample`` (k-axis logsumexp) and ``model`` (tensor-parallel)
      collectives stay entirely inside one slice and ride ICI, and
    - the only collective that crosses DCN is the once-per-step gradient
      all-reduce on ``data`` — the bandwidth-tolerant one.

    ``slice_of`` overrides the grouping (device -> slice id), used by tests
    and the dryrun to simulate slices on hosts whose devices carry no
    ``slice_index`` (CPU). Single-slice meshes keep jax's device enumeration
    order unchanged.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    sample = max(1, cfg.sample)
    model = max(1, getattr(cfg, "model", 1))
    data = cfg.data if cfg.data > 0 else n // (sample * model)
    if data * sample * model != n:
        raise ValueError(f"mesh {data}x{sample}x{model} != {n} devices")
    arr = _device_array(devices, data, sample, model, slice_of)
    if model > 1:
        # third axis: hidden channels (tensor parallelism, parallel/tensor.py)
        return Mesh(arr, axis_names=("data", "sample", "model"))
    return Mesh(arr.reshape(data, sample), axis_names=("data", "sample"))


def _device_array(devices, data, sample, model, slice_of):
    """Order ``devices`` into a (data, sample, model) array; slice-major on
    the data axis when the topology spans multiple DCN slices."""
    key = slice_of or (lambda d: getattr(d, "slice_index", None))
    groups: dict = {}
    for d in devices:
        groups.setdefault(key(d), []).append(d)
    if len(groups) <= 1 or None in groups:
        # single slice (or no slice information): keep enumeration order
        return np.asarray(devices).reshape(data, sample, model)
    n_slices = len(groups)
    sizes = {sid: len(g) for sid, g in groups.items()}
    if len(set(sizes.values())) != 1:
        raise ValueError(f"unequal DCN slice sizes: {sizes}")
    if data % n_slices != 0:
        raise ValueError(
            f"data axis ({data}) must be a multiple of the DCN slice count "
            f"({n_slices}) so each slice holds whole data-parallel rows; "
            f"sample/model axes always stay inside one slice"
        )
    # equal slice sizes + data*sample*model == n already guarantee each
    # slice holds exactly per_slice_data x sample x model devices
    per_slice_data = data // n_slices
    blocks = [
        np.asarray(groups[sid]).reshape(per_slice_data, sample, model)
        for sid in sorted(groups)
    ]
    return np.concatenate(blocks, axis=0)


def n_slices(mesh: Mesh) -> int:
    """Number of distinct DCN slices the mesh spans (1 on one slice/CPU).

    Any device without slice info means the mesh was NOT laid out
    slice-major (``_device_array`` falls back to enumeration order when
    ``None`` appears in the groups), so partial slice info reports 1 to
    stay consistent with the layout actually built."""
    ids = {getattr(d, "slice_index", None) for d in mesh.devices.flat}
    return 1 if None in ids else len(ids)


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
