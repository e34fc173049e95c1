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
Use this one for deterministic collective placement.

``make_zero1_train_step`` extends it with a ZeRO-1 sharded optimizer:
gradients are ``psum_scatter``'d (reduce-scatter) over ``data``, every device
keeps only a 1/ndev slice of the Adam moments, updates its parameter slice,
and an ``all_gather`` rebuilds the replicated params — optimizer memory drops
by the data-axis size and the reduce-scatter + all-gather pair moves the same
bytes as the plain all-reduce. Pointless at this repo's model sizes (≤3.4M
params, SURVEY §2.3) but it is the standard TPU recipe the framework should
carry for larger ones; both collectives ride ICI.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vae_mdl_tpu.config import ExperimentConfig
from vae_mdl_tpu.models.objective import training_loss_fn
from vae_mdl_tpu.models.vae import prior_for
from vae_mdl_tpu.train.steps import (
    apply_update,
    effective_beta,
    ema_step,
    preprocess_train,
)
from vae_mdl_tpu.train.state import TrainState


def make_shard_map_train_step(
    model,
    cfg: ExperimentConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable:
    """(replicated state, data-sharded uint8 batch) -> (state, metrics).

    Inside the shard-mapped body every device sees its batch shard and the
    full (replicated) params; gradients are pmean'ed before the optimizer
    update, so each device applies the identical update.

    The batch shards over ALL mesh axes flattened (like the ZeRO-1 path):
    on a (data, sample) mesh the sample-axis devices carry their own batch
    shards rather than silently duplicating the data-axis work — the
    ``sample`` axis only means importance-sample sharding inside the eval
    harness, not here.
    """
    prior = prior_for(cfg.model)
    k = cfg.model.n_samples
    axes = mesh.axis_names

    def per_device_step(state: TrainState, batch: jax.Array):
        rngs = state.next_rngs("sample", "binarize", "flip")
        # decorrelate per-device sampling/binarisation/flip noise
        didx = jax.lax.axis_index(axes)
        rngs = {name: jax.random.fold_in(key, didx)
                for name, key in rngs.items()}
        x = preprocess_train(cfg, batch, rngs)
        beta = effective_beta(cfg, state.step)

        loss_fn = training_loss_fn(model, cfg, prior, x, k,
                                   rngs["sample"], beta)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # THE collective: average gradients (and the scalar metrics) over
        # every mesh axis — rides ICI
        grads = jax.lax.pmean(grads, axes)
        loss = jax.lax.pmean(loss, axes)
        metrics = jax.tree.map(lambda m: jax.lax.pmean(jnp.mean(m), axes),
                               metrics)

        # shared policy on the pmean'd (hence replicated) grads: the default
        # local global_norm IS the global norm, and params/EMA stay exactly
        # replicated after the identical per-device update
        params, opt_state, ok, stats = apply_update(
            cfg, tx, state.params, state.opt_state, grads, loss)
        metrics.update(stats)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1,
            ema_params=ema_step(cfg, state.ema_params, params, ok),
        )
        metrics["loss"] = loss
        return new_state, metrics

    replicated = P()

    mapped = shard_map(
        per_device_step,
        mesh=mesh,
        in_specs=(replicated, P(axes)),
        out_specs=(replicated, replicated),
        # classic per-device semantics. Under check_vma=True, reverse-mode AD
        # w.r.t. the REPLICATED params inserts its own psum into the transpose
        # (grads come back already summed over `data`) and the explicit pmean
        # above then degenerates to identity — net effect: the optimizer sees
        # the gradient SUM, 8x on an 8-mesh. Adam's scale invariance masked
        # this; tests/test_parallel.py pins the moments against the jit path.
        check_vma=False,
    )
    return jax.jit(mapped)


# --- ZeRO-1: sharded optimizer state over the data axis -----------------------


def _padded_flat_size(params, ndev: int) -> int:
    n = sum(x.size for x in jax.tree.leaves(params))
    return -(-n // ndev) * ndev


def zero1_opt_state(tx: optax.GradientTransformation, params, mesh: Mesh):
    """Optimizer state over the FLATTENED parameter vector, sharded on
    ``data``: rank-1 leaves of size n_pad live P("data") (1/ndev per device),
    scalars (step counts) replicate. Feed to ``make_zero1_train_step`` in
    place of ``TrainState.opt_state``.
    """
    from jax.flatten_util import ravel_pytree
    from jax.sharding import NamedSharding

    ndev = mesh.size
    flat, _ = ravel_pytree(params)
    n_pad = -(-flat.size // ndev) * ndev
    flat = jnp.concatenate([flat, jnp.zeros(n_pad - flat.size, flat.dtype)])
    opt_state = tx.init(flat)

    def put(leaf):
        if jnp.ndim(leaf) == 1 and leaf.shape[0] == n_pad:
            return jax.device_put(leaf, NamedSharding(mesh, P(mesh.axis_names)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree.map(put, opt_state)


def make_zero1_train_step(
    model,
    cfg: ExperimentConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable:
    """(replicated state w/ zero1_opt_state, data-sharded batch) -> same.

    Per device: local grads -> flatten -> ``psum_scatter`` over the flat
    device axis (each device receives the mean of ITS slice) -> Adam on the
    slice against its sharded moments -> ``all_gather`` of the updated
    parameter slices -> unravel. Params stay replicated; optimizer moments
    never materialise unsharded. Uses ALL mesh devices as one flat shard
    axis (a pure data-parallel layout; pass a Dx1 mesh for clarity).
    """
    from jax.flatten_util import ravel_pytree

    prior = prior_for(cfg.model)
    k = cfg.model.n_samples
    axes = mesh.axis_names
    ndev = mesh.size

    def per_device_step(state: TrainState, batch: jax.Array):
        rngs = state.next_rngs("sample", "binarize", "flip")
        didx = jax.lax.axis_index(axes)
        rngs = {name: jax.random.fold_in(key, didx)
                for name, key in rngs.items()}
        x = preprocess_train(cfg, batch, rngs)
        beta = effective_beta(cfg, state.step)

        loss_fn = training_loss_fn(model, cfg, prior, x, k,
                                   rngs["sample"], beta)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        gflat, _ = ravel_pytree(grads)
        n = gflat.size
        n_pad = -(-n // ndev) * ndev
        shard = n_pad // ndev
        gflat = jnp.concatenate([gflat, jnp.zeros(n_pad - n, gflat.dtype)])
        # reduce-scatter: mean of this device's 1/ndev gradient slice
        g_mine = jax.lax.psum_scatter(
            gflat.reshape(ndev, shard), axes, scatter_dimension=0
        ) / ndev

        pflat, punravel = ravel_pytree(state.params)
        pflat = jnp.concatenate([pflat, jnp.zeros(n_pad - n, pflat.dtype)])
        p_mine = jax.lax.dynamic_slice_in_dim(pflat, didx * shard, shard)

        loss = jax.lax.pmean(loss, axes)
        gnorm = None
        want_gnorm = (cfg.train.grad_skip_threshold > 0
                      or cfg.train.grad_clip_norm > 0)
        if want_gnorm:
            # ||mean grad||: each device holds a disjoint slice of the mean
            # gradient (pad is zero), so the global norm is one psum away
            gnorm = jnp.sqrt(jax.lax.psum(jnp.sum(g_mine * g_mine), axes))
        if cfg.train.grad_clip_norm > 0:
            # clip HERE with the collective norm: the optax chain's
            # clip_by_global_norm inside tx sees only this device's slice,
            # so its local norm would under-clip (or scale shards by
            # different factors). After this global scaling every shard's
            # local norm is <= the threshold, making the inner clip an
            # exact no-op — one clip, with the right norm.
            g_mine = g_mine * jnp.minimum(
                1.0, cfg.train.grad_clip_norm / jnp.maximum(gnorm, 1e-16))

        # shared policy on the parameter SLICE, passing the collective norm
        # (tx sees only this device's slice; the pre-scaling above already
        # applied the one true clip, so the inner clip is an exact no-op)
        new_p_mine, opt_state, ok, stats = apply_update(
            cfg, tx, p_mine, state.opt_state, g_mine, loss, grad_norm=gnorm)

        new_flat = jax.lax.all_gather(new_p_mine, axes, tiled=True)
        new_params = punravel(new_flat[:n])

        metrics = jax.tree.map(lambda m: jax.lax.pmean(jnp.mean(m), axes),
                               metrics)
        metrics["loss"] = loss
        metrics.update(stats)
        new_state = state.replace(
            params=new_params, opt_state=opt_state, step=state.step + 1,
            # EMA over the all-gathered (replicated) params
            ema_params=ema_step(cfg, state.ema_params, new_params, ok),
        )
        return new_state, metrics

    # in_specs: replicated state EXCEPT the flat opt-state moments (sharded
    # over the flattened device axes); batch sharded over the same
    def state_specs(state):
        n_pad = _padded_flat_size(state.params, ndev)

        def opt_spec(leaf):
            if jnp.ndim(leaf) == 1 and leaf.shape[0] == n_pad:
                return P(axes)
            return P()

        specs = jax.tree.map(lambda _: P(), state)
        return specs.replace(opt_state=jax.tree.map(opt_spec, state.opt_state))

    def step(state: TrainState, batch: jax.Array):
        mapped = shard_map(
            per_device_step,
            mesh=mesh,
            in_specs=(state_specs(state), P(axes)),
            out_specs=(state_specs(state), P()),
            # all_gathered params ARE replicated and psum'd metrics likewise,
            # but the static varying-axes checker can't see through the gather
            check_vma=False,
        )
        return mapped(state, batch)

    return jax.jit(step)


# --- Elastic resume: ZeRO-1 checkpoints across topologies ---------------------


def reshard_zero1_opt_state(opt_state, params, mesh: Mesh):
    """Re-lay a ZeRO-1 optimizer state out for ``mesh``.

    The flat Adam moments are padded to a multiple of the device count
    (``zero1_opt_state``), so a saved state's SHAPE encodes the topology it
    was created on. The pad region is provably inert — pad gradients are
    zero, so pad moments stay zero and pad parameter slots never move —
    which makes a topology change exact: strip the old pad, re-pad for the
    new device count, re-shard over the new mesh. Scalar leaves (step
    counts) replicate. The reference has no analogue (single device,
    weights-only checkpoints, SURVEY.md §5).
    """
    from jax.sharding import NamedSharding

    n = sum(x.size for x in jax.tree.leaves(params))
    n_pad = _padded_flat_size(params, mesh.size)

    def fix(leaf):
        if jnp.ndim(leaf) == 1 and leaf.shape[0] >= n:
            flat = jnp.concatenate(
                [leaf[:n], jnp.zeros(n_pad - n, leaf.dtype)])
            return jax.device_put(
                flat, NamedSharding(mesh, P(mesh.axis_names)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree.map(fix, opt_state)


def elastic_restore_zero1(ckptr, state: TrainState, mesh: Mesh,
                          tag: str = "latest") -> TrainState:
    """Restore a ZeRO-1 checkpoint saved under ANY device count onto ``mesh``.

    TPU slices get resized between a preemption and its resume; a run
    checkpointed on 8 chips may come back on 4 (degraded) or 16 (scale-up).
    ``state`` is the template built under the NEW mesh (params replicated,
    ``opt_state = zero1_opt_state(tx, params, mesh)``). The saved flat
    moments carry the OLD topology's padded length, so a strict restore
    into the new-shaped template would fail on shape: instead the saved
    length is read from checkpoint metadata, the moments are restored at
    that length (replicated — transiently 2x params per host, fine at any
    size ZeRO-1 is worth using for), and ``reshard_zero1_opt_state``
    re-pads and re-shards them for ``mesh``.
    """
    from jax.sharding import NamedSharding

    n = sum(x.size for x in jax.tree.leaves(state.params))
    n_pad_new = _padded_flat_size(state.params, mesh.size)

    meta = ckptr.metadata_tree(tag)
    if meta is None:
        # Saved shapes unknown — a strict restore is only correct when the
        # topology is unchanged. Try it, but name the real failure mode
        # instead of letting orbax surface an opaque shape mismatch.
        try:
            return ckptr.restore(state, tag)
        except Exception as e:
            raise ValueError(
                f"checkpoint '{tag}': metadata is unreadable, so the device "
                f"count it was saved under cannot be determined, and a "
                f"strict restore onto the current {mesh.size}-device mesh "
                f"failed — if the slice was resized since the save, resume "
                f"on the original topology (or repair the checkpoint "
                f"metadata) first") from e
    opt_meta = meta.get("opt_state") if hasattr(meta, "get") else None
    saved_lens = {
        m.shape[0]
        for m in jax.tree.leaves(opt_meta)
        if len(getattr(m, "shape", ())) == 1 and m.shape[0] >= n
    }
    if len(saved_lens) > 1:
        raise ValueError(
            f"checkpoint '{tag}' has flat moments of inconsistent lengths "
            f"{sorted(saved_lens)}; not a ZeRO-1 state")
    n_pad_old = saved_lens.pop() if saved_lens else n_pad_new

    if n_pad_old == n_pad_new:  # same topology (or not a ZeRO-1 state)
        return ckptr.restore(state, tag)

    repl = NamedSharding(mesh, P())

    def widen(leaf):
        if jnp.ndim(leaf) == 1 and leaf.shape[0] == n_pad_new:
            return jax.device_put(jnp.zeros(n_pad_old, leaf.dtype), repl)
        return leaf

    old_shaped = state.replace(
        opt_state=jax.tree.map(widen, state.opt_state))
    restored = ckptr.restore(old_shaped, tag)
    return restored.replace(opt_state=reshard_zero1_opt_state(
        restored.opt_state, restored.params, mesh))
