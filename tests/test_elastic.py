"""Elastic resume: restoring checkpoints onto a DIFFERENT device topology.

TPU slices get resized between a preemption and its resume — a run
checkpointed on 8 chips may come back on 4. The reference has no story here
(single device, weights-only checkpoints, /root/reference/models/model01.py:263-267);
this framework supports it on both data-parallel paths:

- plain GSPMD states (the Trainer path): everything is replicated, so a
  fresh target built under the new mesh restores directly — Orbax reshards
  from the target arrays' shardings;
- ZeRO-1 states: the flat Adam moments are padded to a multiple of the OLD
  device count, so the saved shape encodes the topology;
  ``elastic_restore_zero1`` reads the saved length from checkpoint
  metadata, unpads, re-pads and re-shards for the new mesh — exactly (the
  pad region is inert).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.config import DataConfig, MeshConfig
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
from vae_mdl_tpu.parallel.spmd import (
    elastic_restore_zero1,
    make_zero1_train_step,
    reshard_zero1_opt_state,
    zero1_opt_state,
)
from vae_mdl_tpu.train.checkpoint import Checkpointer
from vae_mdl_tpu.train.state import create_train_state, make_optimizer
from vae_mdl_tpu.train.steps import make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _cfg():
    cfg = experiment("model01")
    return dataclasses.replace(
        cfg, data=DataConfig(dataset="synthetic:mnist", batch_size=24)
    )


def _batch(n=24):
    return np.random.default_rng(0).integers(
        0, 256, (n, 28, 28, 1), dtype=np.uint8
    )


def _submesh(n):
    return make_mesh(MeshConfig(data=n, sample=1), devices=jax.devices()[:n])


def test_plain_state_restores_across_meshes(tmp_path):
    """Trainer-path resume on a resized slice: save under an 8-device mesh,
    restore into a target built under a 4-device mesh (exactly what the
    Trainer does at startup — it builds state on ITS mesh, then calls
    restore_latest), values bit-equal, training continues on the new mesh."""
    cfg = _cfg()
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((24, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    step = make_train_step(model, cfg, tx)

    mesh8 = _submesh(8)
    s8 = shard_state(mesh8, state)
    b = _batch()
    for _ in range(2):
        s8, _ = step(s8, shard_batch(mesh8, b))

    ck = Checkpointer(str(tmp_path), "elastic", async_save=False)
    ck.save(s8, "latest")

    mesh4 = _submesh(4)
    target = shard_state(
        mesh4,
        create_train_state(model, cfg.train, x_f32, cfg.model.n_samples),
    )
    s4 = ck.restore_latest(target)
    assert s4 is not None
    assert int(s4.step) == 2
    for a, b_ in zip(jax.tree.leaves(s8.params), jax.tree.leaves(s4.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # the restored arrays live on the NEW mesh
    leaf = jax.tree.leaves(s4.params)[0]
    assert set(leaf.sharding.device_set) == set(mesh4.devices.flat)
    s4, m = step(s4, shard_batch(mesh4, b))
    assert np.isfinite(float(m["loss"]))


def test_elastic_restore_names_unreadable_metadata():
    """When checkpoint metadata is unreadable AND the strict restore fails,
    the error names the real failure mode (saved device count unknown on a
    possibly-resized slice) instead of surfacing orbax's opaque shape
    mismatch; when the strict restore succeeds (topology unchanged), the
    restored state passes through."""
    cfg = _cfg()
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((24, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    mesh = _submesh(4)
    template = state.replace(
        opt_state=zero1_opt_state(tx, state.params, mesh))

    class NoMetaCkptr:
        def __init__(self, fail):
            self.fail = fail

        def metadata_tree(self, tag):
            return None

        def restore(self, target, tag):
            if self.fail:
                raise ValueError("shape mismatch deep inside orbax")
            return target

    with pytest.raises(ValueError, match="metadata is unreadable"):
        elastic_restore_zero1(NoMetaCkptr(fail=True), template, mesh)
    out = elastic_restore_zero1(NoMetaCkptr(fail=False), template, mesh)
    assert out is template


@pytest.mark.parametrize("ndev_old,ndev_new", [(8, 3), (3, 8)])
def test_zero1_elastic_restore_across_device_counts(
    tmp_path, ndev_old, ndev_new
):
    """ZeRO-1 scale-down AND scale-up: the restored state equals an
    in-memory reshard of the live state (the checkpoint roundtrip adds
    nothing), the unpadded moments are value-identical, and one more train
    step on the new mesh is bit-equal between the two."""
    cfg = _cfg()
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((24, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    n = sum(x.size for x in jax.tree.leaves(state.params))

    mesh_old = _submesh(ndev_old)
    s_old = state.replace(
        params=shard_state(mesh_old, state.params),
        rng=shard_state(mesh_old, state.rng),
        step=shard_state(mesh_old, state.step),
        best_val_loss=shard_state(mesh_old, state.best_val_loss),
        opt_state=zero1_opt_state(tx, state.params, mesh_old),
    )
    step_old = make_zero1_train_step(model, cfg, tx, mesh_old)
    b = _batch()
    for _ in range(2):
        s_old, _ = step_old(s_old, shard_batch(mesh_old, b))

    ck = Checkpointer(str(tmp_path), "zero1", async_save=False)
    ck.save(s_old, "latest")

    # the padded lengths really differ, else this test checks nothing
    mesh_new = _submesh(ndev_new)
    n_pad_old = -(-n // ndev_old) * ndev_old
    n_pad_new = -(-n // ndev_new) * ndev_new
    assert n_pad_old != n_pad_new

    template = state.replace(
        params=shard_state(mesh_new, state.params),
        rng=shard_state(mesh_new, state.rng),
        step=shard_state(mesh_new, state.step),
        best_val_loss=shard_state(mesh_new, state.best_val_loss),
        opt_state=zero1_opt_state(tx, state.params, mesh_new),
    )
    s_ck = elastic_restore_zero1(ck, template, mesh_new, "latest")

    # values: params exact, moments exact on the real (unpadded) region,
    # pad region zero, and the step counter survived
    assert int(s_ck.step) == 2
    for a, b_ in zip(
        jax.tree.leaves(s_old.params), jax.tree.leaves(s_ck.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    mu_old = np.asarray(s_old.opt_state[0].mu)
    mu_ck = np.asarray(s_ck.opt_state[0].mu)
    np.testing.assert_array_equal(mu_old[:n], mu_ck[:n])
    assert not mu_ck[n:].any()

    # layout: 1/ndev_new of the moments per device, on the new mesh
    mu_leaf = s_ck.opt_state[0].mu
    assert mu_leaf.shape == (n_pad_new,)
    assert {sh.data.shape for sh in mu_leaf.addressable_shards} == {
        (n_pad_new // ndev_new,)
    }
    assert set(mu_leaf.sharding.device_set) == set(mesh_new.devices.flat)

    # the checkpoint roundtrip is transparent: continuing from the restored
    # state is bit-equal to continuing from an in-memory reshard
    s_mem = state.replace(
        params=shard_state(mesh_new, s_old.params),
        rng=shard_state(mesh_new, s_old.rng),
        step=shard_state(mesh_new, s_old.step),
        best_val_loss=shard_state(mesh_new, s_old.best_val_loss),
        opt_state=reshard_zero1_opt_state(
            s_old.opt_state, s_old.params, mesh_new
        ),
    )
    step_new = make_zero1_train_step(model, cfg, tx, mesh_new)
    bn = shard_batch(mesh_new, b)
    s_ck, m_ck = step_new(s_ck, bn)
    s_mem, m_mem = step_new(s_mem, bn)
    assert float(m_ck["loss"]) == float(m_mem["loss"])
    for a, b_ in zip(
        jax.tree.leaves(s_ck.params), jax.tree.leaves(s_mem.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
