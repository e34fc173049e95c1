"""Multi-device tests on the 8-device virtual CPU mesh (conftest.py) —
SURVEY.md §4's answer to 'test multi-node without a cluster'."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.config import DataConfig, MeshConfig
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_state,
)
from vae_mdl_tpu.train.state import create_train_state, make_optimizer
from vae_mdl_tpu.train.steps import make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _cfg():
    cfg = experiment("model01")
    return dataclasses.replace(
        cfg, data=DataConfig(dataset="synthetic:mnist", batch_size=16)
    )


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=4, sample=2))
    assert mesh.shape == {"data": 4, "sample": 2}
    mesh1 = make_mesh(MeshConfig())  # all devices on data
    assert mesh1.shape["data"] == len(jax.devices())
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=3, sample=2))


def test_data_parallel_step_matches_single_device():
    """The sharded train step computes the same update as unsharded."""
    cfg = _cfg()
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((16, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)

    batch = np.random.default_rng(0).integers(
        0, 256, (16, 28, 28, 1), dtype=np.uint8
    )

    # single device
    s1, m1 = step(state, jnp.asarray(batch))

    # 8-way data parallel
    mesh = make_mesh(MeshConfig(data=8, sample=1))
    state_r = shard_state(mesh, state)
    s2, m2 = step(state_r, shard_batch(mesh, batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    leaf1 = jax.tree.leaves(s1.params)[0]
    leaf2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf2),
                               rtol=1e-4, atol=1e-6)


def test_pallas_kernel_under_gspmd_mesh_matches_single_device():
    """The fused MoDL Pallas kernel (default-on under TPU) stays correct when
    the jitted train step runs GSPMD-sharded over a 4x2 mesh: each shard's
    pallas_call sees its local block, the gradient all-reduce rides the
    shardings. Interpret mode on CPU; the identical program compiles via
    Mosaic on TPU (verified on hardware, docs/design.md §7)."""
    import dataclasses

    from vae_mdl_tpu.models.zoo import experiment

    cfg = experiment("model05")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, use_pallas=True, n_latent=8,
                                  n_samples=2),
        data=dataclasses.replace(cfg.data, dataset="synthetic:svhn_cropped"),
    )
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_train_state(model, cfg.train, jnp.zeros((16, 32, 32, 3)),
                               cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)
    batch = np.random.default_rng(0).integers(0, 256, (16, 32, 32, 3),
                                              dtype=np.uint8)

    s1, m1 = step(state, jnp.asarray(batch))

    mesh = make_mesh(MeshConfig(data=4, sample=2))
    s2, m2 = step(shard_state(mesh, state), shard_batch(mesh, batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    leaf1, leaf2 = (jax.tree.leaves(s.params)[0] for s in (s1, s2))
    np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf2),
                               rtol=1e-4, atol=1e-6)


def test_sample_sharded_eval_matches_unsharded():
    cfg = _cfg()
    model = build_model(cfg.model)
    x_f32 = jnp.zeros((8, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, 1)

    from vae_mdl_tpu.evaluation.harness import make_batch_evaluator

    batch = np.random.default_rng(1).integers(
        0, 256, (8, 28, 28, 1), dtype=np.uint8
    )
    ev_plain = make_batch_evaluator(model, cfg, n_samples=16, k_chunk=8)
    llh_plain = ev_plain(state.params, jnp.asarray(batch), jax.random.PRNGKey(0))

    mesh = make_mesh(MeshConfig(data=2, sample=4))
    ev_mesh = make_batch_evaluator(model, cfg, n_samples=16, k_chunk=8, mesh=mesh)
    llh_mesh = ev_mesh(
        state.params, shard_batch(mesh, batch), jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        np.asarray(llh_plain), np.asarray(llh_mesh), rtol=1e-4, atol=1e-3
    )


def test_graft_entry_dryrun():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip, entry

    fn, args = entry()
    loss = jax.jit(fn)(*args)
    assert jnp.isfinite(loss)
    dryrun_multichip(8)


def test_shard_map_step_trains_and_stays_replicated():
    """Explicit-collective shard_map path: loss decreases, params identical
    to a replicated layout after updates."""
    from vae_mdl_tpu.parallel.spmd import make_shard_map_train_step

    cfg = _cfg()
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((16, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)

    mesh = make_mesh(MeshConfig(data=8, sample=1))
    state = shard_state(mesh, state)
    step = make_shard_map_train_step(model, cfg, tx, mesh)

    batch = np.random.default_rng(0).integers(
        0, 256, (16, 28, 28, 1), dtype=np.uint8
    )
    losses = []
    for _ in range(4):
        state, m = step(state, shard_batch(mesh, batch))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 4
    # output state must be fully replicated (one shard == global value)
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_shard_map_moments_not_gradient_sum():
    """Regression: the shard_map step's optimizer moments must be EMAs of the
    gradient MEAN over devices, not the SUM. Under jax's check_vma semantics,
    reverse-mode AD w.r.t. replicated params auto-psums the gradient and an
    explicit pmean then degenerates to identity — an 8x gradient that Adam's
    scale invariance hides from parameter-level comparisons. Pin the moments
    against the GSPMD jit path, whose gradient is the plain global-batch mean."""
    from vae_mdl_tpu.parallel.spmd import make_shard_map_train_step

    cfg = _cfg()
    # disable per-device-noise streams so both paths see identical randomness:
    # one sample draw per (image, k) either way requires same key; instead use
    # a deterministic check on magnitude (the 8x bug is a factor, not noise)
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((16, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    batch = np.random.default_rng(0).integers(
        0, 256, (16, 28, 28, 1), dtype=np.uint8
    )
    mesh = make_mesh(MeshConfig(data=8, sample=1))

    step_jit = make_train_step(model, cfg, tx, donate=False)
    s_jit, _ = step_jit(shard_state(mesh, state), shard_batch(mesh, batch))
    mu_jit = np.concatenate([np.asarray(l).ravel()
                             for l in jax.tree.leaves(s_jit.opt_state[0].mu)])

    step_sm = make_shard_map_train_step(model, cfg, tx, mesh)
    s_sm, _ = step_sm(shard_state(mesh, state), shard_batch(mesh, batch))
    mu_sm = np.concatenate([np.asarray(l).ravel()
                            for l in jax.tree.leaves(s_sm.opt_state[0].mu)])

    # different RNG layouts -> different noise, but the NORM must agree to
    # well under the 8x factor the bug introduced
    ratio = np.linalg.norm(mu_sm) / np.linalg.norm(mu_jit)
    assert 0.5 < ratio < 2.0, f"moment-norm ratio {ratio} (8x => gradient sum)"


def test_zero1_sharded_optimizer_matches_shard_map_step():
    """ZeRO-1 path (reduce-scatter grads, 1/ndev Adam moments per device,
    all-gather params): computes the SAME update as the plain shard_map step
    while the optimizer moments are genuinely sharded over the mesh."""
    from vae_mdl_tpu.parallel.spmd import (
        make_shard_map_train_step,
        make_zero1_train_step,
        zero1_opt_state,
    )

    cfg = _cfg()
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((16, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    batch = np.random.default_rng(0).integers(
        0, 256, (16, 28, 28, 1), dtype=np.uint8
    )
    mesh = make_mesh(MeshConfig(data=8, sample=1))

    s_ref = shard_state(mesh, state)
    step_ref = make_shard_map_train_step(model, cfg, tx, mesh)

    s_z = state.replace(
        params=shard_state(mesh, state.params),
        rng=shard_state(mesh, state.rng),
        step=shard_state(mesh, state.step),
        best_val_loss=shard_state(mesh, state.best_val_loss),
        opt_state=zero1_opt_state(tx, state.params, mesh),
    )
    step_z = make_zero1_train_step(model, cfg, tx, mesh)

    xb = shard_batch(mesh, batch)
    for _ in range(3):
        s_ref, m_ref = step_ref(s_ref, xb)
        s_z, m_z = step_z(s_z, xb)

    assert float(m_ref["loss"]) == pytest.approx(float(m_z["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # the Adam moments really live 1/ndev per device
    mu = s_z.opt_state[0].mu
    n_pad = mu.shape[0]
    assert n_pad % 8 == 0
    assert {sh.data.shape for sh in mu.addressable_shards} == {(n_pad // 8,)}
    # and params stay fully replicated
    assert jax.tree.leaves(s_z.params)[0].sharding.is_fully_replicated


def test_grad_skip_under_mesh_paths():
    """grad_skip_threshold on the shard_map and ZeRO-1 paths: the collective
    grad-norm (pmean'd grads / psum of sharded slice sumsq) is consistent
    across devices, an always-exceeded threshold leaves params bit-identical
    while the step advances, and the two paths agree with each other on what
    the global gradient norm IS (they share the per-device rng scheme; the
    jit path draws different binarisation noise, so it's not comparable)."""
    from vae_mdl_tpu.parallel.spmd import (
        make_shard_map_train_step,
        make_zero1_train_step,
        zero1_opt_state,
    )

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_skip_threshold=1e-9))
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((16, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    batch = np.random.default_rng(0).integers(
        0, 256, (16, 28, 28, 1), dtype=np.uint8
    )
    mesh = make_mesh(MeshConfig(data=8, sample=1))
    xb = shard_batch(mesh, batch)

    s_sm = shard_state(mesh, state)
    s_sm, m_sm = make_shard_map_train_step(model, cfg, tx, mesh)(s_sm, xb)
    s_z = state.replace(
        params=shard_state(mesh, state.params),
        rng=shard_state(mesh, state.rng),
        step=shard_state(mesh, state.step),
        best_val_loss=shard_state(mesh, state.best_val_loss),
        opt_state=zero1_opt_state(tx, state.params, mesh),
    )
    s_z, m_z = make_zero1_train_step(model, cfg, tx, mesh)(s_z, xb)

    for m, s in ((m_sm, s_sm), (m_z, s_z)):
        assert float(m["skipped"]) == 1.0
        assert int(s.step) == 1
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(s.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # full-gradient norm (pmean'd) == psum of the scattered slices' sumsq
    assert float(m_z["grad_norm"]) == pytest.approx(
        float(m_sm["grad_norm"]), rel=1e-5)


def test_restore_weights_lands_on_the_target_mesh(tmp_path):
    """Checkpointer.restore_weights (the eval/sample/export path) restores
    onto the TEMPLATE leaves' shardings, not the checkpoint's saved layout:
    a single-device-trained checkpoint restored into a mesh-sharded
    template comes back living on the mesh."""
    from vae_mdl_tpu.train.checkpoint import Checkpointer

    cfg = _cfg()
    model = build_model(cfg.model)
    from vae_mdl_tpu.train.state import make_optimizer as mko
    tx = mko(cfg.train)
    x_f32 = jnp.zeros((16, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)
    state, _ = step(state, jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (16, 28, 28, 1), dtype=np.uint8)))
    ck = Checkpointer(str(tmp_path), "rw", async_save=False)
    ck.save(state, "latest")

    mesh = make_mesh(MeshConfig(data=8, sample=1))
    template = shard_state(
        mesh, create_train_state(model, cfg.train, x_f32,
                                 cfg.model.n_samples))
    out = ck.restore_weights(template, "latest")
    assert int(out.step) == 1
    leaf = jax.tree.leaves(out.params)[0]
    assert set(leaf.sharding.device_set) == set(mesh.devices.flat)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(out.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zero1_clip_uses_the_collective_norm():
    """grad_clip_norm on the ZeRO-1 path must clip by the GLOBAL gradient
    norm: the optax chain's clip inside tx only sees this device's 1/ndev
    slice (a local norm that under-clips and scales shards unevenly), so
    the step pre-scales with the psum'd norm. Pinned by parity: with a
    tightly binding clip, one ZeRO-1 step equals one shard_map step (whose
    grads are pmean'd full-size, so ITS chain clip is trivially global)."""
    from vae_mdl_tpu.parallel.spmd import (
        make_shard_map_train_step,
        make_zero1_train_step,
        zero1_opt_state,
    )

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_clip_norm=0.01))
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((16, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    batch = np.random.default_rng(0).integers(
        0, 256, (16, 28, 28, 1), dtype=np.uint8
    )
    mesh = make_mesh(MeshConfig(data=8, sample=1))
    xb = shard_batch(mesh, batch)

    s_sm = shard_state(mesh, state)
    s_sm, m_sm = make_shard_map_train_step(model, cfg, tx, mesh)(s_sm, xb)
    s_z = state.replace(
        params=shard_state(mesh, state.params),
        rng=shard_state(mesh, state.rng),
        step=shard_state(mesh, state.step),
        best_val_loss=shard_state(mesh, state.best_val_loss),
        opt_state=zero1_opt_state(tx, state.params, mesh),
    )
    s_z, m_z = make_zero1_train_step(model, cfg, tx, mesh)(s_z, xb)

    assert float(m_sm["grad_norm"]) > 0.01  # the clip really binds
    for a, b in zip(jax.tree.leaves(s_sm.params), jax.tree.leaves(s_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_trainer_and_eval_handle_indivisible_batches_under_mesh():
    """Regression: val sets / eval batch sizes that don't divide the data
    axis (e.g. digits' 297-image val set) must be rounded, not crash."""
    import dataclasses, tempfile

    from vae_mdl_tpu.config import DataConfig, TrainConfig
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp()
    cfg = experiment("digits")  # val split has 297 images
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="digits", batch_size=16, val_batch_size=500),
        train=TrainConfig(n_updates=2, eval_interval=1, report_images=False,
                          checkpoint_dir=tmp + "/c", log_dir=tmp + "/l"),
    )
    mesh = make_mesh(MeshConfig(data=8, sample=1))
    tr = Trainer(cfg, mesh=mesh)
    state = tr.fit(progress=False)
    assert int(state.step) == 2

    from vae_mdl_tpu.evaluation import evaluate_llh

    imgs = np.random.default_rng(0).integers(0, 256, (13, 16, 16, 1),
                                             dtype=np.uint8)
    _, per_image, _ = evaluate_llh(
        tr.model, cfg, tr.state.params, imgs, n_samples=8, k_chunk=4,
        batch_size=10, mesh=mesh, progress=False,
    )
    assert per_image.shape == (13,)


def test_device_dataset_under_mesh():
    """Device-resident dataset + data-parallel mesh: batches gathered on
    device are resharded over the data axis."""
    import dataclasses, tempfile

    from vae_mdl_tpu.config import DataConfig, TrainConfig
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp()
    cfg = experiment("model01")
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=16,
                        val_batch_size=32),
        train=TrainConfig(n_updates=4, eval_interval=2, steps_per_call=2,
                          device_dataset=True, report_images=False,
                          checkpoint_dir=tmp + "/c", log_dir=tmp + "/l"),
    )
    mesh = make_mesh(MeshConfig(data=8, sample=1))
    tr = Trainer(cfg, mesh=mesh)
    state = tr.fit(progress=False)
    assert int(state.step) == 4


def test_ema_stays_replicated_under_mesh():
    """EMA params follow the GSPMD data-parallel step and remain replicated
    (identical across devices) and equal to the single-device EMA."""
    from vae_mdl_tpu.config import TrainConfig

    cfg = _cfg()
    cfg = dataclasses.replace(cfg, train=TrainConfig(ema_decay=0.9))
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((16, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    assert state.ema_params is not None
    step = make_train_step(model, cfg, tx, donate=False)

    batch = np.random.default_rng(1).integers(
        0, 256, (16, 28, 28, 1), dtype=np.uint8
    )

    s1, _ = step(state, jnp.asarray(batch))  # single device

    mesh = make_mesh(MeshConfig(data=8, sample=1))
    sharded = shard_state(mesh, state)
    s8, _ = step(sharded, shard_batch(mesh, batch))

    # tolerance: all-reduce summation order differs from the single-device
    # reduction; the noise propagates through Adam into params and the EMA
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5),
        s1.ema_params, s8.ema_params,
    )
    # replicated layout: one shard per device, all equal
    leaf = jax.tree.leaves(s8.ema_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_tensor_parallel_layout_matches_single_device():
    """Megatron-style channel TP as a pure GSPMD layout (parallel/tensor.py):
    the UNCHANGED fused train step, with params/moments sharded over the
    ``model`` axis on their output-channel dim, computes the same update as
    the single-device layout — and the wide kernels really live sharded."""
    from vae_mdl_tpu.parallel.tensor import (
        make_tp_mesh,
        shard_batch_tp,
        shard_state_tp,
        tp_param_spec,
    )

    cfg = experiment("model05")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, n_latent=8, n_samples=2),
        data=dataclasses.replace(cfg.data, dataset="synthetic:svhn_cropped"),
    )
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_train_state(model, cfg.train, jnp.zeros((16, 32, 32, 3)),
                               cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)
    batch = np.random.default_rng(2).integers(0, 256, (16, 32, 32, 3),
                                              dtype=np.uint8)

    s1, m1 = step(state, jnp.asarray(batch))

    mesh = make_tp_mesh(2, 4)
    s2, m2 = step(shard_state_tp(state, mesh), shard_batch_tp(batch, mesh))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    # atol covers Adam's sign-sensitivity: where a gradient entry is ~0, the
    # partitioned program's different reduction order can flip its sign and
    # move that entry by up to ~2*lr (observed: 3/16k elements at 2e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=3e-3),
        s1.params, s2.params,
    )

    # the wide kernels must genuinely be channel-sharded in the output state
    from jax.sharding import PartitionSpec as P
    flat = jax.tree_util.tree_flatten_with_path(s2.params)[0]
    sharded = [
        (path, leaf) for path, leaf in flat
        if tp_param_spec(leaf, 4) != P()
    ]
    assert sharded, "expected at least one TP-eligible kernel"
    for path, leaf in sharded:
        assert not leaf.sharding.is_fully_replicated, jax.tree_util.keystr(path)
        spec = leaf.sharding.spec
        assert spec[-1] == "model", (jax.tree_util.keystr(path), spec)


def test_tp_sharding_keeps_heads_replicated():
    """Heads replicate BY PATH, not just by width: model01's 784-wide
    Bernoulli head and the MLPBlock mu/std heads pass the width test yet
    must stay replicated (parallel/tensor.py tp_replicated_by_path), while
    the hidden Dense kernels genuinely channel-shard."""
    from jax.sharding import PartitionSpec as P

    from vae_mdl_tpu.parallel.tensor import make_tp_mesh, tp_state_sharding

    cfg = experiment("model01")
    model = build_model(cfg.model)
    state = create_train_state(model, cfg.train, jnp.zeros((4, 28, 28, 1)),
                               cfg.model.n_samples)
    mesh = make_tp_mesh(4, 2)
    p = tp_state_sharding(state, mesh).params["params"]
    # likelihood head (Dense 200->784): wide enough to shard, but a head
    assert p["decoder"]["out"]["kernel"].spec == P()
    assert p["decoder"]["out"]["bias"].spec == P()
    # latent mu/std heads (MLPBlock Dense_2/Dense_3, 200->100): same
    assert p["encoder"]["MLPBlock_0"]["Dense_2"]["kernel"].spec == P()
    assert p["encoder"]["MLPBlock_0"]["Dense_3"]["kernel"].spec == P()
    # hidden layers really shard on their output channels
    assert p["encoder"]["MLPBlock_0"]["Dense_0"]["kernel"].spec == \
        P(None, "model")
    assert p["decoder"]["Dense_0"]["kernel"].spec == P(None, "model")


def test_hybrid_mesh_slice_major_on_data_axis():
    """Multi-slice (DCN) topology: the mesh orders slices as major blocks on
    the data axis, so the sample axis never crosses a slice boundary and only
    the gradient all-reduce rides DCN (parallel/mesh.py make_mesh)."""
    from vae_mdl_tpu.parallel.mesh import n_slices

    # simulate 2 ICI slices of 4 devices joined by DCN
    slice_of = lambda d: d.id // 4  # noqa: E731
    mesh = make_mesh(MeshConfig(data=4, sample=2), slice_of=slice_of)
    assert mesh.shape == {"data": 4, "sample": 2}
    arr = mesh.devices
    # each data row lives entirely in one slice; slice 0 = rows 0-1
    for row in range(4):
        ids = {slice_of(d) for d in arr[row]}
        assert ids == {row // 2}, (row, ids)
    # CPU devices carry no slice_index -> reports one slice
    assert n_slices(mesh) == 1

    # interleaved slice assignment still groups slice-major
    mesh2 = make_mesh(MeshConfig(data=8, sample=1),
                      slice_of=lambda d: d.id % 2)
    col = [d.id % 2 for d in mesh2.devices[:, 0]]
    assert col == [0, 0, 0, 0, 1, 1, 1, 1]

    # no slice info (the default on CPU): enumeration order unchanged
    base = make_mesh(MeshConfig(data=4, sample=2))
    assert [d.id for d in base.devices.flat] == list(range(8))


def test_hybrid_mesh_rejects_bad_slice_layouts():
    # data axis must be a multiple of the slice count
    with pytest.raises(ValueError, match="multiple of the DCN slice count"):
        make_mesh(MeshConfig(data=2, sample=4), slice_of=lambda d: d.id // 2)
    # unequal slice sizes
    with pytest.raises(ValueError, match="unequal DCN slice sizes"):
        make_mesh(MeshConfig(data=8, sample=1),
                  slice_of=lambda d: 0 if d.id < 3 else 1)


def test_hybrid_mesh_train_step_matches_single_device():
    """Device ordering is a layout decision, not a math one: the same update
    comes out of a 2-slice hybrid mesh as out of one device."""
    cfg = _cfg()
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((16, 28, 28, 1))
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)
    batch = np.random.default_rng(1).integers(
        0, 256, (16, 28, 28, 1), dtype=np.uint8
    )
    s1, m1 = step(state, jnp.asarray(batch))

    mesh = make_mesh(MeshConfig(data=4, sample=2),
                     slice_of=lambda d: d.id // 4)
    s2, m2 = step(shard_state(mesh, state), shard_batch(mesh, batch))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(s1.params)[0]),
                               np.asarray(jax.tree.leaves(s2.params)[0]),
                               rtol=1e-4, atol=1e-6)


# --- ladder families under the mesh (VERDICT r3 item #3) ----------------------
# The ladders are this repo's beyond-the-reference capability; they get the
# same multi-device proof as the VAE family: data-parallel equality, the TP
# layout's named head rules exercised on a real ladder tree, and ZeRO-1 +
# grad-skip on ladder params.


def _tiny_ladder(family: str):
    if family == "ladder":
        from vae_mdl_tpu.models.ladder import LadderConfig

        return LadderConfig(stages=((8, 4, 1, 2), (8, 4, 1, 2)),
                            n_samples=2, stem_features=8)
    from vae_mdl_tpu.models.bidirectional import BiLadderConfig

    return BiLadderConfig(stages=((8, 4, 1, 2), (8, 4, 1, 2)),
                          n_samples=2, stem_features=8)


def _ladder_exp(model_cfg, **train_over):
    from vae_mdl_tpu.config import ExperimentConfig, TrainConfig

    return ExperimentConfig(
        model=model_cfg,
        data=DataConfig(dataset="synthetic:svhn_cropped", batch_size=16),
        train=TrainConfig(**train_over),
    )


@pytest.mark.parametrize("family", ["ladder", "biladder"])
def test_ladder_data_parallel_matches_single_device(family):
    """ladder_svhn/biladder_svhn's model classes under a 4x2 mesh compute
    the same update as unsharded (tiny stage widths, real structure)."""
    mcfg = _tiny_ladder(family)
    cfg = _ladder_exp(mcfg)
    model = build_model(mcfg)
    tx = make_optimizer(cfg.train)
    state = create_train_state(model, cfg.train, jnp.zeros((16, 32, 32, 3)),
                               mcfg.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)
    batch = np.random.default_rng(0).integers(0, 256, (16, 32, 32, 3),
                                              dtype=np.uint8)

    s1, m1 = step(state, jnp.asarray(batch))
    mesh = make_mesh(MeshConfig(data=4, sample=2))
    s2, m2 = step(shard_state(mesh, state), shard_batch(mesh, batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tp_layout_on_ladder_keeps_heads_replicated():
    """The TP head rules explicitly NAME the ladder modules
    (obs_head/q_top/p_i/q_i, parallel/tensor.py _HEAD_NAME) — exercise
    them on a real biladder params tree: the head leaves replicate, the
    body convs shard, and the same fused step runs under the
    ("data", "model") mesh with the single-device loss."""
    import re

    from vae_mdl_tpu.parallel.tensor import (
        make_tp_mesh,
        shard_batch_tp,
        shard_state_tp,
    )
    from vae_mdl_tpu.utils.trees import path_tuple

    mcfg = _tiny_ladder("biladder")
    cfg = _ladder_exp(mcfg)
    model = build_model(mcfg)
    tx = make_optimizer(cfg.train)
    state = create_train_state(model, cfg.train, jnp.zeros((16, 32, 32, 3)),
                               mcfg.n_samples)
    step = make_train_step(model, cfg, tx, donate=False)
    batch = np.random.default_rng(0).integers(0, 256, (16, 32, 32, 3),
                                              dtype=np.uint8)
    s1, m1 = step(state, jnp.asarray(batch))

    mesh = make_tp_mesh(4, 2)
    tp_state = shard_state_tp(state, mesh, min_features=8)

    head_re = re.compile(r"^(obs_head|q_top|p_\d+|q_\d+)$")
    flat = jax.tree_util.tree_flatten_with_path(tp_state.params)[0]
    head_leaves = [l for p, l in flat
                   if any(head_re.match(n) for n in path_tuple(p))]
    body_sharded = [l for p, l in flat
                    if not any(head_re.match(n) for n in path_tuple(p))
                    and not l.sharding.is_fully_replicated]
    # all four named head kinds exist in the tree and ALL their leaves
    # replicate despite passing the width test (2*lat = 8 = min_features)
    names = {n for p, _ in flat for n in path_tuple(p) if head_re.match(n)}
    assert {"obs_head", "q_top", "p_0", "q_0"} <= names
    assert head_leaves and all(l.sharding.is_fully_replicated
                               for l in head_leaves)
    assert body_sharded, "TP layout: expected channel-sharded body convs"

    s2, m2 = step(tp_state, shard_batch_tp(batch, mesh))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_zero1_and_grad_skip_on_ladder():
    """ZeRO-1 on biladder params: sharded Adam moments, a real update; with
    an always-exceeded grad_skip_threshold the params stay bit-identical
    while the step advances — the shared update policy on a ladder tree."""
    from vae_mdl_tpu.parallel.spmd import (
        make_zero1_train_step,
        zero1_opt_state,
    )

    mcfg = _tiny_ladder("biladder")
    mesh = make_mesh(MeshConfig(data=8, sample=1))
    batch = np.random.default_rng(0).integers(0, 256, (16, 32, 32, 3),
                                              dtype=np.uint8)
    xb = shard_batch(mesh, batch)

    for skip, expect_change in ((0.0, True), (1e-9, False)):
        cfg = _ladder_exp(mcfg, grad_skip_threshold=skip)
        model = build_model(mcfg)
        tx = make_optimizer(cfg.train)
        state = create_train_state(model, cfg.train,
                                   jnp.zeros((16, 32, 32, 3)),
                                   mcfg.n_samples)
        s_z = state.replace(
            params=shard_state(mesh, state.params),
            rng=shard_state(mesh, state.rng),
            step=shard_state(mesh, state.step),
            best_val_loss=shard_state(mesh, state.best_val_loss),
            opt_state=zero1_opt_state(tx, state.params, mesh),
        )
        s_z, m_z = make_zero1_train_step(model, cfg, tx, mesh)(s_z, xb)
        assert int(s_z.step) == 1
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(state.params),
                            jax.tree.leaves(s_z.params)))
        assert changed == expect_change
        if skip:
            assert float(m_z["skipped"]) == 1.0
        else:
            # moments really live 1/ndev per device
            mu = s_z.opt_state[0].mu
            n_pad = mu.shape[0]
            assert {sh.data.shape for sh in mu.addressable_shards} == {
                (n_pad // 8,)}
