"""AOT export for serving (models/export.py): StableHLO artifacts with
weights baked in, loadable with only jax.

The reference has no deployment surface at all (inference lives inside
each model's plotting ``report``, models/model01.py:228-261); these tests
pin the export/serve contract: serialize -> deserialize -> run gives the
same outputs as the live model."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.config import DataConfig
from vae_mdl_tpu.models.export import (
    export_callable,
    export_encoder,
    export_reconstructor,
    export_sampler,
    load_exported,
)
from vae_mdl_tpu.models.inference import (
    make_encoder_fn,
    make_reconstructor,
    make_sampler,
)
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment


def _tiny_model01():
    cfg = experiment("model01")
    model = build_model(cfg.model)
    x = jnp.zeros((2, 28, 28, 1), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, 1)
    return cfg, model, params


def test_export_callable_roundtrip(tmp_path):
    path = str(tmp_path / "f.stablehlo")
    blob = export_callable(lambda a, b: a @ b + 1.0,
                           (jnp.zeros((3, 4)), jnp.zeros((4, 2))), path)
    assert isinstance(blob, bytes) and len(blob) > 0
    f = load_exported(path)
    a = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    b = jnp.ones((4, 2), jnp.float32)
    np.testing.assert_allclose(np.asarray(f(a, b)), np.asarray(a @ b + 1.0))


def test_sampler_export_matches_live(tmp_path):
    cfg, model, params = _tiny_model01()
    path = str(tmp_path / "sampler.stablehlo")
    export_sampler(model, cfg.model, params, n=4, path=path)

    serve = load_exported(path)
    key = jax.random.PRNGKey(7)
    got = np.asarray(serve(key))
    want = np.asarray(make_sampler(model, cfg.model)(params, key, 4))
    assert got.shape == (4, 28, 28, 1) and got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_reconstructor_and_encoder_export(tmp_path):
    cfg, model, params = _tiny_model01()
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 28, 28, 1)), jnp.float32)
    key = jax.random.PRNGKey(3)

    rp = str(tmp_path / "recon.stablehlo")
    export_reconstructor(model, cfg.model, params, x.shape, path=rp)
    got = np.asarray(load_exported(rp)(key, x))
    want = np.asarray(make_reconstructor(model, cfg.model)(params, key, x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    ep = str(tmp_path / "enc.stablehlo")
    export_encoder(model, cfg.model, params, x.shape, path=ep)
    got = load_exported(ep)(key, x)
    want = make_encoder_fn(model)(params, key, x)
    assert len(got) == len(want)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-6, atol=1e-6)


def test_cli_export(tmp_path, monkeypatch, capsys):
    from vae_mdl_tpu.cli.run import main

    monkeypatch.chdir(tmp_path)
    main([
        "export", "model01",
        "--dataset", "synthetic:mnist",
        "--batch-size", "8",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "tb"),
        "--what", "sampler", "--n", "4",
        "--out", str(tmp_path / "m01.stablehlo"),
    ])
    out = capsys.readouterr().out
    assert "wrote sampler" in out and "single-device" in out
    serve = load_exported(str(tmp_path / "m01.stablehlo"))
    imgs = np.asarray(serve(jax.random.PRNGKey(0)))
    assert imgs.shape == (4, 28, 28, 1) and imgs.dtype == np.uint8

    # explicit --mesh embeds the sharded serving layout (encoder path)
    main([
        "export", "model01",
        "--dataset", "synthetic:mnist",
        "--batch-size", "8", "--mesh", "4x2",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "tb"),
        "--what", "encoder", "--n", "8",
        "--out", str(tmp_path / "m01_enc.stablehlo"),
    ])
    out = capsys.readouterr().out
    assert "sharded (4, 2)" in out


def test_multiplatform_export_runs_on_cpu(tmp_path):
    """platforms=('tpu','cpu') produces ONE artifact servable on either
    backend — here exported and executed on the CPU side."""
    cfg, model, params = _tiny_model01()
    path = str(tmp_path / "multi.stablehlo")
    export_sampler(model, cfg.model, params, n=2, path=path,
                   platforms=("tpu", "cpu"))
    imgs = np.asarray(load_exported(path)(jax.random.PRNGKey(0)))
    assert imgs.shape == (2, 28, 28, 1) and imgs.dtype == np.uint8


def test_sharded_serving_export(tmp_path):
    """Multi-device serving: an encoder exported with a mesh embeds the
    batch-on-'data' GSPMD layout (artifact records the device count); a
    process with the same topology runs it sharded and matches the
    single-device result."""
    from vae_mdl_tpu.config import MeshConfig
    from vae_mdl_tpu.parallel.mesh import batch_sharding, make_mesh

    cfg, model, params = _tiny_model01()
    mesh = make_mesh(MeshConfig(data=4, sample=2))
    x = jnp.asarray(
        np.random.default_rng(1).random((8, 28, 28, 1)), jnp.float32)
    key = jax.random.PRNGKey(11)

    path = str(tmp_path / "enc_sharded.stablehlo")
    export_encoder(model, cfg.model, params, x.shape, path=path, mesh=mesh)

    serve = load_exported(path)
    x_sharded = jax.device_put(x, batch_sharding(mesh))
    got = serve(key, x_sharded)
    want = make_encoder_fn(model)(params, key, x)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)


def test_export_hierarchical_family(tmp_path):
    """The ladder's generate() path exports too (multi-layer ancestral
    sampling under jax.export's tracing)."""
    cfg = experiment("ladder_svhn")
    cfg = dataclasses.replace(cfg, data=DataConfig(dataset="synthetic:svhn"))
    model = build_model(cfg.model)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, 1)
    path = str(tmp_path / "ladder.stablehlo")
    export_sampler(model, cfg.model, params, n=2, path=path)
    imgs = np.asarray(load_exported(path)(jax.random.PRNGKey(1)))
    assert imgs.shape == (2, 32, 32, 3) and imgs.dtype == np.uint8
