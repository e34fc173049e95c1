"""Reference-checkpoint weight import, validated against live Keras.

Builds pure-Keras mirrors of the reference models' trainable graphs for
FORWARD ground truth, writes their weights as a TF object-graph
checkpoint with the EXACT key layout a reference (TF2 + Keras 2)
``save_weights`` run produces — attribute paths like
``encoder/encode_x_to_z/l1/kernel/.ATTRIBUTES/VARIABLE_VALUE`` and
Keras's documented ``layer_with_weights-N`` Sequential naming — then
imports with ``load_reference_weights`` and asserts forward agreement
between the Keras stacks and the flax modules on random inputs. That pins
the Dense/Conv identity mapping AND the Conv2DTranspose
transpose(0,1,3,2)+flip transform end to end.

(This image carries Keras 3, whose ``save_weights`` only emits .h5 — the
TF-format layout is synthesised via ``tf.train.Checkpoint`` over
``tf.Module`` mirrors whose attribute names reproduce the Keras-2 keys.)

Reference graphs mirrored here:
- model01: models/model01.py:70-116 (BasicBlock l1/l2/lmu/lstd; decoder
  Sequential 200-200-784)
- model05: models/model05.py:24-81 (encoder convs 32/64/128/256 + fc 2n;
  decoder fc 2048 + deconvs 128/64/32 + Conv2D 50 head)
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vae_mdl_tpu.models import build_model  # noqa: E402
from vae_mdl_tpu.models.zoo import MODEL01, MODEL05  # noqa: E402
from vae_mdl_tpu.utils.import_reference import (  # noqa: E402
    load_reference_weights,
)

layers = tf.keras.layers


class _BasicBlock(tf.keras.Model):  # models/model01.py:70-86
    def __init__(self, n_hidden, n_latent):
        super().__init__()
        self.l1 = layers.Dense(n_hidden, activation=tf.nn.tanh)
        self.l2 = layers.Dense(n_hidden, activation=tf.nn.tanh)
        self.lmu = layers.Dense(n_latent, activation=None)
        self.lstd = layers.Dense(n_latent, activation=tf.exp)

    def call(self, x):
        h2 = self.l2(self.l1(x))
        return self.lmu(h2), self.lstd(h2)


class _Enc01(tf.keras.Model):  # models/model01.py:90-99
    def __init__(self):
        super().__init__()
        self.encode_x_to_z = _BasicBlock(200, 100)

    def call(self, x):
        return self.encode_x_to_z(tf.reshape(x, [x.shape[0], -1]))


class _Dec01(tf.keras.Model):  # models/model01.py:102-116
    def __init__(self):
        super().__init__()
        self.decode_z_to_x = tf.keras.Sequential([
            layers.Dense(200, activation=tf.nn.tanh),
            layers.Dense(200, activation=tf.nn.tanh),
            layers.Dense(784, activation=None),
        ])

    def call(self, z):
        return self.decode_z_to_x(z)


class _Ref01(tf.keras.Model):
    def __init__(self):
        super().__init__()
        self.encoder = _Enc01()
        self.decoder = _Dec01()

    def call(self, x):
        mu, std = self.encoder(x)
        return self.decoder(mu)


class _Enc05(tf.keras.Model):  # models/model05.py:24-52; act=gelu -> model06
    def __init__(self, n_latent=20, act=tf.nn.relu):
        super().__init__()
        self.convs = tf.keras.Sequential([
            layers.Conv2D(32, 3, strides=1, padding="same", activation=act),
            layers.Conv2D(64, 3, strides=2, padding="same", activation=act),
            layers.Conv2D(128, 3, strides=2, padding="same", activation=act),
            layers.Conv2D(256, 3, strides=2, padding="same", activation=act),
        ])
        self.fc = layers.Dense(2 * n_latent)

    def call(self, x):
        out = self.convs(x)
        out = tf.reshape(out, [out.shape[0], -1])
        mu, logstd = tf.split(self.fc(out), 2, axis=-1)
        return mu, logstd


class _Dec05(tf.keras.Model):  # models/model05.py:55-92; head/act -> model06
    def __init__(self, n_head=50, act=tf.nn.relu):
        super().__init__()
        self.fc = layers.Dense(4 * 4 * 128, activation=act)
        self.deconvs = tf.keras.Sequential([
            layers.Conv2DTranspose(128, 4, strides=2, padding="same",
                                   activation=act),
            layers.Conv2DTranspose(64, 4, strides=2, padding="same",
                                   activation=act),
            layers.Conv2DTranspose(32, 4, strides=2, padding="same",
                                   activation=act),
            layers.Conv2D(n_head, 3, padding="same", activation=None),
        ])

    def call(self, z):
        h = self.fc(z)
        h = tf.reshape(h, [-1, 4, 4, 128])
        return self.deconvs(h)


class _Ref05(tf.keras.Model):
    def __init__(self):
        super().__init__()
        self.encoder = _Enc05()
        self.decoder = _Dec05()

    def call(self, x):
        mu, logstd = self.encoder(x)
        return self.decoder(mu)


class _Node(tf.Module):
    """Bare trackable node; attribute names become checkpoint key parts."""


def _write_ref_ckpt(prefix, entries):
    """entries: {ref_base_path: keras_layer} -> TF-format checkpoint whose
    keys are `<base>/kernel/.ATTRIBUTES/VARIABLE_VALUE` (+ bias), i.e. the
    Keras-2 save_weights object-graph layout."""
    roots = {}
    for base, layer in entries.items():
        parts = base.split("/")
        obj = roots.setdefault(parts[0].replace("-", "_"), _Node())
        for p in parts[1:]:
            nxt = getattr(obj, p, None)
            if nxt is None:
                nxt = _Node()
                setattr(obj, p, nxt)
            obj = nxt
        obj.kernel = tf.Variable(layer.kernel.numpy())
        obj.bias = tf.Variable(layer.bias.numpy())
    tf.train.Checkpoint(**roots).write(prefix)


def _init_params(cfg, x):
    model = build_model(cfg)
    return model, model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, 1)


def _entries01(ref) -> dict:
    """{ref checkpoint base path: keras layer} for the model01 mirror —
    shared by the checkpoint writer here and the gradient-parity tests
    (tests/test_gradient_parity.py), which need per-layer gradients keyed
    the same way."""
    blk = ref.encoder.encode_x_to_z
    seq = ref.decoder.decode_z_to_x.layers
    return {
        "encoder/encode_x_to_z/l1": blk.l1,
        "encoder/encode_x_to_z/l2": blk.l2,
        "encoder/encode_x_to_z/lmu": blk.lmu,
        "encoder/encode_x_to_z/lstd": blk.lstd,
        "decoder/decode_z_to_x/layer_with_weights-0": seq[0],
        "decoder/decode_z_to_x/layer_with_weights-1": seq[1],
        "decoder/decode_z_to_x/layer_with_weights-2": seq[2],
    }


def _entries_conv(enc, dec) -> dict:
    """Entries for the model02/03/05/06 conv skeleton mirrors."""
    entries = {"encoder/fc": enc.fc, "decoder/fc": dec.fc}
    for i, layer in enumerate(enc.convs.layers):
        entries[f"encoder/convs/layer_with_weights-{i}"] = layer
    for i, layer in enumerate(dec.deconvs.layers):
        entries[f"decoder/deconvs/layer_with_weights-{i}"] = layer
    return entries


def _model01_ckpt(tmp_path, x) -> str:
    """Build the Keras mirror on x and write its reference-layout
    checkpoint; returns (prefix, ref)."""
    ref = _Ref01()
    ref(tf.constant(x))  # build
    prefix = str(tmp_path / "best")
    _write_ref_ckpt(prefix, _entries01(ref))
    return prefix, ref


def test_model01_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 28, 28, 1)).astype(np.float32)

    prefix, ref = _model01_ckpt(tmp_path, x)
    model, params = _init_params(MODEL01, jnp.asarray(x))
    params = load_reference_weights(prefix, "model01", params)

    # encoder agreement: q(z|x) parameters
    q = model.apply(params, jnp.asarray(x),
                    method=lambda m, a: m.encoder(a))
    mu_tf, std_raw_tf = ref.encoder(tf.constant(x))
    np.testing.assert_allclose(np.asarray(q.loc), mu_tf.numpy(),
                               rtol=1e-5, atol=1e-5)
    # reference applies exp as the Dense activation, ours as std_transform,
    # both then add 1e-6 (model01.py:74-85 vs nn.blocks.MLPBlock)
    np.testing.assert_allclose(np.asarray(q.scale),
                               std_raw_tf.numpy() + 1e-6,
                               rtol=1e-5, atol=1e-5)

    # decoder agreement: Bernoulli logits
    z = rng.standard_normal((3, 100)).astype(np.float32)
    obs = model.apply(params, jnp.asarray(z),
                      method=lambda m, a: m.decoder(a))
    logits_tf = ref.decoder(tf.constant(z)).numpy().reshape(3, 28, 28, 1)
    np.testing.assert_allclose(np.asarray(obs.logits), logits_tf,
                               rtol=1e-5, atol=1e-5)


def test_load_requires_full_tree():
    """Passing the inner params tree (without the top-level 'params'
    collection) fails fast with the contract, before any TF read."""
    _, params = _init_params(MODEL01, jnp.zeros((1, 28, 28, 1)))
    with pytest.raises(ValueError, match="full variables tree"):
        load_reference_weights("/nonexistent", "model01", params["params"])


def test_load_rejects_mapping_gaps(tmp_path):
    """Every template leaf must receive an imported value: a leaf the
    mapping does not cover (new variant, missed submodule) raises instead
    of silently staying at its random init."""
    import flax

    x = np.zeros((1, 28, 28, 1), np.float32)
    prefix, _ = _model01_ckpt(tmp_path, x)
    _, params = _init_params(MODEL01, jnp.asarray(x))
    params = flax.core.unfreeze(params)
    params["params"]["decoder"]["extra_layer"] = {
        "kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))}
    with pytest.raises(KeyError, match="unmapped.*extra_layer"):
        load_reference_weights(prefix, "model01", params)


def test_model05_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    ref = _Ref05()
    ref(tf.constant(x))  # build
    prefix = str(tmp_path / "best")
    _write_ref_ckpt(prefix, _entries_conv(ref.encoder, ref.decoder))

    model, params = _init_params(MODEL05, jnp.asarray(x))
    params = load_reference_weights(prefix, "model05", params)

    q = model.apply(params, jnp.asarray(x),
                    method=lambda m, a: m.encoder(a))
    mu_tf, logstd_tf = ref.encoder(tf.constant(x))
    np.testing.assert_allclose(np.asarray(q.loc), mu_tf.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(q.scale),
        tf.nn.softplus(logstd_tf).numpy(), rtol=1e-4, atol=1e-4)

    # decoder agreement through the three Conv2DTranspose layers + head:
    # this is the end-to-end check of the deconv weight transform
    z = rng.standard_normal((2, 20)).astype(np.float32)
    obs = model.apply(params, jnp.asarray(z),
                      method=lambda m, a: m.decoder(a))
    params_tf = ref.decoder(tf.constant(z)).numpy()
    np.testing.assert_allclose(np.asarray(obs.parameters),
                               params_tf.reshape(2, 32, 32, 50),
                               rtol=1e-4, atol=1e-4)


class _GLU(tf.keras.layers.Layer):  # modules/glu.py:5-33
    def __init__(self, filters=64):
        super().__init__()
        self.conv = tf.keras.Sequential([
            layers.Conv2D(filters, 3, strides=1, padding="same",
                          activation=tf.nn.relu),
            layers.Conv2D(2 * filters, 3, strides=1, padding="same",
                          activation=None),
        ])

    def call(self, x):
        a, b = tf.split(self.conv(x), 2, axis=-1)
        return tf.nn.relu(a * tf.nn.sigmoid(b))


class _Enc04(tf.keras.Model):  # models/model04.py:24-50
    def __init__(self, n_latent=50):
        super().__init__()
        self.convs = tf.keras.Sequential([
            layers.Conv2D(128, 4, strides=2, padding="same",
                          activation=tf.nn.relu),
            layers.Conv2D(256, 4, strides=2, padding="same",
                          activation=tf.nn.relu),
            layers.Conv2D(256, 3, strides=1, padding="same",
                          activation=tf.nn.relu),
            *[_GLU() for _ in range(5)],
        ])
        self.fc = layers.Dense(2 * n_latent)

    def call(self, x):
        out = self.convs(x)
        out = tf.reshape(out, [out.shape[0], -1])
        return tf.split(self.fc(out), 2, axis=-1)


class _Dec04(tf.keras.Model):  # models/model04.py:53-77
    def __init__(self):
        super().__init__()
        self.fc = layers.Dense(8 * 8 * 63, activation=tf.nn.relu)
        self.deconvs = tf.keras.Sequential([
            layers.Conv2D(256, 3, strides=1, padding="same",
                          activation=tf.nn.relu),
            *[_GLU() for _ in range(5)],
            layers.Conv2DTranspose(128, 4, strides=2, padding="same",
                                   activation=tf.nn.relu),
            layers.Conv2DTranspose(6, 4, strides=2, padding="same",
                                   activation=None),
        ])

    def call(self, z):
        h = tf.reshape(self.fc(z), [-1, 8, 8, 63])
        return self.deconvs(h)


def test_model04_roundtrip(tmp_path):
    from vae_mdl_tpu.models.zoo import MODEL04

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    enc, dec = _Enc04(), _Dec04()
    z_build = dec(tf.constant(rng.standard_normal((2, 50), ).astype(np.float32)))
    enc(tf.constant(x))

    entries = {"encoder/fc": enc.fc, "decoder/fc": dec.fc}
    for i, layer in enumerate(enc.convs.layers):
        base = f"encoder/convs/layer_with_weights-{i}"
        if isinstance(layer, _GLU):
            for j, sub in enumerate(layer.conv.layers):
                entries[f"{base}/conv/layer_with_weights-{j}"] = sub
        else:
            entries[base] = layer
    for i, layer in enumerate(dec.deconvs.layers):
        base = f"decoder/deconvs/layer_with_weights-{i}"
        if isinstance(layer, _GLU):
            for j, sub in enumerate(layer.conv.layers):
                entries[f"{base}/conv/layer_with_weights-{j}"] = sub
        else:
            entries[base] = layer
    prefix = str(tmp_path / "best")
    _write_ref_ckpt(prefix, entries)

    model, params = _init_params(MODEL04, jnp.asarray(x))
    params = load_reference_weights(prefix, "model04", params)

    q = model.apply(params, jnp.asarray(x),
                    method=lambda m, a: m.encoder(a))
    mu_tf, logstd_tf = enc(tf.constant(x))
    np.testing.assert_allclose(np.asarray(q.loc), mu_tf.numpy(),
                               rtol=1e-4, atol=1e-4)

    z = rng.standard_normal((2, 50)).astype(np.float32)
    obs = model.apply(params, jnp.asarray(z),
                      method=lambda m, a: m.decoder(a))
    out_tf = dec(tf.constant(z)).numpy()
    mu_ref, ls_ref = np.split(out_tf, 2, axis=-1)
    np.testing.assert_allclose(np.asarray(obs.loc), mu_ref,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(obs.logscale), ls_ref,
                               rtol=1e-4, atol=1e-4)


class _BasicBlock06(tf.keras.Model):
    """model06's second-layer BasicBlock mirror: gelu + softplus-lstd
    (model06.py:81-98). Module-level so the gradient-parity tests reuse it."""

    def __init__(self, n_hidden, n_latent):
        super().__init__()
        self.l1 = layers.Dense(n_hidden, activation=tf.nn.gelu)
        self.l2 = layers.Dense(n_hidden, activation=tf.nn.gelu)
        self.lmu = layers.Dense(n_latent, activation=None)
        self.lstd = layers.Dense(n_latent, activation=tf.nn.softplus)

    def call(self, z):
        h2 = self.l2(self.l1(z))
        return self.lmu(h2), self.lstd(h2)


def _entries06(enc, dec, mlp_enc, mlp_dec) -> dict:
    """Entries for the full model06 mirror (conv skeleton + the two
    second-stochastic-layer BasicBlocks, model06.py:188-191)."""
    entries = _entries_conv(enc, dec)
    for name, blk in (("mlp_encoder", mlp_enc), ("mlp_decoder", mlp_dec)):
        for attr in ("l1", "l2", "lmu", "lstd"):
            entries[f"{name}/{attr}"] = getattr(blk, attr)
    return entries


def test_model06_roundtrip(tmp_path):
    from vae_mdl_tpu.models.zoo import MODEL06

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    # model06 = the model05 conv skeleton with gelu activations and a
    # 6-channel DL head (model06.py:102-167)
    enc = _Enc05(n_latent=20, act=tf.nn.gelu)
    dec = _Dec05(n_head=6, act=tf.nn.gelu)
    mlp_enc = _BasicBlock06(100, 20)
    mlp_dec = _BasicBlock06(100, 20)
    enc(tf.constant(x))
    dec(tf.constant(rng.standard_normal((2, 20)).astype(np.float32)))
    mlp_enc(tf.constant(rng.standard_normal((2, 20)).astype(np.float32)))
    mlp_dec(tf.constant(rng.standard_normal((2, 20)).astype(np.float32)))

    prefix = str(tmp_path / "best")
    _write_ref_ckpt(prefix, _entries06(enc, dec, mlp_enc, mlp_dec))

    model, params = _init_params(MODEL06, jnp.asarray(x))
    params = load_reference_weights(prefix, "model06", params)

    # second-stochastic-layer MLP agreement (model06's distinguishing part)
    z1 = rng.standard_normal((2, 20)).astype(np.float32)
    q2 = model.apply(params, jnp.asarray(z1),
                     method=lambda m, a: m.mlp_encoders[0](a))
    mu_tf, std_tf = mlp_enc(tf.constant(z1))
    np.testing.assert_allclose(np.asarray(q2.loc), mu_tf.numpy(),
                               rtol=1e-5, atol=1e-5)
    # reference applies softplus as the lstd activation then +1e-6
    # (model06.py:84-95) — our MLPBlock does the same via std_transform
    np.testing.assert_allclose(np.asarray(q2.scale),
                               std_tf.numpy() + 1e-6, rtol=1e-5, atol=1e-5)

    # conv encoder + DL decoder agreement
    q = model.apply(params, jnp.asarray(x),
                    method=lambda m, a: m.encoder(a))
    mu_e, logstd_e = enc(tf.constant(x))
    np.testing.assert_allclose(np.asarray(q.loc), mu_e.numpy(),
                               rtol=1e-4, atol=1e-4)
    obs = model.apply(params, jnp.asarray(z1),
                      method=lambda m, a: m.decoder(a))
    out_tf = dec(tf.constant(z1)).numpy()
    mu_ref, ls_ref = np.split(out_tf, 2, axis=-1)
    np.testing.assert_allclose(np.asarray(obs.loc), mu_ref,
                               rtol=1e-4, atol=1e-4)


def test_cli_eval_from_reference(tmp_path, monkeypatch, capsys):
    """The migration flow end to end: a reference save_weights checkpoint
    evaluated directly through ``cli.run eval --from-reference`` (no Orbax
    checkpoint involved)."""
    from vae_mdl_tpu.cli.run import main

    ref = _Ref01()
    ref(tf.constant(np.zeros((1, 28, 28, 1), np.float32)))
    prefix = str(tmp_path / "ref" / "best")
    blk = ref.encoder.encode_x_to_z
    seq = ref.decoder.decode_z_to_x.layers
    _write_ref_ckpt(prefix, {
        "encoder/encode_x_to_z/l1": blk.l1,
        "encoder/encode_x_to_z/l2": blk.l2,
        "encoder/encode_x_to_z/lmu": blk.lmu,
        "encoder/encode_x_to_z/lstd": blk.lstd,
        "decoder/decode_z_to_x/layer_with_weights-0": seq[0],
        "decoder/decode_z_to_x/layer_with_weights-1": seq[1],
        "decoder/decode_z_to_x/layer_with_weights-2": seq[2],
    })

    monkeypatch.chdir(tmp_path)
    main([
        "eval", "model01",
        "--from-reference", prefix,
        "--dataset", "synthetic:mnist",
        "--batch-size", "8", "--n-samples", "4",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "tb"),
        "--mesh", "none",
    ])
    out = capsys.readouterr().out
    assert "imported reference weights" in out
    assert "test LLH" in out and "WARNING" not in out


def test_cli_convert_then_eval_without_tf(tmp_path, monkeypatch, capsys):
    """``convert`` writes a native Orbax checkpoint from the reference file;
    the subsequent eval restores it through the normal (TF-free) path."""
    from vae_mdl_tpu.cli.run import main

    ref = _Ref01()
    ref(tf.constant(np.zeros((1, 28, 28, 1), np.float32)))
    prefix = str(tmp_path / "ref" / "best")
    blk = ref.encoder.encode_x_to_z
    seq = ref.decoder.decode_z_to_x.layers
    _write_ref_ckpt(prefix, {
        "encoder/encode_x_to_z/l1": blk.l1,
        "encoder/encode_x_to_z/l2": blk.l2,
        "encoder/encode_x_to_z/lmu": blk.lmu,
        "encoder/encode_x_to_z/lstd": blk.lstd,
        "decoder/decode_z_to_x/layer_with_weights-0": seq[0],
        "decoder/decode_z_to_x/layer_with_weights-1": seq[1],
        "decoder/decode_z_to_x/layer_with_weights-2": seq[2],
    })

    monkeypatch.chdir(tmp_path)
    common = [
        "--dataset", "synthetic:mnist", "--batch-size", "8",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "tb"), "--mesh", "none",
    ]
    main(["convert", "model01", "--from-reference", prefix, "--tag", "best"]
         + common)
    out = capsys.readouterr().out
    assert "imported reference weights" in out and "saved Orbax" in out

    main(["eval", "model01", "--n-samples", "4"] + common)
    out = capsys.readouterr().out
    assert "loaded 'best'" in out and "test LLH" in out


@pytest.mark.parametrize("name,shape", [
    ("model05", (2, 32, 32, 3)),   # deconv transform both ways
    ("model06", (2, 32, 32, 3)),   # + second-layer MLP blocks
    ("model04", (2, 32, 32, 3)),   # + nested GLU graphs
    ("model01", (2, 28, 28, 1)),
])
def test_save_then_load_roundtrips(tmp_path, name, shape):
    """save_reference_weights -> load_reference_weights is the identity:
    pins the writer to the import's key layout and the deconv transform's
    involution property, for every supported family."""
    from vae_mdl_tpu.models.zoo import MODELS
    from vae_mdl_tpu.utils.import_reference import save_reference_weights

    model, params = _init_params(MODELS[name], jnp.zeros(shape, jnp.float32))
    prefix = str(tmp_path / "roundtrip")
    save_reference_weights(prefix, name, params)

    # load into a DIFFERENTLY-initialised template: only a correct
    # key-for-key read can reproduce the original tree
    other = build_model(MODELS[name]).init(
        {"params": jax.random.PRNGKey(7), "sample": jax.random.PRNGKey(8)},
        jnp.zeros(shape, jnp.float32), 1)
    got = load_reference_weights(prefix, name, other)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        got, params)


def test_unsupported_families_raise(tmp_path):
    model, params = _init_params(MODEL01, jnp.zeros((1, 28, 28, 1)))
    with pytest.raises(NotImplementedError, match="ladder"):
        load_reference_weights(str(tmp_path / "x"), "ladder_svhn", params)
