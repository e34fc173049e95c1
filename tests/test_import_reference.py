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


class _Enc05(tf.keras.Model):  # models/model05.py:24-52
    def __init__(self, n_latent=20):
        super().__init__()
        self.convs = tf.keras.Sequential([
            layers.Conv2D(32, 3, strides=1, padding="same",
                          activation=tf.nn.relu),
            layers.Conv2D(64, 3, strides=2, padding="same",
                          activation=tf.nn.relu),
            layers.Conv2D(128, 3, strides=2, padding="same",
                          activation=tf.nn.relu),
            layers.Conv2D(256, 3, strides=2, padding="same",
                          activation=tf.nn.relu),
        ])
        self.fc = layers.Dense(2 * n_latent)

    def call(self, x):
        out = self.convs(x)
        out = tf.reshape(out, [out.shape[0], -1])
        mu, logstd = tf.split(self.fc(out), 2, axis=-1)
        return mu, logstd


class _Dec05(tf.keras.Model):  # models/model05.py:55-92
    def __init__(self, n_mix=5):
        super().__init__()
        self.fc = layers.Dense(4 * 4 * 128, activation=tf.nn.relu)
        self.deconvs = tf.keras.Sequential([
            layers.Conv2DTranspose(128, 4, strides=2, padding="same",
                                   activation=tf.nn.relu),
            layers.Conv2DTranspose(64, 4, strides=2, padding="same",
                                   activation=tf.nn.relu),
            layers.Conv2DTranspose(32, 4, strides=2, padding="same",
                                   activation=tf.nn.relu),
            layers.Conv2D(n_mix * 10, 3, padding="same", activation=None),
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
    roots = {"encoder": _Node(), "decoder": _Node()}
    for base, layer in entries.items():
        parts = base.split("/")
        obj = roots[parts[0]]
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


def test_model01_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 28, 28, 1)).astype(np.float32)

    ref = _Ref01()
    ref(tf.constant(x))  # build
    prefix = str(tmp_path / "best")
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


def test_model05_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    ref = _Ref05()
    ref(tf.constant(x))  # build
    prefix = str(tmp_path / "best")
    entries = {"encoder/fc": ref.encoder.fc, "decoder/fc": ref.decoder.fc}
    for i, layer in enumerate(ref.encoder.convs.layers):
        entries[f"encoder/convs/layer_with_weights-{i}"] = layer
    for i, layer in enumerate(ref.decoder.deconvs.layers):
        entries[f"decoder/deconvs/layer_with_weights-{i}"] = layer
    _write_ref_ckpt(prefix, entries)

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


def test_unsupported_families_raise(tmp_path):
    model, params = _init_params(MODEL01, jnp.zeros((1, 28, 28, 1)))
    with pytest.raises(NotImplementedError, match="model04"):
        load_reference_weights(str(tmp_path / "x"), "model04", params)
