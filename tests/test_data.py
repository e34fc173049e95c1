"""Data layer tests: splits, batching, sharding, TFRecord parsing,
on-device preprocessing."""
import io
import pytest
import struct

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.data.pipeline import (
    epoch_batches,
    make_splits,
    setup_data,
    shard_arrays,
)
from vae_mdl_tpu.data.preprocess import binarize, dequantize, random_flip
from vae_mdl_tpu.data.sources import load_synthetic
from vae_mdl_tpu.data.tfrecord import parse_example, read_records


def test_synthetic_splits_and_setup():
    train_iter, val_iter, test = setup_data(
        "synthetic:mnist", batch_size=8, val_batch_size=16
    )
    b = next(train_iter)
    assert b.shape == (8, 28, 28, 1) and b.dtype == np.uint8
    v = next(val_iter)
    assert v.shape == (16, 28, 28, 1)
    assert test[0].dtype == np.uint8


def test_epoch_batches_shuffles_per_epoch_deterministically():
    x = np.arange(32, dtype=np.uint8).reshape(32, 1, 1, 1)
    y = np.zeros(32, np.int32)
    a = list(next(epoch_batches((x, y), 32, seed=7)) for _ in range(1))
    b = list(next(epoch_batches((x, y), 32, seed=7)) for _ in range(1))
    assert np.array_equal(a[0], b[0])  # same seed -> same order
    assert not np.array_equal(a[0], x)  # shuffled


def test_epoch_batches_start_step_seeks_exactly():
    """A stream seeked to start_step yields exactly what an identically
    seeded stream yields after start_step next() calls — including across
    epoch boundaries (22 images / batch 4 -> 5 batches per epoch, seek 12
    lands mid-epoch-2)."""
    x = np.arange(22, dtype=np.uint8).reshape(22, 1, 1, 1)
    y = np.zeros(22, np.int32)
    ref = epoch_batches((x, y), 4, seed=3)
    for _ in range(12):
        next(ref)
    seeked = epoch_batches((x, y), 4, seed=3, start_step=12)
    for _ in range(9):  # crosses into epoch 3
        np.testing.assert_array_equal(next(ref), next(seeked))
    # unshuffled streams seek too
    ref = epoch_batches((x, y), 4, seed=0, shuffle=False)
    next(ref)
    np.testing.assert_array_equal(
        next(epoch_batches((x, y), 4, seed=0, shuffle=False, start_step=1)),
        next(ref),
    )


def test_shard_arrays_disjoint_cover():
    x = np.arange(10, dtype=np.uint8).reshape(10, 1, 1, 1)
    y = np.arange(10, dtype=np.int32)
    parts = [shard_arrays((x, y), i, 4)[1] for i in range(4)]
    all_labels = np.sort(np.concatenate(parts))
    assert np.array_equal(all_labels, y)
    for i in range(4):
        for j in range(i + 1, 4):
            assert not set(parts[i]) & set(parts[j])


def test_svhn_split_policy_on_synthetic_fallback():
    """svhn: val = test[:50%], test = test[50%:] (utils/data.py:7-12)."""
    splits = make_splits("synthetic:svhn_cropped")
    assert splits.image_shape == (32, 32, 3)
    assert len(splits.val[0]) == len(splits.test[0])


def test_dequantize_and_binarize_on_device():
    x = jnp.asarray(np.array([[0, 128, 255]], np.uint8))
    d = dequantize(x)
    assert d.dtype == jnp.float32
    assert float(d[0, 2]) == 1.0
    probs = jnp.full((1000,), 0.75)
    b = binarize(jax.random.PRNGKey(0), probs)
    assert set(np.unique(np.asarray(b))) <= {0.0, 1.0}
    assert abs(float(b.mean()) - 0.75) < 0.06
    # deterministic per key
    b2 = binarize(jax.random.PRNGKey(0), probs)
    assert np.array_equal(np.asarray(b), np.asarray(b2))


def test_random_flip_statistics_and_content():
    """Each image is either identical or exactly mirrored; ~half flipped;
    deterministic per key (celeba parity, utils/data.py:88)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(512, 4, 6, 3)).astype(np.float32))
    out = random_flip(jax.random.PRNGKey(0), x)
    x_np, out_np = np.asarray(x), np.asarray(out)
    same = np.all(out_np == x_np, axis=(1, 2, 3))
    mirrored = np.all(out_np == x_np[:, :, ::-1, :], axis=(1, 2, 3))
    assert np.all(same | mirrored)
    frac = mirrored.mean()
    assert 0.35 < frac < 0.65
    out2 = random_flip(jax.random.PRNGKey(0), x)
    assert np.array_equal(out_np, np.asarray(out2))


def test_strict_data_refuses_synthetic_fallback(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        make_splits("mnist", str(tmp_path), allow_synthetic_fallback=False)


def _encode_varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _encode_varint((num << 3) | wire) + payload


def _bytes_field(num: int, data: bytes) -> bytes:
    return _field(num, 2, _encode_varint(len(data)) + data)


def _make_example(shape, data: bytes, label: int) -> bytes:
    """Hand-encode tf.train.Example{shape: int64list, data: bytes, label}."""
    def feature_entry(name: str, feature: bytes) -> bytes:
        entry = _bytes_field(1, name.encode()) + _bytes_field(2, feature)
        return _bytes_field(1, entry)

    int64_list = b"".join(_field(1, 0, _encode_varint(v)) for v in shape)
    shape_feat = _bytes_field(3, int64_list)
    data_feat = _bytes_field(1, _bytes_field(1, data))
    label_feat = _bytes_field(3, _field(1, 0, _encode_varint(label)))

    features = (
        feature_entry("shape", shape_feat)
        + feature_entry("data", data_feat)
        + feature_entry("label", label_feat)
    )
    return _bytes_field(1, features)


def test_tfrecord_reader_roundtrip(tmp_path):
    """Pure-python TFRecord + Example parsing against hand-encoded records
    (the Glow celeba format, /root/reference/utils/data.py:65-90)."""
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    record = _make_example([2, 3, 3], img.tobytes(), label=7)

    path = tmp_path / "test.tfrecords"
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(record)))
        f.write(b"\x00" * 4)  # length crc (unchecked)
        f.write(record)
        f.write(b"\x00" * 4)  # data crc

    records = list(read_records(str(path)))
    assert len(records) == 1
    ex = parse_example(records[0])
    assert list(ex["shape"]) == [2, 3, 3]
    assert int(ex["label"][0]) == 7
    decoded = np.frombuffer(ex["data"][0], np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decoded, img)


def test_tfrecord_crc_verification(tmp_path):
    """verify_crc really verifies: records written by TensorFlow itself
    (the CRC ground truth) pass, and a single flipped payload byte fails
    with a checksum error."""
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "crc.tfrecords")
    payloads = [b"hello tfrecord", b"x" * 100]
    with tf.io.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    assert list(read_records(path, verify_crc=True)) == payloads

    blob = bytearray(open(path, "rb").read())
    blob[14] ^= 0xFF  # a payload byte of the first record (12-byte header)
    bad = str(tmp_path / "bad.tfrecords")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        list(read_records(bad, verify_crc=True))
    # unverified reads still stream (trusted-file fast path)
    assert len(list(read_records(bad))) == 2


def test_example_unpacked_floats():
    """Protobuf parsers must accept UNPACKED repeated floats (each value a
    fixed32 field) as well as the packed encoding TF writes."""
    def _encode_varint(v):
        out = b""
        while True:
            bits = v & 0x7F
            v >>= 7
            out += bytes([bits | (0x80 if v else 0)])
            if not v:
                return out

    def _field(num, wire, payload):
        return _encode_varint((num << 3) | wire) + payload

    def _bytes_field(num, payload):
        return _field(num, 2, _encode_varint(len(payload)) + payload)

    floats = [1.5, -2.25, 3.0]
    unpacked = b"".join(_field(1, 5, struct.pack("<f", v)) for v in floats)
    float_list = _bytes_field(2, unpacked)  # Feature.float_list
    entry = _bytes_field(1, b"values") + _bytes_field(2, float_list)
    example = _bytes_field(1, _bytes_field(1, entry))
    ex = parse_example(example)
    np.testing.assert_allclose(ex["values"], np.asarray(floats, np.float32))


def test_resize_bilinear_matches_tf():
    """CelebA downsampling parity: _resize_bilinear == tf.image.resize's
    default (bilinear, half-pixel centers, /root/reference/utils/data.py:89)
    after uint8 rounding — integer and non-integer factors."""
    tf = pytest.importorskip("tensorflow")
    from vae_mdl_tpu.data.sources import _resize_bilinear

    rng = np.random.default_rng(0)
    for shape in ((256, 256, 3), (100, 80, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        want = np.round(
            tf.image.resize(tf.constant(img), [64, 64]).numpy()
        ).clip(0, 255).astype(np.uint8)
        np.testing.assert_array_equal(_resize_bilinear(img, 64), want)


def test_device_prefetch_propagates_producer_errors():
    """A failing source surfaces its real exception in the consumer
    instead of masquerading as a clean end-of-stream."""
    from vae_mdl_tpu.data.pipeline import device_prefetch

    def bad_source():
        yield np.zeros((2, 2), np.uint8)
        raise RuntimeError("disk on fire")

    stream = device_prefetch(bad_source(), size=2)
    next(stream)
    with pytest.raises(RuntimeError, match="disk on fire"):
        next(stream)


def test_synthetic_is_deterministic():
    a = load_synthetic((8, 8, 1), n_train=16, n_test=4, seed=3)
    b = load_synthetic((8, 8, 1), n_train=16, n_test=4, seed=3)
    assert np.array_equal(a["train"][0], b["train"][0])


def test_digits_has_disjoint_val_and_test():
    """Best-checkpoint selection must never see the final test images
    (VERDICT r2 weak #3): digits carries its own three-way split and
    make_splits routes it, unlike the mnist-family's val==test parity."""
    pytest.importorskip("sklearn")
    from vae_mdl_tpu.data.pipeline import make_splits
    from vae_mdl_tpu.data.sources import load_digits

    raw = load_digits()
    assert len(raw["train"][0]) + len(raw["val"][0]) + len(raw["test"][0]) == 1797
    splits = make_splits("digits")
    assert len(splits.val[0]) == 197 and len(splits.test[0]) == 200
    # disjoint: no val image appears in test (byte-identical compare)
    val_bytes = {im.tobytes() for im in splits.val[0]}
    assert not any(im.tobytes() in val_bytes for im in splits.test[0])
