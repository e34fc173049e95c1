"""Native (C++) data-loader core vs the pure-Python parser (the oracle)."""
import struct

import numpy as np
import pytest

from tests.test_data import _make_example
from vae_mdl_tpu.data import native


def _write_shard(path, examples):
    with open(path, "wb") as f:
        for record in examples:
            f.write(struct.pack("<Q", len(record)))
            f.write(b"\x00" * 4)
            f.write(record)
            f.write(b"\x00" * 4)


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_count_records(lib, tmp_path):
    rng = np.random.default_rng(0)
    examples = [
        _make_example([4, 4, 3], rng.integers(0, 256, 48, dtype=np.uint8).tobytes(), i)
        for i in range(5)
    ]
    path = str(tmp_path / "shard.tfrecords")
    _write_shard(path, examples)
    assert native.count_records(path) == 5


def test_native_matches_python_parser(lib, tmp_path):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (6, 5, 3), dtype=np.uint8) for _ in range(7)]
    examples = [
        _make_example(list(img.shape), img.tobytes(), 100 + i)
        for i, img in enumerate(imgs)
    ]
    path = str(tmp_path / "shard.tfrecords")
    _write_shard(path, examples)

    got = native.parse_celeba_file(path)
    assert got is not None and len(got) == 7
    for i, (img, label) in enumerate(got):
        assert label == 100 + i
        np.testing.assert_array_equal(img, imgs[i])

    # cross-check against the Python oracle
    from vae_mdl_tpu.data.tfrecord import parse_example, read_records

    for (img, label), record in zip(got, read_records(path)):
        ex = parse_example(record)
        ref = np.frombuffer(ex["data"][0], np.uint8).reshape(
            [int(v) for v in ex["shape"]]
        )
        np.testing.assert_array_equal(img, ref)
        assert label == int(ex["label"][0])


def test_native_handles_missing_file(lib):
    assert native.count_records("/nonexistent/file") is None
    assert native.parse_celeba_file("/nonexistent/file") is None
