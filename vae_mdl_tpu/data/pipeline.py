"""Host-side data pipeline: numpy uint8 batches + async device staging.

API parity: ``setup_data(dataset, data_dir, batch_size=128, val_batch_size=500)``
-> (train_iter, val_iter, test set), mirroring
/root/reference/utils/data.py:19-46, including the split policy:

    svhn_cropped : train(+extra) | test[0:50%] | test[50%:100%]
    cifar10      : train         | test[0:50%] | test[50%:100%]
    mnist        : train         | test        | test
    celeba       : train         | validation  | validation

Differences, by design (TPU-first):
- batches are uint8; dequantisation/binarisation run on device
  (see data.preprocess) — 4x less host->device traffic;
- the train stream is an infinite shuffled epoch permutation with an explicit
  numpy Generator (no stateful-RNG-in-pipeline bug class,
  cf. /root/reference/tests/dataloader_issue.py);
- ``shard`` support: each process takes a disjoint slice of every split,
  which is the multi-host feeding hook (SURVEY.md §2.3).
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from vae_mdl_tpu.data.sources import Arrays, load_dataset


@dataclasses.dataclass
class DataSplits:
    train: Arrays
    val: Arrays
    test: Arrays

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        return self.train[0].shape[1:]


def make_splits(
    dataset: str,
    data_dir: Optional[str] = None,
    allow_synthetic_fallback: bool = True,
) -> DataSplits:
    raw = load_dataset(dataset, data_dir, allow_synthetic_fallback)
    base = dataset.split(":", 1)[-1] if dataset.startswith("synthetic:") else dataset

    if base == "svhn_cropped" and "extra" in raw:
        xtr = np.concatenate([raw["train"][0], raw["extra"][0]])
        ytr = np.concatenate([raw["train"][1], raw["extra"][1]])
        train: Arrays = (xtr, ytr)
    else:
        train = raw["train"]

    if base in ("svhn_cropped", "cifar10"):
        x, y = raw["test"]
        half = len(x) // 2
        val, test = (x[:half], y[:half]), (x[half:], y[half:])
    elif base == "celeba":
        # real shards have a "validation" split; the synthetic fallback
        # provides only "test"
        val = test = raw.get("validation", raw.get("test"))
    elif "val" in raw:  # digits: honest disjoint val/test slices
        val, test = raw["val"], raw["test"]
    else:  # mnist, synthetic: val == test (model01.py uses the 10k test set)
        val = test = raw["test"]
    return DataSplits(train=train, val=val, test=test)


def shard_arrays(arrays: Arrays, process_index: int, process_count: int) -> Arrays:
    if process_count == 1:
        return arrays
    x, y = arrays
    return x[process_index::process_count], y[process_index::process_count]


def epoch_batches(
    arrays: Arrays, batch_size: int, seed: int, shuffle: bool = True,
    start_step: int = 0,
) -> Iterator[np.ndarray]:
    """Infinite stream of image batches; fresh permutation per epoch,
    remainder dropped (static shapes for XLA).

    ``start_step`` seeks the stream: the first yielded batch is the one an
    identically-seeded stream would yield after ``start_step`` ``next()``
    calls. This makes resume DATA-deterministic — a preempted run that
    restarts at step S consumes the exact batch sequence an uninterrupted
    run would have (the rest of the training path is already
    resume-deterministic via step-derived rngs, train/state.py). Seeking
    replays only the per-epoch permutation draws, never the data — O(one
    permutation per elapsed epoch), bit-identical to plain iteration.
    """
    x, _ = arrays
    n = len(x)
    if batch_size > n:
        raise ValueError(
            f"batch_size {batch_size} exceeds the split size {n} — the "
            "remainder-dropping epoch stream would never yield"
        )
    rng = np.random.default_rng(seed)
    batches_per_epoch = (n - batch_size) // batch_size + 1
    epochs_done, offset = divmod(start_step, batches_per_epoch)
    if shuffle:
        for _ in range(epochs_done):  # advance the rng exactly as iteration
            rng.permutation(n)
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(offset * batch_size, n - batch_size + 1,
                           batch_size):
            yield x[order[start:start + batch_size]]
        offset = 0


def device_prefetch(it: Iterator[np.ndarray], size: int = 2, put=None) -> Iterator:
    """Stage upcoming batches onto the device from a background thread,
    overlapping host IO with device compute (the tf.data ``prefetch(4)``
    equivalent, utils/data.py:37, without the TF runtime). ``put`` customises
    placement (e.g. a sharded device_put for a mesh)."""
    import jax

    put = put or jax.device_put
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = object()

    def producer():
        try:
            for batch in it:
                q.put(put(batch))
            q.put(stop)
        except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
            # surface producer failures (disk error, bad record, sharded
            # device_put error) in the consuming thread instead of
            # masquerading as a clean end-of-stream
            q.put(e)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def setup_data(
    dataset: str = "svhn_cropped",
    data_dir: Optional[str] = None,
    batch_size: int = 128,
    val_batch_size: int = 500,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
    allow_synthetic_fallback: bool = True,
    batch_multiple: int = 1,
):
    """(train_iter, val_iter, test arrays) — reference API shape
    (utils/data.py:19-46); iterators yield uint8 numpy image batches.
    ``batch_multiple``: keep (clamped) batch sizes divisible by the mesh's
    data axis so sharded device_put never sees a ragged batch."""
    splits = make_splits(dataset, data_dir, allow_synthetic_fallback)
    return iterators_from_splits(
        splits, batch_size, val_batch_size, seed,
        process_index, process_count, batch_multiple,
    )


def iterators_from_splits(
    splits: DataSplits,
    batch_size: int = 128,
    val_batch_size: int = 500,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
    batch_multiple: int = 1,
    start_step: int = 0,
):
    """Build (train_iter, val_iter, test arrays) from already-loaded splits
    (lets callers that also need the raw arrays — e.g. the device-resident
    dataset path — load the data exactly once). ``start_step`` seeks the
    train stream for data-deterministic resume (``epoch_batches``)."""
    train = shard_arrays(splits.train, process_index, process_count)
    val = shard_arrays(splits.val, process_index, process_count)

    # reference val batching: mnist uses the whole val set as ONE batch
    # (models/model01.py:55-63); others use val_batch_size=500
    vbs = min(val_batch_size, len(val[0]))
    vbs = max(batch_multiple, vbs // batch_multiple * batch_multiple)

    train_iter = epoch_batches(train, batch_size, seed, shuffle=True,
                               start_step=start_step)
    val_iter = epoch_batches(val, vbs, seed + 1, shuffle=False)
    return train_iter, val_iter, splits.test
