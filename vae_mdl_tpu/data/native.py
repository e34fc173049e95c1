"""ctypes bindings for the native data-loader core (io_native.cc).

Compiles the C++ on first use (g++ available in the image; result cached
next to the source), falls back silently to the pure-Python implementations
when a compiler is unavailable. The Python parser in data/tfrecord.py is the
oracle — tests/test_native.py asserts bit-identical outputs.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_DIR, "io_native.cc")
_SO = os.path.join(_DIR, "io_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # no compiler / failure: fall back to Python
        print(f"[vae_mdl_tpu.data.native] build failed ({e}); using the "
              "pure-Python parser", file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        lib.parse_celeba_tfrecord.restype = ctypes.c_long
        lib.parse_celeba_tfrecord.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_long,
            ctypes.c_long,
        ]
        lib.count_tfrecords.restype = ctypes.c_long
        lib.count_tfrecords.argtypes = [ctypes.c_char_p]
        _lib = lib
        return _lib


def count_records(path: str) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    n = lib.count_tfrecords(path.encode())
    return None if n < 0 else int(n)


def parse_celeba_file(
    path: str, max_side: int = 256
) -> Optional[List[Tuple[np.ndarray, int]]]:
    """Parse one Glow-CelebA TFRecord shard natively.

    Returns [(uint8 image [H,W,C], label)] or None when the native path is
    unavailable (caller falls back to data.tfrecord). The per-record buffer
    starts at ``max_side``² (Glow shards are 256x256) and doubles on the
    C core's too-small error instead of preallocating worst-case.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = lib.count_tfrecords(path.encode())
    if n <= 0:
        return None if n < 0 else []

    got = -5
    while got == -5 and max_side <= 4096:  # -5: record larger than buffer
        img_bytes = max_side * max_side * 3
        imgs = np.empty((n, img_bytes), dtype=np.uint8)
        shapes = np.empty((n, 3), dtype=np.int64)
        labels = np.empty((n,), dtype=np.int64)
        got = lib.parse_celeba_tfrecord(
            path.encode(),
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            img_bytes,
        )
        if got == -5:
            max_side *= 2
    if got < 0:
        return None
    out = []
    for i in range(got):
        h, w, c = (int(v) for v in shapes[i])
        out.append((imgs[i, : h * w * c].reshape(h, w, c).copy(), int(labels[i])))
    return out
