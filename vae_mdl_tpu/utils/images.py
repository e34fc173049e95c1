"""Image-grid utilities (reporting parity: inputs/reconstructions/samples
grids, /root/reference/utils/utils.py:74-80 and models/model01.py:228-261)."""
from __future__ import annotations

import numpy as np


def fill_canvas(images, n: int = 8) -> np.ndarray:
    """Assemble the first n*n images [N,H,W,C] into one [n*H, n*W, C] canvas.

    Parity: /root/reference/utils/utils.py:74-80.
    """
    images = np.asarray(images)
    _, h, w, c = images.shape
    canvas = np.zeros((n * h, n * w, c), dtype=images.dtype)
    for i in range(n):
        for j in range(n):
            idx = i * n + j
            if idx >= len(images):
                break
            canvas[i * h:(i + 1) * h, j * w:(j + 1) * w] = images[idx]
    return canvas


def to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    # round, don't truncate: floor would render 0.9999 as 254 and bias every
    # grid dark by up to 1 LSB — and disagree with the sampler's own
    # quantisation (models/inference.py: img*255 + 0.5)
    return np.round(np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def save_png(img: np.ndarray, path: str) -> None:
    """Write an image (float [0,1] or uint8) to PNG; squeezes mono channels."""
    from PIL import Image

    arr = to_uint8(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
