"""On-device preprocessing: the host ships uint8, the chip does the math.

The reference dequantises and binarises inside the tf.data pipeline on the
CPU (/root/reference/utils/data.py:15-16, models/model01.py:29-33) and ships
float32 over PCIe — 4x the bytes. Here batches cross to the device as uint8
and these jitted-side functions run as part of the train step, fused by XLA
into the first conv/matmul's input processing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dequantize(x_uint8: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [0,1] (parity: utils/data.py:15-16)."""
    return x_uint8.astype(jnp.float32) / 255.0


def binarize(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Dynamic binarisation: Bernoulli draw per pixel.

    The reference binarises in the data pipeline with a fixed seed=42
    (models/model01.py:31-33 -> utils/utils.py:14-17) and preserves a whole
    debugging saga about TF RNG statefulness (tests/dataloader_issue.py).
    With an explicit key threaded from the train step the draw is fresh per
    step and exactly reproducible — true dynamic binarisation, determinism
    structural. (Decision documented per SURVEY.md §7 'hard parts'.)
    """
    return jax.random.bernoulli(key, probs).astype(jnp.float32)


def random_flip(key: jax.Array, x: jax.Array) -> jax.Array:
    """Batched random horizontal flip (celeba pipeline parity,
    utils/data.py:88)."""
    flip = jax.random.bernoulli(key, 0.5, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(flip, jnp.flip(x, axis=-2), x)
