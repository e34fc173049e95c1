"""Receptive-field verification for the NN building blocks.

The reference checks its modules' receptive fields QUALITATIVELY: each
``modules/*.py`` ``__main__`` plots the input-gradient of one output pixel
for a human to eyeball (/root/reference/modules/enc.py:99-107,
dec.py:111-119, residual.py:86-94, glu.py:71-79). These tests make the same
check quantitative: the support of d(output pixel)/d(input) must equal the
block's analytic receptive field — catching wrong padding, wrong stride, or
an accidentally-touching-everything wiring (e.g. a stray normalisation)
that shape tests cannot see.

Geometry (SAME padding, 3x3 convs add 1 pixel of reach per side):

- ResidualBlock (1x1,3x3,3x3,1x1)        -> 5x5
- GLU (3x3, 3x3)                         -> 5x5
- EncoderBlock (N blocks, then rxr avg-pool stride r): output pixel o
  covers pre-pool columns [r*o, r*o + r - 1], each reaching 2N further
  per side -> rows r*o - 2N .. r*o + r - 1 + 2N.
- rezero blocks are the IDENTITY at init (gate = 0), so their receptive
  field collapses to the single centre pixel — the VDVAE trick the
  reference implements at modules/residual.py:22-36.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.nn.blocks import (
    GLU,
    DecoderBlock,
    EncoderBlock,
    ResidualBlock,
)

H = W = 16


def _grad_support(module, x, pick):
    """Boolean [H, W] support of d(pick(output))/d(input)."""
    params = module.init(jax.random.PRNGKey(0), x)

    def scalar(xin):
        return pick(module.apply(params, xin)).sum()

    g = np.asarray(jax.grad(scalar)(x))
    return np.any(np.abs(g) > 0, axis=(0, 3))


def _box(r0, r1, c0, c1):
    m = np.zeros((H, W), bool)
    m[r0:r1, c0:c1] = True
    return m


def _center_pick(row, col):
    return lambda y: y[:, row, col, :]


def test_residual_block_rf_is_5x5():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 8))
    support = _grad_support(
        ResidualBlock(hidden_width=16, out_width=8), x, _center_pick(8, 8)
    )
    np.testing.assert_array_equal(support, _box(6, 11, 6, 11))


def test_glu_rf_is_5x5():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, H, W, 8))
    support = _grad_support(GLU(features=32), x, _center_pick(8, 8))
    np.testing.assert_array_equal(support, _box(6, 11, 6, 11))


@pytest.mark.parametrize("n_blocks,rate", [(1, 2), (2, 2)])
def test_encoder_block_rf(n_blocks, rate):
    x = jax.random.normal(jax.random.PRNGKey(3), (1, H, W, 8))
    o = 3  # output pixel, away from borders
    support = _grad_support(
        EncoderBlock(hidden_width=16, out_width=8, n_blocks=n_blocks,
                     downscale_rate=rate),
        x,
        _center_pick(o, o),
    )
    reach = 2 * n_blocks
    lo, hi = rate * o - reach, rate * o + rate - 1 + reach + 1
    np.testing.assert_array_equal(support, _box(lo, hi, lo, hi))


def test_decoder_block_rf_within_bilinear_bound():
    """Upsample-then-conv: support must stay inside the analytic bound
    (bilinear output u samples source (u+0.5)/r - 0.5, floor and ceil) and
    must include the centre source pixel."""
    r, n_blocks = 2, 1
    x = jax.random.normal(jax.random.PRNGKey(4), (1, H, W, 8))
    u = 16  # output pixel in the 32x32 upsampled map
    support = _grad_support(
        DecoderBlock(hidden_width=16, out_width=8, n_blocks=n_blocks,
                     upscale_rate=r),
        x,
        _center_pick(u, u),
    )
    reach = 2 * n_blocks
    lo = int(np.floor((u - reach + 0.5) / r - 0.5))
    hi = int(np.ceil((u + reach + 0.5) / r - 0.5)) + 1
    bound = _box(lo, hi, lo, hi)
    assert not np.any(support & ~bound), "gradient leaks outside the RF bound"
    assert support[u // r, u // r], "centre source pixel not reached"


def test_rezero_block_is_identity_at_init():
    """gate = 0 at init -> the block IS the identity and its receptive
    field is the single centre pixel (modules/residual.py:22-36)."""
    x = jax.random.normal(jax.random.PRNGKey(5), (1, H, W, 8))
    block = ResidualBlock(hidden_width=16, out_width=8, rezero=True)
    params = block.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(np.asarray(block.apply(params, x)),
                                  np.asarray(x))
    support = _grad_support(block, x, _center_pick(8, 8))
    expected = np.zeros((H, W), bool)
    expected[8, 8] = True
    np.testing.assert_array_equal(support, expected)
