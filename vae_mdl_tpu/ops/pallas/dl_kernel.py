"""Fused Pallas kernel: discretized-logistic log-prob.

The hottest elementwise cascade in the framework
(SURVEY.md §2.2 item 1; jnp source of truth:
distributions.discretized.discretized_logistic_log_prob, numerics parity
/root/reference/utils/discretized_logistic.py:35-78). One VMEM-resident tile
computes the CDF-difference, both edge cases, and the PDF-approximation
switch in a single pass — no intermediate HBM traffic.

Layout: inputs are broadcast, flattened and padded to (rows, 128) f32 tiles;
the grid walks row-blocks. All math f32 (likelihoods never run bf16).

Gradients: the forward runs the kernel; the backward re-derives from the jnp
reference via ``jax.vjp`` (elementwise, XLA-fused — the kernel win is in the
forward eval path, e.g. the 5000-IS harness where no grads are needed).

Enable via ``use_pallas=True`` on the distribution or call directly; the jnp
implementation stays both the fallback (interpret mode on CPU) and the test
oracle (tests/test_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_mdl_tpu.distributions.discretized import discretized_logistic_log_prob

_LANES = 128
_BLOCK_ROWS = 256  # 256x128 f32 = 128 KiB per operand; 4 operands ~0.5 MiB VMEM


def _kernel(x_ref, loc_ref, logscale_ref, out_ref, *, low, high, interval_width):
    # the kernel body IS the shared jnp source of truth, traced into the
    # Mosaic program — one cascade definition serves the distribution, the
    # mixture variants and both kernels (pure elementwise jnp, so it lowers
    # unchanged)
    out_ref[:] = discretized_logistic_log_prob(
        x_ref[:], loc_ref[:], logscale_ref[:],
        low=low, high=high, interval_width=interval_width,
    )


def _pad_2d(flat: jax.Array, rows_mult: int):
    n = flat.shape[0]
    rows = -(-n // _LANES)
    rows_padded = -(-rows // rows_mult) * rows_mult
    padded = jnp.zeros((rows_padded * _LANES,), flat.dtype).at[:n].set(flat)
    return padded.reshape(rows_padded, _LANES), rows_padded


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dl_log_prob(x, loc, logscale, low=-1.0, high=1.0, interval_width=2.0 / 255.0):
    """Pallas-fused elementwise discretized-logistic log P(bin(x))."""
    return _forward(x, loc, logscale, low, high, interval_width)


def _forward(x, loc, logscale, low, high, interval_width, interpret=None):
    if interpret is None:
        # CPU has no Mosaic backend: fall back to the interpreter so the
        # same code path runs in tests and on TPU
        interpret = jax.default_backend() != "tpu"
    shape = jnp.broadcast_shapes(x.shape, loc.shape, logscale.shape)
    x = jnp.broadcast_to(x, shape).astype(jnp.float32)
    loc = jnp.broadcast_to(loc, shape).astype(jnp.float32)
    logscale = jnp.broadcast_to(logscale, shape).astype(jnp.float32)

    n = x.size
    x2, rows = _pad_2d(x.reshape(-1), _BLOCK_ROWS)
    loc2, _ = _pad_2d(loc.reshape(-1), _BLOCK_ROWS)
    ls2, _ = _pad_2d(logscale.reshape(-1), _BLOCK_ROWS)

    grid = (rows // _BLOCK_ROWS,)
    spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, low=low, high=high,
                          interval_width=interval_width),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(x2, loc2, ls2)
    return out.reshape(-1)[:n].reshape(shape)


def _fwd(x, loc, logscale, low, high, interval_width):
    out = _forward(x, loc, logscale, low, high, interval_width)
    return out, (x, loc, logscale)


def _bwd(low, high, interval_width, res, g):
    x, loc, logscale = res
    _, vjp = jax.vjp(
        lambda xx, ll, ss: discretized_logistic_log_prob(
            xx, ll, ss, low=low, high=high, interval_width=interval_width
        ),
        x, loc, logscale,
    )
    return vjp(g)


dl_log_prob.defvjp(_fwd, _bwd)
