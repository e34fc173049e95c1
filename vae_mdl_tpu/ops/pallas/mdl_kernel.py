"""Fused Pallas kernel: mixture-of-discretized-logistics log-prob.

The hottest op of the MoDL models (model05; SURVEY.md §2.2 item 2; jnp source
of truth: distributions.mixture.mixture_log_prob, numerics parity
/root/reference/utils/mdl.py:56-92,165-207).

Layout: pixels ride the LANE axis (128-wide VPU), mixture components the
sublane axis — one [3*n_mix, block] tile holds every sub-pixel/mixture
parameter for a block of pixels, and the whole chain

    channel-autoregressed locs -> 3x discretized-logistic cascades ->
    sub-pixel sum -> +log-softmax(mixture logits) -> logsumexp over mixtures

runs in VMEM with no [.., 3, n_mix] intermediates ever hitting HBM.

The cheap per-parameter transforms (logscale clamp, tanh coeffs, the
[0,1]->[-1,1] rescale) and the transpose into kernel layout stay in jnp —
XLA fuses them into the producing conv's epilogue.

Backward: ``jax.vjp`` of the jnp reference.

MEASURED (TPU v5e, 2026-08): XLA's own fusion of the jnp implementation beats
this kernel both in training (17.6k vs 10.2k imgs/s on model05) and in the
forward-only 5000-IS eval (25.9 vs 11.5 imgs/s) — the transposes into the
[params, pixels] kernel layout cost more HBM traffic than the fusion saves.
This is the outcome SURVEY.md §7 step 8 anticipated; the kernel therefore
stays opt-in (``use_pallas``), correct (oracle-tested) and available as the
substrate for a future layout-free variant.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_mdl_tpu.distributions.mixture import mixture_log_prob, split_mixture_params

_BLOCK_PIXELS = 1024
_INTERVAL_WIDTH = 2.0 / 255.0
_LOW, _HIGH = -1.0, 1.0


def _dl(x, loc, logscale):
    """Elementwise discretized-logistic cascade (interval 2/255 on [-1,1]);
    same numerics as distributions.discretized.discretized_logistic_log_prob."""
    dx = _INTERVAL_WIDTH / 2.0
    centered = x - loc
    inv_std = jnp.exp(-logscale)
    start = (centered - dx) * inv_std
    stop = (centered + dx) * inv_std

    prob = jnp.maximum(jax.nn.sigmoid(stop) - jax.nn.sigmoid(start), 1e-12)
    left_edge = stop - jax.nn.softplus(stop)
    right_edge = -jax.nn.softplus(start)
    a = centered * inv_std
    approx = -a - logscale - 2.0 * jax.nn.softplus(-a) + jnp.log(
        jnp.float32(_INTERVAL_WIDTH)
    )
    lp = jnp.where(prob > 1e-5, jnp.log(prob), approx)
    lp = jnp.where(x <= _LOW, left_edge, lp)
    lp = jnp.where(x >= _HIGH, right_edge, lp)
    return lp


def _kernel(x_ref, loc_ref, ls_ref, coef_ref, logits_ref, out_ref, *, n_mix):
    n = n_mix
    x = x_ref[:]            # [3, BP]
    loc = loc_ref[:]        # [3n, BP] rows: [r mixes | g mixes | b mixes]
    ls = ls_ref[:]          # [3n, BP]
    coef = coef_ref[:]      # [3n, BP]
    logits = logits_ref[:]  # [n, BP]

    xr, xg, xb = x[0:1], x[1:2], x[2:3]  # [1, BP] each

    # PixelCNN++ channel autoregression on the observed sub-pixels
    # (/root/reference/utils/mdl.py:137-149)
    loc_r = loc[0:n]
    loc_g = loc[n:2 * n] + coef[0:n] * xr
    loc_b = loc[2 * n:3 * n] + coef[n:2 * n] * xr + coef[2 * n:3 * n] * xg

    lp = (
        _dl(xr, loc_r, ls[0:n])
        + _dl(xg, loc_g, ls[n:2 * n])
        + _dl(xb, loc_b, ls[2 * n:3 * n])
    )  # [n, BP]

    log_softmax = logits - jax.scipy.special.logsumexp(logits, axis=0,
                                                       keepdims=True)
    w = lp + log_softmax
    out_ref[:] = jax.scipy.special.logsumexp(w, axis=0, keepdims=True)  # [1, BP]


def _to_kernel_layout(x01, parameters):
    """(x01 [.., H, W, 3], params [.., H, W, 10n]) -> transposed per-pixel
    operands with pixels padded to a lane multiple."""
    # broadcast the leading dims (x carries no importance-sample axis; the
    # parameters do — cf. the reshape-vs-repeat pitfall the reference
    # documents at utils/mdl_openai_iwae.py:37-67, solved here by plain
    # broadcasting)
    lead = jnp.broadcast_shapes(x01.shape[:-1], parameters.shape[:-1])
    x01 = jnp.broadcast_to(x01, lead + x01.shape[-1:])
    parameters = jnp.broadcast_to(parameters, lead + parameters.shape[-1:])

    loc, logscale, coeffs, mix_logits = split_mixture_params(
        parameters.astype(jnp.float32)
    )
    x = x01.astype(jnp.float32) * 2.0 - 1.0

    n_mix = mix_logits.shape[-1]
    p = 1
    for s in lead:
        p *= s
    pp = -(-p // _BLOCK_PIXELS) * _BLOCK_PIXELS

    def t(a, rows):  # [.., rows_grouped] -> [rows, P_padded]
        flat = a.reshape(p, rows).T
        return jnp.zeros((rows, pp), jnp.float32).at[:, :p].set(flat)

    # loc/logscale/coeffs are [.., 3, n_mix]: subpixel-major rows
    xt = t(x, 3)
    loct = t(loc, 3 * n_mix)
    lst = t(logscale, 3 * n_mix)
    coeft = t(coeffs, 3 * n_mix)
    logitst = t(mix_logits, n_mix)
    return xt, loct, lst, coeft, logitst, n_mix, p, pp, lead


@jax.custom_vjp
def mdl_log_prob(x01: jax.Array, parameters: jax.Array) -> jax.Array:
    """Per-pixel MoDL log-prob, [.., H, W, 1] — drop-in for
    distributions.mixture.mixture_log_prob."""
    return _forward(x01, parameters)


def _forward(x01, parameters, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xt, loct, lst, coeft, logitst, n_mix, p, pp, lead = _to_kernel_layout(
        x01, parameters
    )
    grid = (pp // _BLOCK_PIXELS,)

    def spec(rows):
        return pl.BlockSpec((rows, _BLOCK_PIXELS), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, n_mix=n_mix),
        out_shape=jax.ShapeDtypeStruct((1, pp), jnp.float32),
        grid=grid,
        in_specs=[spec(3), spec(3 * n_mix), spec(3 * n_mix), spec(3 * n_mix),
                  spec(n_mix)],
        out_specs=spec(1),
        interpret=interpret,
    )(xt, loct, lst, coeft, logitst)
    return out[0, :p].reshape(lead + (1,))


def _fwd(x01, parameters):
    return _forward(x01, parameters), (x01, parameters)


def _bwd(res, g):
    x01, parameters = res
    _, vjp = jax.vjp(mixture_log_prob, x01, parameters)
    return vjp(g)


mdl_log_prob.defvjp(_fwd, _bwd)
