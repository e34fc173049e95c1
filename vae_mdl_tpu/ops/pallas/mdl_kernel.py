"""Fused Pallas kernel: mixture-of-discretized-logistics log-prob.

The hottest op of the MoDL models (model05; SURVEY.md §2.2 item 2; jnp source
of truth: distributions.mixture.mixture_log_prob, numerics parity
/root/reference/utils/mdl.py:56-92,165-207).

LAYOUT-FREE design (round 2; replaces the round-1 kernel that pre-transposed
everything to a [params, pixels] layout on the host and lost to XLA fusion on
the transpose traffic):

- parameters stay in their native conv-output layout ``[..., H, W, 10n]``;
  the only host-side op is a *reshape* to ``[K, P, 10n]`` (no data movement),
  where K are leading importance-sample dims absent from x and P the pixels;
- the x broadcast over K is an index_map (grid ``(K, P/BP)``; the x block
  depends on the pixel index only) — never materialised;
- each kernel instance loads one ``[BP, 10n]`` tile, transposes it to
  ``[10n, BP]`` *in VMEM* (pixels ride the 128-wide lane axis, parameter
  channels the sublane axis), and runs the whole chain in one pass:

      raw-param transforms (logscale clamp, tanh coeffs, x [0,1]->[-1,1])
      -> channel-autoregressed locs -> 3x discretized-logistic cascades
      -> sub-pixel sum -> +log-softmax(mixture logits) -> logsumexp over mixes

  so no ``[.., 3, n_mix]`` intermediate ever touches HBM: traffic is one read
  of the parameter tensor + one ``[.., 1]`` write, vs the many passes XLA's
  fusion of the jnp chain makes over mixture-expanded temporaries.

Backward: a second fused kernel (same grid/layout) computes d(out)/d(params)
in one pass, recomputing the forward intermediates in VMEM — branch-for-branch
matching the gradients JAX derives from the jnp reference's ``where`` cascades
(gradient flows only through the selected branch; the ``max`` clamps mask
their gradients). The x cotangent goes through the jnp reference instead: x
is observed data in every training path, so that recompute is dead code XLA
eliminates; it only executes if someone differentiates w.r.t. the images.

MEASURED (TPU v5e, 2026-08):
- model05 5000-IS eval (batch 100, k_chunk 100): 59.1 imgs/s with bf16 conv
  body + this kernel vs 49.2 imgs/s bf16 + XLA-fused jnp chain vs 42.8
  imgs/s for the round-1 f32 jnp config;
- model05 train (batch 128, k=5, fwd + fused bwd kernel): 21.2k imgs/s f32 /
  22.3k bf16 vs 18.5k/19.6k for XLA's fusion of the jnp chain (+14%).
The kernels' single pass replaces XLA's multiple passes over the
mixture-expanded temporaries; the round-1 kernel (host-side transposes into
[params, pixels] layout) lost to XLA on exactly that transpose traffic.
Because the kernel wins both hot paths, it is the DEFAULT on TPU
(config.use_pallas=None -> auto, resolved in nn.decoders.make_observation).
Caveat: the parameter tensor must materialise as a kernel input, so
k_chunk*batch is HBM-capacity bound (k_chunk=100 at batch<=100 fits v5e-1's
16 GB).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_mdl_tpu.distributions.discretized import discretized_logistic_log_prob
from vae_mdl_tpu.distributions.mixture import mixture_log_prob

_BLOCK_PIXELS = 2048
_INTERVAL_WIDTH = 2.0 / 255.0
_LOW, _HIGH = -1.0, 1.0


def _dl(x, loc, logscale):
    """Elementwise discretized-logistic cascade (interval 2/255 on [-1,1]) —
    delegates to the shared jnp source of truth
    (distributions.discretized.discretized_logistic_log_prob), which traces
    into the Mosaic program unchanged: one cascade definition for the
    distribution, the mixtures and both kernels."""
    return discretized_logistic_log_prob(
        x, loc, logscale, low=_LOW, high=_HIGH,
        interval_width=_INTERVAL_WIDTH,
    )


def _dl_grads(t, loc, logscale):
    """d(_dl)/d(loc, logscale, t) — analytic, branch-for-branch equal to
    jax.grad of the jnp reference (discretized_logistic_log_prob):

    - main branch   lp = log(max(sig(stop)-sig(start), 1e-12)): the max clamp
      zeroes the gradient when the CDF difference is at the floor;
    - approx branch lp = -a - logscale - 2 softplus(-a) + log(width);
    - edge branches stop - softplus(stop) / -softplus(start); the edge
      *conditions* compare t only, so they select but never differentiate.
    """
    dx = _INTERVAL_WIDTH / 2.0
    inv_std = jnp.exp(-logscale)
    centered = t - loc
    start = (centered - dx) * inv_std
    stop = (centered + dx) * inv_std

    sg_stop = jax.nn.sigmoid(stop)
    sg_start = jax.nn.sigmoid(start)
    diff = sg_stop - sg_start
    prob = jnp.maximum(diff, 1e-12)
    live = diff > 1e-12
    ds = jnp.where(live, sg_stop * (1.0 - sg_stop) / prob, 0.0)
    da = jnp.where(live, sg_start * (1.0 - sg_start) / prob, 0.0)
    d_loc = inv_std * (da - ds)
    d_ls = da * start - ds * stop
    d_t = inv_std * (ds - da)

    a = centered * inv_std
    c_ap = 2.0 * jax.nn.sigmoid(-a) - 1.0
    use_log = prob > 1e-5
    d_loc = jnp.where(use_log, d_loc, -c_ap * inv_std)
    d_ls = jnp.where(use_log, d_ls, -c_ap * a - 1.0)
    d_t = jnp.where(use_log, d_t, c_ap * inv_std)

    left = t <= _LOW
    le = jax.nn.sigmoid(-stop)
    d_loc = jnp.where(left, -le * inv_std, d_loc)
    d_ls = jnp.where(left, -le * stop, d_ls)
    d_t = jnp.where(left, le * inv_std, d_t)

    right = t >= _HIGH
    ri = sg_start
    d_loc = jnp.where(right, ri * inv_std, d_loc)
    d_ls = jnp.where(right, ri * start, d_ls)
    d_t = jnp.where(right, -ri * inv_std, d_t)
    return d_loc, d_ls, d_t


def _fwd_math(pt, xt, n):
    """Forward mixture chain on already-oriented tiles: ``pt`` [10n, L]
    (parameter channels on sublanes, L pixels — or (k, b) pairs in the
    batch-lanes layout — on lanes), ``xt`` [3, L] in [-1, 1] -> [1, L].

    Channel layout of the tile (split_mixture_params parity,
    utils/mdl.py:94-112): ``[logits(0:n) | R: loc,ls,cf (n:4n) |
    G: loc,ls,cf (4n:7n) | B: loc,ls,cf (7n:10n)]`` — the R-group coeffs
    condition G on r, the G-group coeffs B on r, the B-group coeffs B on g
    (coeffs[...,0/1/2,:] in the jnp reference).
    """
    xr, xg, xb = xt[0:1], xt[1:2], xt[2:3]       # [1, L]

    logits = pt[0:n]
    loc_r, ls_r, cf_r = pt[n:2 * n], pt[2 * n:3 * n], pt[3 * n:4 * n]
    loc_g, ls_g, cf_g = pt[4 * n:5 * n], pt[5 * n:6 * n], pt[6 * n:7 * n]
    loc_b, ls_b, cf_b = pt[7 * n:8 * n], pt[8 * n:9 * n], pt[9 * n:10 * n]

    # raw-parameter transforms + channel autoregression on observed
    # sub-pixels (utils/mdl.py:94-149); the coeff tanh runs once on the
    # stacked [3n, L] block (2 full 8-sublane tiles instead of 3 padded
    # [n, L] ops at n=5)
    cf = jnp.tanh(jnp.concatenate([cf_r, cf_g, cf_b], axis=0))
    loc_g = loc_g + cf[0:n] * xr
    loc_b = loc_b + cf[n:2 * n] * xr + cf[2 * n:3 * n] * xg

    # ONE stacked discretized-logistic cascade over all (channel, mixture)
    # combos: [3n, L] keeps the VPU sublane tiles ~full (15/16 at n=5)
    # where three separate [n, L] passes pad each to 8 sublanes (15/24).
    # Bit-identical elementwise math to the unstacked form.
    x_all = jnp.concatenate([
        jnp.broadcast_to(xr, (n,) + xr.shape[1:]),
        jnp.broadcast_to(xg, (n,) + xg.shape[1:]),
        jnp.broadcast_to(xb, (n,) + xb.shape[1:]),
    ], axis=0)
    loc_all = jnp.concatenate([loc_r, loc_g, loc_b], axis=0)
    ls_all = jnp.maximum(
        jnp.concatenate([ls_r, ls_g, ls_b], axis=0), -7.0)
    lp_all = _dl(x_all, loc_all, ls_all)         # [3n, L]
    lp = lp_all[0:n] + lp_all[n:2 * n] + lp_all[2 * n:3 * n]  # [n, L]

    log_softmax = logits - jax.scipy.special.logsumexp(logits, axis=0,
                                                       keepdims=True)
    w = lp + log_softmax
    return jax.scipy.special.logsumexp(w, axis=0, keepdims=True)  # [1, L]


def _kernel(x_ref, p_ref, out_ref, *, n_mix):
    """One [BP, 10n] raw parameter tile + [BP, 3] observations -> [1, BP]."""
    pt = p_ref[0].astype(jnp.float32).T          # [10n, BP]
    xt = x_ref[:].astype(jnp.float32).T * 2.0 - 1.0  # [3, BP] in [-1, 1]
    lse = _fwd_math(pt, xt, n_mix)
    out_ref[:] = lse.reshape(out_ref.shape)  # out block [1, 1, 1, BP]


def _block_pixels(p: int) -> int:
    """Largest power-of-two block <= _BLOCK_PIXELS dividing the pixel count
    (32x32 and 28x28 images give p divisible by at least 16 whenever the
    batch is even; tiny/ragged cases fall back to small blocks)."""
    bp = _BLOCK_PIXELS
    while bp > 1 and p % bp:
        bp //= 2
    return bp


def _flatten_operands(x01, parameters):
    """-> (x_flat [P, 3], p_flat [K, P, 10n], lead shape). Pure reshapes for
    the common case (parameters carry extra LEADING importance-sample dims
    over x — the reshape-vs-repeat pitfall the reference documents at
    utils/mdl_openai_iwae.py:37-67, solved structurally); materialises the
    broadcast only for exotic shapes."""
    lead = jnp.broadcast_shapes(x01.shape[:-1], parameters.shape[:-1])
    xlead = x01.shape[:-1]
    if parameters.shape[:-1] == lead and xlead == lead[len(lead) - len(xlead):]:
        p = 1
        for s in xlead:
            p *= s
        k = 1
        for s in lead[: len(lead) - len(xlead)]:
            k *= s
    else:  # uncommon broadcast pattern: materialise
        x01 = jnp.broadcast_to(x01, lead + x01.shape[-1:])
        parameters = jnp.broadcast_to(parameters, lead + parameters.shape[-1:])
        p = 1
        for s in lead:
            p *= s
        k = 1
    x_flat = x01.reshape(p, x01.shape[-1])
    p_flat = parameters.reshape(k, p, parameters.shape[-1])
    return x_flat, p_flat, k, p, lead


@jax.custom_vjp
def mdl_log_prob(x01: jax.Array, parameters: jax.Array) -> jax.Array:
    """Per-pixel MoDL log-prob, [.., H, W, 1] — drop-in for
    distributions.mixture.mixture_log_prob."""
    return _forward(x01, parameters)


def _forward(x01, parameters, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_mix = parameters.shape[-1] // 10
    x_flat, p_flat, k, p, lead = _flatten_operands(x01, parameters)
    bp = _block_pixels(p)
    grid = (k, p // bp)

    # output laid out [K, P/BP, 1, BP]: the block's trailing two dims (1, BP)
    # match the array dims / 128-divisibility rule; reshaping back to [K, P]
    # is free (row-major contiguity)
    out = pl.pallas_call(
        functools.partial(_kernel, n_mix=n_mix),
        out_shape=jax.ShapeDtypeStruct((k, p // bp, 1, bp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, x_flat.shape[-1]), lambda ik, ib: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp, 10 * n_mix), lambda ik, ib: (ik, ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, bp), lambda ik, ib: (ik, ib, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_flat, p_flat)
    return out.reshape(lead + (1,))


def _bwd_math(pt, xt, gv, n):
    """Backward mixture chain on already-oriented tiles: ``pt`` [10n, L],
    ``xt`` [3, L] in [-1, 1], ``gv`` [1, L] cotangent -> d(out)/d(pt)
    [10n, L], recomputing the forward chain in VMEM.

    With s = softmax(w) over mixes (w the weighted per-mix log-probs) and
    gw_i = g * s_i (logsumexp pullback):
      d logits  = g * (s - softmax(logits))
      d loc_c   = gw * dL_c                     (autoregression is additive)
      d ls_c    = gw * dS_c * [ls_raw > -7]     (clamp mask)
      d cf_r    = (gw * dL_g) * x_r * (1 - tanh(cf_r)^2)
      d cf_g    = (gw * dL_b) * x_r * (1 - tanh(cf_g)^2)
      d cf_b    = (gw * dL_b) * x_g * (1 - tanh(cf_b)^2)
    where (dL_c, dS_c, _) = _dl_grads per channel.
    """
    xr, xg, xb = xt[0:1], xt[1:2], xt[2:3]

    logits = pt[0:n]
    loc_r, ls_r_raw, cf_r_raw = pt[n:2 * n], pt[2 * n:3 * n], pt[3 * n:4 * n]
    loc_g, ls_g_raw, cf_g_raw = pt[4 * n:5 * n], pt[5 * n:6 * n], pt[6 * n:7 * n]
    loc_b, ls_b_raw, cf_b_raw = pt[7 * n:8 * n], pt[8 * n:9 * n], pt[9 * n:10 * n]

    # stacked [3n, BP] blocks, same rationale as the forward kernel: full
    # sublane tiles for the per-(channel, mixture) elementwise bulk
    cf = jnp.tanh(jnp.concatenate([cf_r_raw, cf_g_raw, cf_b_raw], axis=0))
    cf_r, cf_g, cf_b = cf[0:n], cf[n:2 * n], cf[2 * n:3 * n]
    ls_raw = jnp.concatenate([ls_r_raw, ls_g_raw, ls_b_raw], axis=0)
    ls_all = jnp.maximum(ls_raw, -7.0)
    lg = loc_g + cf_r * xr
    lb = loc_b + cf_g * xr + cf_b * xg

    x_all = jnp.concatenate([
        jnp.broadcast_to(xr, (n,) + xr.shape[1:]),
        jnp.broadcast_to(xg, (n,) + xg.shape[1:]),
        jnp.broadcast_to(xb, (n,) + xb.shape[1:]),
    ], axis=0)
    loc_all = jnp.concatenate([loc_r, lg, lb], axis=0)

    lp_all = _dl(x_all, loc_all, ls_all)             # [3n, BP]
    lp = lp_all[0:n] + lp_all[n:2 * n] + lp_all[2 * n:3 * n]
    log_softmax = logits - jax.scipy.special.logsumexp(logits, axis=0,
                                                       keepdims=True)
    w = lp + log_softmax
    s = jax.nn.softmax(w, axis=0)                    # [n, BP]
    gw = gv * s

    d_logits = gv * (s - jax.nn.softmax(logits, axis=0))

    dL_all, dS_all, _ = _dl_grads(x_all, loc_all, ls_all)
    gw3 = jnp.concatenate([gw, gw, gw], axis=0)
    gL_all = gw3 * dL_all                            # [3n, BP]
    dS_masked = jnp.where(ls_raw > -7.0, gw3 * dS_all, 0.0)
    gL_r, gL_g, gL_b = gL_all[0:n], gL_all[n:2 * n], gL_all[2 * n:3 * n]

    d_cf_r = gL_g * xr * (1.0 - cf_r * cf_r)
    d_cf_g = gL_b * xr * (1.0 - cf_g * cf_g)
    d_cf_b = gL_b * xg * (1.0 - cf_b * cf_b)

    return jnp.concatenate(
        [
            d_logits,
            gL_r, dS_masked[0:n], d_cf_r,
            gL_g, dS_masked[n:2 * n], d_cf_g,
            gL_b, dS_masked[2 * n:3 * n], d_cf_b,
        ],
        axis=0,
    )  # [10n, L]


def _bwd_kernel(x_ref, p_ref, g_ref, dp_ref, *, n_mix):
    """One [BP, 10n] raw tile + [BP, 3] observations + [BP] cotangent
    -> d(out)/d(raw tile)."""
    pt = p_ref[0].astype(jnp.float32).T              # [10n, BP]
    xt = x_ref[:].astype(jnp.float32).T * 2.0 - 1.0  # [3, BP]
    gv = g_ref[0, 0].astype(jnp.float32)             # [1, BP]
    dpt = _bwd_math(pt, xt, gv, n_mix)
    dp_ref[0] = dpt.T.astype(dp_ref.dtype)


def _backward_params(x01, parameters, g, interpret=None):
    """Fused d(mdl_log_prob)/d(parameters); same grid/layout as _forward."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_mix = parameters.shape[-1] // 10
    x_flat, p_flat, k, p, lead = _flatten_operands(x01, parameters)
    bp = _block_pixels(p)
    grid = (k, p // bp)
    g_flat = g.reshape(k, p // bp, 1, bp)  # inverse of _forward's out reshape

    dp = pl.pallas_call(
        functools.partial(_bwd_kernel, n_mix=n_mix),
        out_shape=jax.ShapeDtypeStruct(p_flat.shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, x_flat.shape[-1]), lambda ik, ib: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp, 10 * n_mix), lambda ik, ib: (ik, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bp), lambda ik, ib: (ik, ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bp, 10 * n_mix), lambda ik, ib: (ik, ib, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_flat, p_flat, g_flat)
    return dp.reshape(parameters.shape).astype(parameters.dtype)


def _fwd(x01, parameters):
    return _forward(x01, parameters), (x01, parameters)


def _bwd(res, g):
    x01, parameters = res
    lead = jnp.broadcast_shapes(x01.shape[:-1], parameters.shape[:-1])
    xlead = x01.shape[:-1]
    common = (parameters.shape[:-1] == lead
              and xlead == lead[len(lead) - len(xlead):])
    if not common:  # exotic broadcast: fall back to the jnp reference vjp
        # (through the f32 upcast the jnp log_prob path applies, so the
        # math runs float32 even for a bf16 boundary; the d_params
        # cotangent comes back in parameters.dtype via the astype pullback)
        _, vjp = jax.vjp(
            lambda x, p: mixture_log_prob(x, p.astype(jnp.float32)),
            x01, parameters)
        return vjp(g)

    d_params = _backward_params(x01, parameters, g)
    # x cotangent via the jnp reference: x01 is observed data in every
    # training path, so this recompute is unused there and XLA removes it.
    # Upcast quantized (bf16-boundary) parameters first: likelihood math —
    # including d/dx — stays float32 (the contract the jnp fallback
    # enforces, distributions/mixture.py log_prob; ADVICE r4).
    _, x_vjp = jax.vjp(
        lambda x: mixture_log_prob(x, parameters.astype(jnp.float32)), x01)
    (d_x01,) = x_vjp(g)
    return d_x01, d_params


mdl_log_prob.defvjp(_fwd, _bwd)


# --- batch-lanes layout (round 4) --------------------------------------------
#
# The optimized HLO showed the standard-layout kernel forces a 131 MB
# cross-layout copy of the head conv's output (the conv's natural layout is
# batch-in-lanes {0,3,2,1}; tpu_custom_call constrains operands to default
# layouts) costing ~1.67 ms/step — over half the mixture cost (design.md
# §12n). This variant consumes the tensor through the logical transpose
# [k,B,H,W,10n] -> [H*W, 10n, k*B]: with the conv's layout that transpose IS
# a bitcast (verified: zero big copies in the optimized HLO), so nothing is
# relaid out, and the kernel tiles arrive channels-on-sublanes /
# (k,b)-on-lanes — the orientation the math wants — with no in-VMEM
# transpose either. Same elementwise math (_fwd_math/_bwd_math), so results
# are bit-identical to the standard-layout kernel.


def _hw_block(hw: int, bytes_per_hw: int, target: int = 8,
              budget: int = 6 * 1024 * 1024) -> int:
    """Largest divisor of ``hw`` <= target whose block fits the VMEM
    budget (the eval path's L = k_chunk*B lanes can reach 10k, where a
    train-sized hw block would blow the 16 MB scoped-vmem limit)."""
    b = max(1, min(target, hw, budget // max(bytes_per_hw, 1)))
    while b > 1 and hw % b:
        b -= 1
    return int(b)


def batch_lanes_applicable(x01: jax.Array, parameters: jax.Array) -> bool:
    """True for the training/eval shapes: x ``[B,H,W,3]``, parameters
    ``[k,B,H,W,10n]`` (or without the leading sample axis)."""
    if jnp.ndim(x01) != 4 or x01.shape[-1] != 3:
        return False
    if parameters.ndim == 5:
        return parameters.shape[1:-1] == x01.shape[:-1]
    return parameters.ndim == 4 and parameters.shape[:-1] == x01.shape[:-1]


def _kernel_bl(x_ref, p_ref, out_ref, *, n_mix, hwb):
    for i in range(hwb):
        pt = p_ref[i].astype(jnp.float32)             # [10n, L]
        xt = x_ref[i].astype(jnp.float32) * 2.0 - 1.0  # [3, L]
        out_ref[i] = _fwd_math(pt, xt, n_mix)


def _bwd_kernel_bl(x_ref, p_ref, g_ref, dp_ref, *, n_mix, hwb):
    for i in range(hwb):
        pt = p_ref[i].astype(jnp.float32)
        xt = x_ref[i].astype(jnp.float32) * 2.0 - 1.0
        gv = g_ref[i].astype(jnp.float32)             # [1, L]
        dp_ref[i] = _bwd_math(pt, xt, gv, n_mix).astype(dp_ref.dtype)


def _bl_operands(x01, parameters):
    p5 = parameters if parameters.ndim == 5 else parameters[None]
    k = p5.shape[0]
    B, H, W, _ = x01.shape
    C = p5.shape[-1]
    L = k * B
    # the transpose that is a layout BITCAST against the conv's
    # batch-in-lanes output (no data movement)
    p_t = p5.transpose(2, 3, 4, 0, 1).reshape(H * W, C, L)
    x_t = x01.transpose(1, 2, 3, 0)                   # [H, W, 3, B]
    x_t = jnp.broadcast_to(x_t[:, :, :, None, :], (H, W, 3, k, B))
    x_t = x_t.reshape(H * W, 3, L)
    return p_t, x_t, k, B, H, W, C, L


def _forward_bl(x01, parameters, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_mix = parameters.shape[-1] // 10
    p_t, x_t, k, B, H, W, C, L = _bl_operands(x01, parameters)
    hwb = _hw_block(H * W, (C + 4) * L * 4)
    out = pl.pallas_call(
        functools.partial(_kernel_bl, n_mix=n_mix, hwb=hwb),
        out_shape=jax.ShapeDtypeStruct((H * W, 1, L), jnp.float32),
        grid=(H * W // hwb,),
        in_specs=[
            pl.BlockSpec((hwb, 3, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, C, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hwb, 1, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_t, p_t)
    lp = out.reshape(H, W, k, B).transpose(2, 3, 0, 1)[..., None]
    return lp if parameters.ndim == 5 else lp[0]


def _backward_params_bl(x01, parameters, g, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_mix = parameters.shape[-1] // 10
    p_t, x_t, k, B, H, W, C, L = _bl_operands(x01, parameters)
    g5 = g if parameters.ndim == 5 else g[None]       # [k,B,H,W,1]
    g_t = g5.transpose(2, 3, 4, 0, 1).reshape(H * W, 1, L)
    hwb = _hw_block(H * W, (2 * C + 4) * L * 4)
    dp = pl.pallas_call(
        functools.partial(_bwd_kernel_bl, n_mix=n_mix, hwb=hwb),
        out_shape=jax.ShapeDtypeStruct((H * W, C, L), jnp.float32),
        grid=(H * W // hwb,),
        in_specs=[
            pl.BlockSpec((hwb, 3, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, C, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hwb, C, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_t, p_t, g_t)
    dp = dp.reshape(H, W, C, k, B).transpose(3, 4, 0, 1, 2)
    dp = dp.astype(parameters.dtype)
    return dp if parameters.ndim == 5 else dp[0]


@jax.custom_vjp
def mdl_log_prob_batch_lanes(x01: jax.Array, parameters: jax.Array) -> jax.Array:
    """Batch-lanes-layout MoDL log-prob — bit-identical results to
    ``mdl_log_prob``, zero relayout copies at the custom-call boundary.
    Requires the training/eval operand shapes (``batch_lanes_applicable``)."""
    return _forward_bl(x01, parameters)


def _fwd_bl(x01, parameters):
    return _forward_bl(x01, parameters), (x01, parameters)


def _bwd_bl(res, g):
    x01, parameters = res
    d_params = _backward_params_bl(x01, parameters, g)
    # x cotangent via the jnp reference: dead code in training (x is data).
    # f32 upcast as in _bwd: d/dx math never runs in bf16 (ADVICE r4).
    _, x_vjp = jax.vjp(
        lambda x: mixture_log_prob(x, parameters.astype(jnp.float32)), x01)
    (d_x01,) = x_vjp(g)
    return d_x01, d_params


mdl_log_prob_batch_lanes.defvjp(_fwd_bl, _bwd_bl)


# --- exact-f32 batch-lanes route: u16 hi/lo bit-split (round 5) -------------
#
# §12n measured the plain f32 batch-lanes path SLOWER (20.2k vs 22.5k):
# without a narrowing convert between the head conv and the kernel, the
# [k,B,H,W,10n] -> [H*W, 10n, k*B] transpose cannot fold into a layout
# bitcast, and XLA re-inserts the 1.67 ms relayout copy. The bf16 boundary
# fixed that but trades exactness (boundary values quantize to bf16).
#
# This route keeps EXACT f32 values and still hands XLA narrowing ops to
# fold the relayout into: bitcast the f32 tensor to u32 and split it into
# two u16 halves (hi = top 16 bits, lo = bottom 16). The two shift/mask/
# convert chains are elementwise narrowing ops — the same shape XLA folded
# the f32->bf16 convert into — and the kernel reconstructs the exact f32
# bit pattern in-register ((hi << 16) | lo). Reconstruction is pure bit
# movement: every value, including NaN/inf/denormals, round-trips
# bit-identically, so results are bit-equal to the standard f32 kernel
# (pinned in tests/test_pallas.py). Boundary traffic equals f32 (2 x 2
# bytes), but the layout copy is gone.


def _split_f32_u16(p: jax.Array):
    """f32 -> (hi, lo) uint16 halves of the bit pattern."""
    v = jax.lax.bitcast_convert_type(p, jnp.uint32)
    hi = (v >> 16).astype(jnp.uint16)
    lo = (v & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    return hi, lo


def _join_u16(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """(hi, lo) uint16 halves -> exact f32 reconstruction."""
    v = (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(v, jnp.float32)


def _kernel_bl_split(x_ref, hi_ref, lo_ref, out_ref, *, n_mix, hwb):
    for i in range(hwb):
        pt = _join_u16(hi_ref[i], lo_ref[i])          # [10n, L] exact f32
        xt = x_ref[i].astype(jnp.float32) * 2.0 - 1.0  # [3, L]
        out_ref[i] = _fwd_math(pt, xt, n_mix)


def _bwd_kernel_bl_split(x_ref, hi_ref, lo_ref, g_ref, dp_ref, *, n_mix, hwb):
    for i in range(hwb):
        pt = _join_u16(hi_ref[i], lo_ref[i])
        xt = x_ref[i].astype(jnp.float32) * 2.0 - 1.0
        gv = g_ref[i].astype(jnp.float32)
        dp_ref[i] = _bwd_math(pt, xt, gv, n_mix)


def _bl_split_operands(x01, parameters):
    p5 = parameters if parameters.ndim == 5 else parameters[None]
    k = p5.shape[0]
    B, H, W, _ = x01.shape
    C = p5.shape[-1]
    L = k * B
    # split FIRST (narrowing ops read the conv's own layout), then apply the
    # bitcastable transpose to each 16-bit half
    hi, lo = _split_f32_u16(p5)
    hi_t = hi.transpose(2, 3, 4, 0, 1).reshape(H * W, C, L)
    lo_t = lo.transpose(2, 3, 4, 0, 1).reshape(H * W, C, L)
    x_t = x01.transpose(1, 2, 3, 0)
    x_t = jnp.broadcast_to(x_t[:, :, :, None, :], (H, W, 3, k, B))
    x_t = x_t.reshape(H * W, 3, L)
    return hi_t, lo_t, x_t, k, B, H, W, C, L


def _forward_bl_split(x01, parameters, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_mix = parameters.shape[-1] // 10
    hi_t, lo_t, x_t, k, B, H, W, C, L = _bl_split_operands(x01, parameters)
    hwb = _hw_block(H * W, (C + 4) * L * 4)
    out = pl.pallas_call(
        functools.partial(_kernel_bl_split, n_mix=n_mix, hwb=hwb),
        out_shape=jax.ShapeDtypeStruct((H * W, 1, L), jnp.float32),
        grid=(H * W // hwb,),
        in_specs=[
            pl.BlockSpec((hwb, 3, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, C, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, C, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hwb, 1, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_t, hi_t, lo_t)
    lp = out.reshape(H, W, k, B).transpose(2, 3, 0, 1)[..., None]
    return lp if parameters.ndim == 5 else lp[0]


def _backward_params_bl_split(x01, parameters, g, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_mix = parameters.shape[-1] // 10
    hi_t, lo_t, x_t, k, B, H, W, C, L = _bl_split_operands(x01, parameters)
    g5 = g if parameters.ndim == 5 else g[None]
    g_t = g5.transpose(2, 3, 4, 0, 1).reshape(H * W, 1, L)
    hwb = _hw_block(H * W, (2 * C + 4) * L * 4)
    dp = pl.pallas_call(
        functools.partial(_bwd_kernel_bl_split, n_mix=n_mix, hwb=hwb),
        out_shape=jax.ShapeDtypeStruct((H * W, C, L), jnp.float32),
        grid=(H * W // hwb,),
        in_specs=[
            pl.BlockSpec((hwb, 3, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, C, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, C, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hwb, C, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_t, hi_t, lo_t, g_t)
    dp = dp.reshape(H, W, C, k, B).transpose(3, 4, 0, 1, 2)
    return dp if parameters.ndim == 5 else dp[0]


@jax.custom_vjp
def mdl_log_prob_batch_lanes_f32(x01: jax.Array,
                                 parameters: jax.Array) -> jax.Array:
    """Exact-f32 batch-lanes MoDL log-prob: the parameter tensor crosses
    the custom-call boundary as two u16 bit-halves whose narrowing
    producers give XLA the layout-folding point the plain f32 path lacks;
    the kernel reconstructs the exact f32 bits in-register. Bit-equal
    results to ``mdl_log_prob`` on f32 inputs."""
    return _forward_bl_split(x01, parameters)


def _fwd_bl_split(x01, parameters):
    return _forward_bl_split(x01, parameters), (x01, parameters)


def _bwd_bl_split(res, g):
    x01, parameters = res
    d_params = _backward_params_bl_split(x01, parameters, g)
    _, x_vjp = jax.vjp(
        lambda x: mixture_log_prob(x, parameters.astype(jnp.float32)), x01)
    (d_x01,) = x_vjp(g)
    return d_x01, d_params


mdl_log_prob_batch_lanes_f32.defvjp(_fwd_bl_split, _bwd_bl_split)


# --- lane-tiled (k-grid) batch-lanes variant for the eval regime (round 5) --
#
# The 5000-IS evaluator's operands carry L = k_chunk*B lanes (10k+): the
# whole-L batch-lanes kernel then degrades to 1-2-row hw blocks and
# materialises a 123 MB x broadcast (measured slower, §12n), so eval kept
# the standard kernel and its relayout copy. This variant tiles the LANE
# axis by k: grid (H*W/hwb, k_chunk), parameter blocks [hwb, C, B] at lane
# offset ik*B, and the x block's index_map ignores ik — the broadcast over
# k is expressed through the grid (Pallas skips the re-fetch while the
# block index is unchanged), never materialised. Requires B % 128 == 0 so
# every lane tile is aligned.


def _kernel_bl_kgrid(x_ref, p_ref, out_ref, *, n_mix, hwb):
    for i in range(hwb):
        pt = p_ref[i].astype(jnp.float32)              # [10n, B]
        xt = x_ref[i].astype(jnp.float32) * 2.0 - 1.0  # [3, B]
        out_ref[i] = _fwd_math(pt, xt, n_mix)


def _bwd_kernel_bl_kgrid(x_ref, p_ref, g_ref, dp_ref, *, n_mix, hwb):
    for i in range(hwb):
        pt = p_ref[i].astype(jnp.float32)
        xt = x_ref[i].astype(jnp.float32) * 2.0 - 1.0
        gv = g_ref[i].astype(jnp.float32)
        dp_ref[i] = _bwd_math(pt, xt, gv, n_mix).astype(dp_ref.dtype)


def _forward_bl_kgrid(x01, parameters, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_mix = parameters.shape[-1] // 10
    p5 = parameters if parameters.ndim == 5 else parameters[None]
    k = p5.shape[0]
    B, H, W, _ = x01.shape
    C = p5.shape[-1]
    L = k * B
    p_t = p5.transpose(2, 3, 4, 0, 1).reshape(H * W, C, L)
    x_t = x01.transpose(1, 2, 3, 0).reshape(H * W, 3, B)  # NO k broadcast
    hwb = _hw_block(H * W, (C + 4) * B * 4, target=64)
    out = pl.pallas_call(
        functools.partial(_kernel_bl_kgrid, n_mix=n_mix, hwb=hwb),
        out_shape=jax.ShapeDtypeStruct((H * W, 1, L), jnp.float32),
        # ik innermost: consecutive grid steps keep the x block index
        # unchanged, so Pallas fetches each x block once per hw tile
        grid=(H * W // hwb, k),
        in_specs=[
            pl.BlockSpec((hwb, 3, B), lambda i, ik: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, C, B), lambda i, ik: (i, 0, ik),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hwb, 1, B), lambda i, ik: (i, 0, ik),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_t, p_t)
    lp = out.reshape(H, W, k, B).transpose(2, 3, 0, 1)[..., None]
    return lp if parameters.ndim == 5 else lp[0]


def _backward_params_bl_kgrid(x01, parameters, g, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_mix = parameters.shape[-1] // 10
    p5 = parameters if parameters.ndim == 5 else parameters[None]
    k = p5.shape[0]
    B, H, W, _ = x01.shape
    C = p5.shape[-1]
    L = k * B
    p_t = p5.transpose(2, 3, 4, 0, 1).reshape(H * W, C, L)
    x_t = x01.transpose(1, 2, 3, 0).reshape(H * W, 3, B)
    g5 = g if parameters.ndim == 5 else g[None]
    g_t = g5.transpose(2, 3, 4, 0, 1).reshape(H * W, 1, L)
    hwb = _hw_block(H * W, (2 * C + 4) * B * 4, target=64)
    dp = pl.pallas_call(
        functools.partial(_bwd_kernel_bl_kgrid, n_mix=n_mix, hwb=hwb),
        out_shape=jax.ShapeDtypeStruct((H * W, C, L), jnp.float32),
        grid=(H * W // hwb, k),
        in_specs=[
            pl.BlockSpec((hwb, 3, B), lambda i, ik: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, C, B), lambda i, ik: (i, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwb, 1, B), lambda i, ik: (i, 0, ik),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hwb, C, B), lambda i, ik: (i, 0, ik),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_t, p_t, g_t)
    dp = dp.reshape(H, W, C, k, B).transpose(3, 4, 0, 1, 2)
    dp = dp.astype(parameters.dtype)
    return dp if parameters.ndim == 5 else dp[0]


@jax.custom_vjp
def mdl_log_prob_lane_tiled(x01: jax.Array,
                            parameters: jax.Array) -> jax.Array:
    """Lane-tiled (k-grid) batch-lanes MoDL log-prob for LARGE k*B (the
    5000-IS eval regime): parameter lane tiles of width B, x broadcast over
    k expressed through the grid instead of materialised. Same math bodies
    as the other kernels (equal to float roundoff across tile geometries);
    requires ``batch_lanes_applicable`` shapes and B % 128 == 0."""
    return _forward_bl_kgrid(x01, parameters)


def _fwd_bl_kgrid(x01, parameters):
    return _forward_bl_kgrid(x01, parameters), (x01, parameters)


def _bwd_bl_kgrid(res, g):
    x01, parameters = res
    d_params = _backward_params_bl_kgrid(x01, parameters, g)
    _, x_vjp = jax.vjp(
        lambda x: mixture_log_prob(x, parameters.astype(jnp.float32)), x01)
    (d_x01,) = x_vjp(g)
    return d_x01, d_params


mdl_log_prob_lane_tiled.defvjp(_fwd_bl_kgrid, _bwd_bl_kgrid)


def prefer_batch_lanes(x01: jax.Array, parameters: jax.Array,
                       max_lanes: int = 4096) -> bool:
    """Measured dispatch rule (design.md §12n/§12o, bench-harness A/Bs):

    - bf16 boundary + batch-lanes beats the standard kernel at EVERY
      swept lane count (production mode, scripts/lane_threshold_sweep.py
      + scripts/r5_kernel_probes.py, round 5):
      L=640 +42%, 768 +14%, 896 +26%, 1024 +33%, 1280 +9%, 2048 +17%,
      4096 +22% — so max_lanes is the edge of the measured range, not a
      crossover (none was found below the eval regime);
    - f32 + batch-lanes: 20.2k vs 22.5k standard — SLOWER (without the
      convert, the layout transpose does not fold away; the exact u16
      bit-split route is also measured slower, §12o), so f32 keeps the
      standard kernel;
    - whole-L blocks at eval lane counts (L = 10k+): 61.9 vs 86.1 imgs/s
      — 1-2-row hw blocks + a 123 MB x broadcast; those shapes go to the
      LANE-TILED kernel instead (prefer_lane_tiled) when aligned.

    Hence: batch-lanes iff the boundary is bf16, the operands have the
    training shape, and k*B <= max_lanes.

    L = k*B must also be a multiple of 128 (the lane width): the measured
    geometries are full-lane tiles, and a ragged lane count (e.g.
    batch 100, k=5 -> L=500) would hand Mosaic an untested padded tile
    shape — those shapes keep the standard kernel, whose pixel-axis
    blocking is always 128-divisible (ADVICE r4)."""
    if parameters.dtype != jnp.bfloat16:
        return False
    if not batch_lanes_applicable(x01, parameters):
        return False
    k = parameters.shape[0] if parameters.ndim == 5 else 1
    lanes = k * x01.shape[0]
    return lanes % 128 == 0 and lanes <= max_lanes


def prefer_lane_tiled(x01: jax.Array, parameters: jax.Array,
                      max_lanes: int = 4096) -> bool:
    """Measured dispatch rule for the k-grid lane-tiled kernel (§12o):
    the 5000-IS eval regime (L = k_chunk*B beyond batch-lanes' measured
    range) with a 128-aligned batch — 102.8 vs 86.6 imgs/s (+19%) over
    the standard kernel at B=128, k_chunk=100 (bf16 boundary production
    eval). bf16-boundary only, like batch-lanes: the f32 transpose does
    not fold (§12n), so f32 operands keep the standard kernel."""
    if parameters.dtype != jnp.bfloat16:
        return False
    if not batch_lanes_applicable(x01, parameters):
        return False
    if x01.shape[0] % 128 != 0:
        return False
    k = parameters.shape[0] if parameters.ndim == 5 else 1
    return k * x01.shape[0] > max_lanes
