"""Cross-validate the likelihoods against the reference's TF numerics —
values AND gradients.

The in-suite numpy oracle (tests/oracles.py) is a re-derivation from the
PixelCNN++ paper; a transcription error shared between it and the jnp
implementation would be undetectable. This module closes that hole by
executing the same math in TensorFlow — the framework the reference runs
on — with the reference's exact op sequence, branch thresholds and
gradient-selection semantics, under ``tf.GradientTape``:

- MoDL loss: /root/reference/utils/mdl_openai.py:83-157 (the OpenAI
  PixelCNN++ ``discretized_mix_logistic_loss`` the reference keeps in-tree
  as its own oracle), including the double-``tf.where`` gradient trick
  (:131-150) whose whole purpose is gradient behavior that only shows up
  under a tape.
- DL cascade: /root/reference/utils/discretized_logistic.py:35-78 (the
  ``log_prob`` used by models 03/04/06), with its ``x <= low`` /
  ``x >= high`` edge selection and ``prob > 1e-5`` approximation switch.

The TF functions below are transcriptions of those published formulas (same
numerics, independent structure), NOT imports of reference code — the suite
must not depend on /root/reference existing. Skipped when TF is absent.

Everything runs in float32 on CPU. TF and XLA:CPU implement sigmoid/softplus
/log with last-ulp differences that the tail CDF-difference amplifies, so
values are compared with ``assert_log_probs_match_tf`` (tight where
well-conditioned, probability-space plus a 0.05 log-ceiling elsewhere) and
gradients by relative RMS — tight enough to catch any formula or
branch-selection error, loose enough for libm-under-cancellation noise.
"""
from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vae_mdl_tpu.distributions.discretized import (  # noqa: E402
    discretized_logistic_log_prob,
)
from vae_mdl_tpu.distributions.mixture import mixture_log_prob  # noqa: E402
from vae_mdl_tpu.ops.pallas.mdl_kernel import mdl_log_prob  # noqa: E402

tf.config.set_visible_devices([], "GPU")


# --------------------------------------------------------------------------
# TF transcriptions of the reference numerics
# --------------------------------------------------------------------------


def tf_dl_log_prob(x, loc, logscale, low, high, levels):
    """DL cascade, reference numerics (utils/discretized_logistic.py:35-78):
    CDF difference, 1e-12 clamp (gradient guard), 1e-5 approximation switch,
    ``<=``/``>=`` edge selection."""
    width = (high - low) / (levels - 1.0)
    dx = width / 2.0
    centered = x - loc
    inv_std = tf.exp(-logscale)
    start = (centered - dx) * inv_std
    stop = (centered + dx) * inv_std
    prob = tf.maximum(tf.sigmoid(stop) - tf.sigmoid(start), 1e-12)
    left_edge = stop - tf.nn.softplus(stop)
    right_edge = -tf.nn.softplus(start)
    a = centered * inv_std
    approx = -a - logscale - 2.0 * tf.nn.softplus(-a) + np.float32(np.log(width))
    out = tf.where(prob > 1e-5, tf.math.log(prob), approx)
    out = tf.where(x <= low, left_edge, out)
    return tf.where(x >= high, right_edge, out)


def tf_modl_log_prob(xm11, params):
    """OpenAI PixelCNN++ MoDL loss, reference numerics
    (utils/mdl_openai.py:83-157): ``xm11`` in [-1, 1], params
    ``[B, H, W, n_mix*10]``; returns per-pixel ``[B, H, W]``.

    Preserves the literal branch structure: +-0.999 edge thresholds, the
    ``log(max(cdf_delta, 1e-12))`` double-where guard, the
    ``cdf_delta > 1e-5`` switch and the ``log_pdf_mid - log(127.5)``
    constant-density fallback.
    """
    n_mix = params.shape[-1] // 10
    mix_logits = params[..., :n_mix]
    rest = tf.reshape(params[..., n_mix:], params.shape[:-1] + (3, 3 * n_mix))
    means = rest[..., :n_mix]
    log_scales = tf.maximum(rest[..., n_mix:2 * n_mix], -7.0)
    coeffs = tf.tanh(rest[..., 2 * n_mix:])

    xe = xm11[..., None]  # [..., 3, 1] against n_mix
    m_r = means[..., 0, :]
    m_g = means[..., 1, :] + coeffs[..., 0, :] * xe[..., 0, :]
    m_b = (means[..., 2, :] + coeffs[..., 1, :] * xe[..., 0, :]
           + coeffs[..., 2, :] * xe[..., 1, :])
    mu = tf.stack([m_r, m_g, m_b], axis=-2)

    centered = xe - mu
    inv_stdv = tf.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_delta = tf.sigmoid(plus_in) - tf.sigmoid(min_in)
    log_cdf_plus = plus_in - tf.nn.softplus(plus_in)
    log_one_minus_cdf_min = -tf.nn.softplus(min_in)
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * tf.nn.softplus(mid_in)

    log_probs = tf.where(
        xe < -0.999,
        log_cdf_plus,
        tf.where(
            xe > 0.999,
            log_one_minus_cdf_min,
            tf.where(
                cdf_delta > 1e-5,
                tf.math.log(tf.maximum(cdf_delta, 1e-12)),
                log_pdf_mid - np.float32(np.log(127.5)),
            ),
        ),
    )
    weighted = tf.reduce_sum(log_probs, axis=-2) + tf.nn.log_softmax(mix_logits)
    return tf.reduce_logsumexp(weighted, axis=-1)


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------


def binned(rng, shape, levels=256):
    """uint8-binned values in [0, 1] — image-like data."""
    return (rng.integers(0, levels, shape).astype(np.float32)
            / np.float32(levels - 1))


def dl_case(seed=0, shape=(4, 6, 6, 3), low=0.0, high=1.0):
    """(x, loc, logscale) covering interior bins, BOTH edges, and the
    underflow-approximation branch (tight scales far from loc)."""
    rng = np.random.default_rng(seed)
    x = binned(rng, shape) * (high - low) + low
    # force exact edge hits
    x.flat[::7] = low
    x.flat[1::11] = high
    loc = rng.uniform(low - 0.2, high + 0.2, shape).astype(np.float32)
    # mix of moderate and tight scales; tight + distant loc => prob <= 1e-5
    logscale = rng.uniform(-7.0, -1.0, shape).astype(np.float32)
    logscale.flat[::5] = -9.0
    return x, loc, logscale


def modl_case(seed=0, shape=(3, 5, 5), n_mix=5):
    """(x01, params) on binned pixels incl. 0.0/1.0 edges and tight scales."""
    rng = np.random.default_rng(seed)
    x01 = binned(rng, shape + (3,))
    x01.flat[::13] = 0.0
    x01.flat[3::17] = 1.0
    params = rng.normal(0.0, 1.0, shape + (n_mix * 10,)).astype(np.float32)
    # push the LOGSCALE channels negative (tight scales) and plant pre-clamp
    # values below -7 to exercise the max(-7) clamp subgradient. Channel
    # layout is [logits 0:n | R loc/ls/cf n:4n | G 4n:7n | B 7n:10n]
    # (mixture.split_mixture_params), so the ls blocks are 2n:3n, 5n:6n,
    # 8n:9n — NOT 4n:7n (that span is G's whole group; a round-3 review
    # caught the original fixture planting -12 into a G *loc*).
    for base in (2 * n_mix, 5 * n_mix, 8 * n_mix):
        params[..., base:base + n_mix] -= 2.0
    # basic integer indexing gives a VIEW; strided flat writes plant
    # below-clamp values across pixels regardless of the leading shape
    params[..., 2 * n_mix].flat[::3] = -12.0
    params[..., 5 * n_mix + 1].flat[1::4] = -9.0
    params[..., 8 * n_mix + 2].flat[2::5] = -7.5
    return x01, params


def rel_rms(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    denom = np.sqrt((want ** 2).mean()) + 1e-12
    return np.sqrt(((got - want) ** 2).mean()) / denom


def assert_log_probs_match_tf(got, want):
    """Two f32 CDF-difference implementations cannot agree to ulp in the
    tails: sigmoid(stop)-sigmoid(start) cancels catastrophically there, so
    TF-vs-XLA last-ulp sigmoid differences amplify by ~1/prob in log space
    (measured here: up to ~5e-3 absolute on log-probs near -20). Compare:

    - tightly where well-conditioned (bin prob > 1e-3): atol 1e-4;
    - probabilities everywhere (the formulation's actual output): atol 2e-7;
    - log-probs everywhere with a 0.05 ceiling — conditioning noise stays
      well under it, while any wrong formula/branch/constant (the errors
      this oracle exists to catch: a dropped log(127.5), a flipped edge,
      a missing clamp) shifts log-probs by O(1) or more.
    """
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    fine = np.exp(want) > 1e-3
    np.testing.assert_allclose(got[fine], want[fine], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.exp(got), np.exp(want), atol=2e-7)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0)


# --------------------------------------------------------------------------
# DiscretizedLogistic vs the reference's TF cascade
# --------------------------------------------------------------------------


class TestDLAgainstTF:
    @pytest.mark.parametrize("low,high", [(0.0, 1.0), (-1.0, 1.0)])
    def test_values(self, low, high):
        x, loc, logscale = dl_case(seed=1, low=low, high=high)
        want = tf_dl_log_prob(
            tf.constant(x), tf.constant(loc), tf.constant(logscale),
            low, high, 256.0,
        ).numpy()
        got = np.asarray(discretized_logistic_log_prob(
            jnp.asarray(x), jnp.asarray(loc), jnp.asarray(logscale),
            low=low, high=high, levels=256.0,
        ))
        # verify the fixture actually covers every branch
        width = (high - low) / 255.0
        centered = x - loc
        prob = (_np_sigmoid((centered + width / 2) * np.exp(-logscale))
                - _np_sigmoid((centered - width / 2) * np.exp(-logscale)))
        interior = (x > low) & (x < high)
        assert (x <= low).any() and (x >= high).any()
        assert (interior & (prob <= 1e-5)).any(), "approx branch not covered"
        assert (interior & (prob > 1e-5)).any()
        assert_log_probs_match_tf(got, want)

    def test_gradients(self):
        x, loc, logscale = dl_case(seed=2)
        loc_t = tf.Variable(loc)
        ls_t = tf.Variable(logscale)
        with tf.GradientTape() as tape:
            lp = tf_dl_log_prob(tf.constant(x), loc_t, ls_t, 0.0, 1.0, 256.0)
            loss = tf.reduce_sum(lp)
        g_loc_tf, g_ls_tf = tape.gradient(loss, [loc_t, ls_t])

        g_loc, g_ls = jax.grad(
            lambda m, s: jnp.sum(discretized_logistic_log_prob(
                jnp.asarray(x), m, s, low=0.0, high=1.0, levels=256.0)),
            argnums=(0, 1),
        )(jnp.asarray(loc), jnp.asarray(logscale))

        assert np.isfinite(np.asarray(g_loc)).all()
        assert np.isfinite(np.asarray(g_ls)).all()
        assert rel_rms(g_loc, g_loc_tf.numpy()) < 1e-4
        assert rel_rms(g_ls, g_ls_tf.numpy()) < 1e-4


def _np_sigmoid(v):
    return 1.0 / (1.0 + np.exp(-v))


# --------------------------------------------------------------------------
# MoDL vs the reference's TF loss (values + gradients), jnp AND Pallas
# --------------------------------------------------------------------------


class TestMoDLAgainstTF:
    def test_values(self):
        x01, params = modl_case(seed=3)
        want = tf_modl_log_prob(
            tf.constant(2.0 * x01 - 1.0), tf.constant(params)).numpy()
        got = np.asarray(mixture_log_prob(jnp.asarray(x01),
                                          jnp.asarray(params)))[..., 0]
        assert_log_probs_match_tf(got, want)

    def test_edge_threshold_conventions_agree_on_binned_data(self):
        """The OpenAI loss selects edges with +-0.999 thresholds, the DL
        cascade (and this repo) with <= low / >= high. On 256-level binned
        data the nearest interior bins sit at +-(1 - 2/255) ~= +-0.992, so
        both conventions select identically — assert that explicitly."""
        x01, _ = modl_case(seed=4)
        xm11 = 2.0 * x01 - 1.0
        assert ((xm11 < -0.999) == (xm11 <= -1.0)).all()
        assert ((xm11 > 0.999) == (xm11 >= 1.0)).all()

    def test_gradients_jnp(self):
        x01, params = modl_case(seed=5)
        p_t = tf.Variable(params)
        with tf.GradientTape() as tape:
            loss = tf.reduce_sum(
                tf_modl_log_prob(tf.constant(2.0 * x01 - 1.0), p_t))
        g_tf = tape.gradient(loss, p_t).numpy()

        g = np.asarray(jax.grad(
            lambda p: jnp.sum(mixture_log_prob(jnp.asarray(x01), p))
        )(jnp.asarray(params)))

        assert np.isfinite(g).all() and np.isfinite(g_tf).all()
        # conditioning noise alone measures ~2e-4 here (see
        # assert_log_probs_match_tf); a formula error is orders larger
        assert rel_rms(g, g_tf) < 1e-3

    def test_gradients_pallas_kernel(self):
        """The hand-derived Pallas backward (interpret mode on CPU) against
        the TF tape — the strongest check available for the kernel, since
        its backward is not autodiff of its forward."""
        x01, params = modl_case(seed=6, shape=(2, 4, 4))
        p_t = tf.Variable(params)
        with tf.GradientTape() as tape:
            loss = tf.reduce_sum(
                tf_modl_log_prob(tf.constant(2.0 * x01 - 1.0), p_t))
        g_tf = tape.gradient(loss, p_t).numpy()

        g_ker = np.asarray(jax.grad(
            lambda p: jnp.sum(mdl_log_prob(jnp.asarray(x01), p))
        )(jnp.asarray(params)))

        assert np.isfinite(g_ker).all()
        assert rel_rms(g_ker, g_tf) < 1e-3

    def test_leading_importance_dim(self):
        """k-sample broadcasting equals the reference's merge-into-batch
        dance (utils/mdl_openai_iwae.py:37-67): per-sample decoder params
        [k,B,...] against data x [B,...] must match repeating x k times in
        the batch. (This is the training-path shape: the decoder emits one
        parameter map per importance sample, the observation is shared.)"""
        k = 3
        x01, params = modl_case(seed=7, shape=(2, 4, 4))
        rng = np.random.default_rng(8)
        pk = np.stack([params + rng.normal(0, 0.3, params.shape)
                       .astype(np.float32) for _ in range(k)])

        # TF: merge params to [k*B, ...], repeat x, compute, unmerge
        p_merged = pk.reshape((-1,) + pk.shape[2:])
        x_rep = np.repeat(x01[None], k, axis=0).reshape(
            (-1,) + x01.shape[1:])
        want = tf_modl_log_prob(
            tf.constant(2.0 * x_rep - 1.0), tf.constant(p_merged)
        ).numpy().reshape(pk.shape[:-1])

        got = np.asarray(mixture_log_prob(jnp.asarray(x01),
                                          jnp.asarray(pk)))[..., 0]
        assert_log_probs_match_tf(got, want)
