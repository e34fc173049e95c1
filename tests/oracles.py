"""Independent numpy oracles for the discretized likelihoods.

Written directly from the PixelCNN++ formulation (Salimans et al., 2017,
``pixel_cnn_pp/nn.py: discretized_mix_logistic_loss``), the same oracle the
reference keeps in-tree for cross-validation
(/root/reference/utils/mdl_openai.py). No framework code is imported here —
pure numpy, so a bug in the framework cannot leak into its own oracle.

All oracle math is computed in float32 — the reference runs TF in f32, and
the CDF-difference formulation loses ~3 decimal digits near the tails in f32
by construction (hence its 1e-5 approximation threshold); comparing an f32
implementation against an f64 oracle would test the formulation's conditioning,
not the implementation's correctness.
"""
import numpy as np

_ZERO = np.float32(0.0)


def _sigmoid(x):
    return np.float32(1.0) / (np.float32(1.0) + np.exp(-x))


def _softplus(x):
    return np.logaddexp(_ZERO, x)


def _log_softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = x - m
    return e - np.log(np.sum(np.exp(e), axis=axis, keepdims=True))


def _logsumexp(x, axis=-1):
    m = np.max(x, axis=axis)
    return np.log(np.sum(np.exp(x - np.expand_dims(m, axis)), axis=axis)) + m


def openai_discretized_logistic_log_prob(x, loc, logscale, low, high, levels):
    """Single discretized logistic, OpenAI-style numerics."""
    width = (high - low) / (levels - 1.0)
    dx = width / 2.0
    centered = x - loc
    inv_std = np.exp(-logscale)
    plus_in = inv_std * (centered + dx)
    min_in = inv_std * (centered - dx)
    cdf_delta = _sigmoid(plus_in) - _sigmoid(min_in)
    log_cdf_plus = plus_in - _softplus(plus_in)
    log_one_minus_cdf_min = -_softplus(min_in)
    mid_in = inv_std * centered
    log_pdf_mid = mid_in - logscale - 2.0 * _softplus(mid_in) + np.log(width)
    out = np.where(
        cdf_delta > 1e-5, np.log(np.maximum(cdf_delta, 1e-12)), log_pdf_mid
    )
    out = np.where(x <= low, log_cdf_plus, out)
    out = np.where(x >= high, log_one_minus_cdf_min, out)
    return out


def openai_mix_logistic_log_prob(x, params):
    """PixelCNN++ mixture-of-discretized-logistics per-pixel log prob.

    x: [..., h, w, 3] in [-1, 1] (binned to 256 levels).
    params: [..., h, w, n_mix * 10].
    Returns [..., h, w].
    """
    n_mix = params.shape[-1] // 10
    logit_probs = params[..., :n_mix]
    rest = params[..., n_mix:].reshape(params.shape[:-1] + (3, 3 * n_mix))
    means = rest[..., :n_mix]
    log_scales = np.maximum(rest[..., n_mix : 2 * n_mix], -7.0)
    coeffs = np.tanh(rest[..., 2 * n_mix :])

    xe = x[..., None]  # [..., 3, 1] broadcast against n_mix
    m1 = means[..., 0, :]
    m2 = means[..., 1, :] + coeffs[..., 0, :] * xe[..., 0, :]
    m3 = (
        means[..., 2, :]
        + coeffs[..., 1, :] * xe[..., 0, :]
        + coeffs[..., 2, :] * xe[..., 1, :]
    )
    means = np.stack([m1, m2, m3], axis=-2)

    centered = xe - means
    inv_stdv = np.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = _sigmoid(plus_in)
    cdf_min = _sigmoid(min_in)
    log_cdf_plus = plus_in - _softplus(plus_in)
    log_one_minus_cdf_min = -_softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * _softplus(mid_in)

    log_probs = np.where(
        xe < -0.999,
        log_cdf_plus,
        np.where(
            xe > 0.999,
            log_one_minus_cdf_min,
            np.where(
                cdf_delta > 1e-5,
                np.log(np.maximum(cdf_delta, 1e-12)),
                log_pdf_mid - np.log(127.5),
            ),
        ),
    )
    log_probs = np.sum(log_probs, axis=-2) + _log_softmax(logit_probs)
    return _logsumexp(log_probs, axis=-1)


def binned_random_pixels(rng, shape):
    """Random pixels binned to 256 levels in [0, 1], as the reference's smoke
    tests generate them (/root/reference/utils/mdl.py:275-281)."""
    x = rng.random(shape).astype(np.float32)
    return np.floor(x * 256.0) / 255.0
