"""Property-based tests (hypothesis): mathematical invariants that hold for
ALL parameter values, complementing the fixed-fixture oracle layers.

What each property pins:

- The discretized-logistic likelihood is an exact probability measure over
  the 256-level bin grid — probabilities over all bins sum to 1 for ANY
  (loc, logscale), including the edge-bin CDF branches and the 1e-5
  PDF-approximation switch (/root/reference/utils/discretized_logistic.py:
  35-78 defines the same partition; a branch-boundary slip would break
  normalisation before it broke any fixed golden).
- The streaming logmeanexp (the 5000-IS evaluator's accumulator,
  ops/math.py) equals the direct reduction for EVERY chunking of the
  sample axis — the exact invariant the k-chunked scan relies on — and
  handles all-(-inf) columns.
- ``logmeanexp`` is shift-invariant (the max-subtraction trick is exact).

Bounded example counts; everything runs eagerly on CPU in f32.
"""
from __future__ import annotations

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vae_mdl_tpu.distributions.discretized import (  # noqa: E402
    discretized_logistic_log_prob,
)
from vae_mdl_tpu.ops.math import (  # noqa: E402
    logmeanexp,
    streaming_logmeanexp_finalize,
    streaming_logmeanexp_init,
    streaming_logmeanexp_update,
)

_SETTINGS = dict(max_examples=25, deadline=None)


@settings(**_SETTINGS)
@given(
    loc=st.floats(-0.5, 1.5),
    logscale=st.floats(-9.0, 1.0),
    low=st.sampled_from([0.0, -1.0]),
)
def test_discretized_logistic_normalizes_over_bins(loc, logscale, low):
    """sum_k exp(log_prob(bin_k)) == 1 exactly (up to f32 roundoff) for any
    location/scale: the bin partition [k -+ width/2] tiles the line, the
    edge branches absorb the two tails, and the approximation switch must
    preserve the same measure."""
    high = 1.0
    levels = 256
    bins = np.linspace(low, high, levels).astype(np.float32)
    lp = np.asarray(
        discretized_logistic_log_prob(
            jnp.asarray(bins),
            jnp.float32(loc),
            jnp.float32(logscale),
            low=low,
            high=high,
            levels=float(levels),
        ),
        np.float64,
    )
    total = np.exp(lp).sum()
    # tight scales concentrate everything into ~1 bin (prob 1 exactly);
    # wide scales spread it across all 256 — either way the measure is 1.
    np.testing.assert_allclose(total, 1.0, rtol=5e-4)


@settings(**_SETTINGS)
@given(
    data=st.data(),
    n=st.integers(2, 40),
    b=st.integers(1, 4),
)
def test_streaming_logmeanexp_equals_direct_for_any_chunking(data, n, b):
    """Folding the sample axis in arbitrary-size chunks reproduces the
    direct logmeanexp — the invariant the k-chunked 5000-IS scan rests on."""
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    log_w = (rng.standard_normal((n, b)) * 30.0).astype(np.float32)

    # random chunk boundaries covering exactly [0, n)
    cuts = sorted(data.draw(
        st.sets(st.integers(1, n - 1), max_size=min(6, n - 1))))
    bounds = [0] + cuts + [n]

    state = streaming_logmeanexp_init((b,))
    for s, e in zip(bounds[:-1], bounds[1:]):
        state = streaming_logmeanexp_update(state, jnp.asarray(log_w[s:e]))
    got = np.asarray(streaming_logmeanexp_finalize(state))

    want = np.asarray(logmeanexp(jnp.asarray(log_w), axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_streaming_logmeanexp_all_neg_inf_column():
    """A column whose every weight is -inf finalises to -inf, not NaN
    (the eval guard fixed in round 3)."""
    state = streaming_logmeanexp_init((2,))
    chunk = jnp.asarray(
        np.array([[-np.inf, 0.0], [-np.inf, 1.0]], np.float32))
    state = streaming_logmeanexp_update(state, chunk)
    out = np.asarray(streaming_logmeanexp_finalize(state))
    assert out[0] == -np.inf and np.isfinite(out[1])


@settings(**_SETTINGS)
@given(
    seed=st.integers(0, 2**31),
    shift=st.floats(-1e4, 1e4),
)
def test_logmeanexp_shift_invariance(seed, shift):
    """logmeanexp(x + c) == logmeanexp(x) + c: the max-subtracted form is
    exact under translation (utils/utils.py:9-11 relies on this)."""
    rng = np.random.default_rng(seed)
    log_w = (rng.standard_normal((7, 3)) * 5.0).astype(np.float32)
    base = np.asarray(logmeanexp(jnp.asarray(log_w), axis=0), np.float64)
    shifted = np.asarray(
        logmeanexp(jnp.asarray(log_w + np.float32(shift)), axis=0),
        np.float64,
    )
    np.testing.assert_allclose(shifted - float(np.float32(shift)), base,
                               rtol=1e-5, atol=1e-3)
