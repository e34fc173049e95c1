"""Golden-value and property tests for the probability layer.

Replaces the reference's script-style ``__main__`` smoke tests
(/root/reference/utils/mdl.py:266-312 etc.) with real pytest units, and ports
its oracle-cross-validation strategy: the MoDL log-prob is checked against an
independently derived PixelCNN++ formula (tests/oracles.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from oracles import (
    binned_random_pixels,
    openai_discretized_logistic_log_prob,
    openai_mix_logistic_log_prob,
)
from vae_mdl_tpu.distributions import (
    Bernoulli,
    DiscretizedLogistic,
    DistributionTuple,
    Logistic,
    MixtureDiscretizedLogistic,
    Normal,
    PixelMixtureDiscretizedLogistic,
)
from vae_mdl_tpu.ops.math import (
    logmeanexp,
    streaming_logmeanexp_finalize,
    streaming_logmeanexp_init,
    streaming_logmeanexp_update,
)


def _assert_log_probs_match(got, want, log_atol=1e-4, prob_atol=2e-7):
    """Compare log-probs from two f32 implementations of the CDF-difference
    formulation. Near the tails the sigmoid difference cancels catastrophically
    in f32, so ulp-level differences between jax and numpy sigmoids amplify by
    ~1/prob in log space; there we compare probabilities instead (the
    quantity the formulation actually computes)."""
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    well_conditioned = np.exp(want) > 1e-3
    np.testing.assert_allclose(
        got[well_conditioned], want[well_conditioned], rtol=1e-4, atol=log_atol
    )
    np.testing.assert_allclose(np.exp(got), np.exp(want), atol=prob_atol)


class TestContinuous:
    def test_normal_log_prob_matches_scipy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 7)).astype(np.float32)
        loc = rng.normal(size=(4, 7)).astype(np.float32)
        scale = rng.random((4, 7)).astype(np.float32) + 0.1
        got = Normal(loc, scale).log_prob(x)
        want = scipy.stats.norm.logpdf(x, loc, scale)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_logistic_log_prob_matches_scipy(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(5, 3)).astype(np.float32)
        loc = rng.normal(size=(5, 3)).astype(np.float32)
        scale = rng.random((5, 3)).astype(np.float32) + 0.1
        got = Logistic(loc, scale).log_prob(x)
        want = scipy.stats.logistic.logpdf(x, loc, scale)
        # f32 softplus on the tails loses a few bits vs scipy's f64
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_bernoulli_log_prob_matches_scipy(self):
        rng = np.random.default_rng(2)
        logits = rng.normal(size=(6, 4)).astype(np.float32)
        x = (rng.random((6, 4)) < 0.5).astype(np.float32)
        got = Bernoulli(logits).log_prob(x)
        want = scipy.stats.bernoulli.logpmf(x, scipy.special.expit(logits))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_normal_sample_statistics(self):
        d = Normal(jnp.array(2.0), jnp.array(3.0))
        s = d.sample(jax.random.PRNGKey(0), (20000,))
        assert abs(float(s.mean()) - 2.0) < 0.1
        assert abs(float(s.std()) - 3.0) < 0.1

    def test_logistic_sample_statistics(self):
        d = Logistic(jnp.array(-1.0), jnp.array(0.5))
        s = d.sample(jax.random.PRNGKey(0), (40000,))
        assert abs(float(s.mean()) + 1.0) < 0.05
        # logistic variance = (pi * s)^2 / 3
        assert abs(float(s.var()) - (np.pi * 0.5) ** 2 / 3.0) < 0.05

    def test_normal_analytic_kl(self):
        rng = np.random.default_rng(3)
        loc = rng.normal(size=(512,)).astype(np.float32)
        scale = rng.random(512).astype(np.float32) + 0.2
        q = Normal(loc, scale)
        # Monte-Carlo estimate of KL(q || N(0,1))
        z = q.sample(jax.random.PRNGKey(0), (4000,))
        p = Normal(jnp.zeros(()), jnp.ones(()))
        mc = jnp.mean(q.log_prob(z) - p.log_prob(z), axis=0)
        np.testing.assert_allclose(q.kl_to_standard_normal(), mc, atol=0.2)

    def test_distributions_cross_jit(self):
        @jax.jit
        def f(loc):
            d = Normal(loc, jnp.ones_like(loc))
            return d, d.log_prob(loc)

        d, lp = f(jnp.arange(4.0))
        assert isinstance(d, Normal)
        np.testing.assert_allclose(lp, scipy.stats.norm.logpdf(0.0), rtol=1e-6)


class TestDiscretizedLogistic:
    def test_bins_sum_to_one(self):
        """Total mass over all 256 bin centers must be 1."""
        levels = 256
        centers = np.linspace(0.0, 1.0, levels, dtype=np.float32)
        d = DiscretizedLogistic(
            loc=jnp.float32(0.4), logscale=jnp.float32(-2.0),
            low=0.0, high=1.0, levels=256.0,
        )
        total = jnp.sum(jnp.exp(d.log_prob(centers)))
        np.testing.assert_allclose(float(total), 1.0, rtol=1e-5)

    def test_matches_openai_numerics(self):
        rng = np.random.default_rng(4)
        x = binned_random_pixels(rng, (8, 5, 5, 3))
        loc = rng.normal(size=(8, 5, 5, 3)).astype(np.float32)
        logscale = rng.normal(size=(8, 5, 5, 3)).astype(np.float32)
        d = DiscretizedLogistic(loc, logscale, low=0.0, high=1.0, levels=256.0)
        got = np.asarray(d.log_prob(x))
        want = openai_discretized_logistic_log_prob(
            x, loc, logscale, low=0.0, high=1.0, levels=256.0
        )
        _assert_log_probs_match(got, want)

    def test_approx_branch_engages_for_tiny_scale(self):
        # scale so small the CDF difference underflows away from the center
        d = DiscretizedLogistic(
            loc=jnp.float32(0.0), logscale=jnp.float32(-12.0),
            low=-1.0, high=1.0,
        )
        lp = d.log_prob(jnp.float32(0.5))
        assert np.isfinite(float(lp))
        assert float(lp) < -50.0  # far tail: tiny probability, not -inf

    def test_gradients_finite_everywhere(self):
        def loss(loc, logscale, x):
            d = DiscretizedLogistic(loc, logscale, low=-1.0, high=1.0)
            return jnp.sum(d.log_prob(x))

        x = jnp.array([-1.0, -0.5, 0.0, 0.999, 1.0], dtype=jnp.float32)
        loc = jnp.zeros(5)
        logscale = jnp.array([-12.0, -7.0, 0.0, 2.0, -3.0])
        g_loc, g_ls = jax.grad(loss, argnums=(0, 1))(loc, logscale, x)
        assert np.all(np.isfinite(g_loc)) and np.all(np.isfinite(g_ls))

    def test_sample_clipped_to_support(self):
        d = DiscretizedLogistic(
            loc=jnp.zeros((100,)), logscale=jnp.full((100,), 2.0),
            low=0.0, high=1.0,
        )
        s = d.sample(jax.random.PRNGKey(0), (10,))
        assert s.shape == (10, 100)
        assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0


class TestMixtureDiscretizedLogistic:
    def test_matches_openai_oracle(self):
        """Golden test against the independent PixelCNN++ formula, on binned
        random pixels — the reference's own validation scenario
        (/root/reference/utils/mdl.py:266-312)."""
        rng = np.random.default_rng(5)
        b, h, w = 5, 4, 4
        n_mix = 5
        x01 = binned_random_pixels(rng, (b, h, w, 3))
        params = rng.normal(size=(b, h, w, n_mix * 10)).astype(np.float32)

        d = MixtureDiscretizedLogistic(jnp.asarray(params))
        got = d.log_prob(jnp.asarray(x01))  # [b, h, w, 1]
        assert got.shape == (b, h, w, 1)

        want = openai_mix_logistic_log_prob(x01 * 2.0 - 1.0, params)
        # per-pixel log-prob sums 3 sub-pixel CDF-difference terms, each with
        # f32 cancellation noise near the tails (see _assert_log_probs_match)
        np.testing.assert_allclose(got[..., 0], want, rtol=1e-3, atol=2e-2)

    def test_leading_iwae_sample_dim_broadcasts(self):
        """params [k, b, h, w, n_mix*10] against x [b, h, w, 3] — the case the
        reference needed a dedicated wrapper for
        (/root/reference/utils/mdl_openai_iwae.py:37-67)."""
        rng = np.random.default_rng(6)
        k, b, h, w, n_mix = 3, 2, 4, 4, 5
        x01 = binned_random_pixels(rng, (b, h, w, 3))
        params = rng.normal(size=(k, b, h, w, n_mix * 10)).astype(np.float32)

        d = MixtureDiscretizedLogistic(jnp.asarray(params))
        got = d.log_prob(jnp.asarray(x01))
        assert got.shape == (k, b, h, w, 1)
        for i in range(k):
            want = openai_mix_logistic_log_prob(x01 * 2.0 - 1.0, params[i])
            np.testing.assert_allclose(got[i, ..., 0], want, rtol=1e-3, atol=2e-2)

    def test_sample_shape_and_range(self):
        rng = np.random.default_rng(7)
        params = rng.normal(size=(5, 4, 4, 50)).astype(np.float32)
        d = MixtureDiscretizedLogistic(jnp.asarray(params))
        s = d.sample(jax.random.PRNGKey(0), (7,))
        assert s.shape == (7, 5, 4, 4, 3)
        assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0

    def test_mean_is_mc_average(self):
        rng = np.random.default_rng(8)
        params = rng.normal(size=(2, 4, 4, 50)).astype(np.float32)
        d = MixtureDiscretizedLogistic(jnp.asarray(params))
        m = d.mean(jax.random.PRNGKey(0), n=100)
        assert m.shape == (2, 4, 4, 3)
        assert float(m.min()) >= 0.0 and float(m.max()) <= 1.0

    def test_gradients_finite(self):
        rng = np.random.default_rng(9)
        x01 = binned_random_pixels(rng, (2, 4, 4, 3))

        def loss(params):
            return jnp.sum(MixtureDiscretizedLogistic(params).log_prob(x01))

        params = jnp.asarray(rng.normal(size=(2, 4, 4, 50)).astype(np.float32))
        g = jax.grad(loss)(params)
        assert np.all(np.isfinite(g))


class TestPixelMixture:
    def test_shapes_and_support(self):
        rng = np.random.default_rng(10)
        b, h, w, n_mix = 5, 4, 4, 5
        x01 = binned_random_pixels(rng, (b, h, w, 3))
        params = rng.normal(size=(b, h, w, n_mix * 10)).astype(np.float32)
        d = PixelMixtureDiscretizedLogistic(jnp.asarray(params))
        lp = d.log_prob(jnp.asarray(x01))
        assert lp.shape == (b, h, w)
        assert np.all(np.isfinite(lp))
        s = d.sample(jax.random.PRNGKey(0), (11,))
        assert s.shape == (11, b, h, w, 3)
        assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0
        m = d.mean(jax.random.PRNGKey(1))
        assert m.shape == (b, h, w, 3)

    def test_leading_sample_dim(self):
        rng = np.random.default_rng(11)
        s, b, h, w, n_mix = 10, 6, 4, 4, 5
        x01 = binned_random_pixels(rng, (b, h, w, 3))
        params = rng.normal(size=(s, b, h, w, n_mix * 10)).astype(np.float32)
        d = PixelMixtureDiscretizedLogistic(jnp.asarray(params))
        assert d.log_prob(jnp.asarray(x01)).shape == (s, b, h, w)

    def test_observation_free_log_prob_differs_from_conditioned(self):
        """The two mixture variants must NOT coincide in general (the plain
        variant folds the autoregression into locs instead of conditioning on
        x, /root/reference/utils/mdl_plain.py:9-16)."""
        rng = np.random.default_rng(12)
        x01 = binned_random_pixels(rng, (3, 4, 4, 3))
        params = rng.normal(size=(3, 4, 4, 50)).astype(np.float32)
        a = MixtureDiscretizedLogistic(jnp.asarray(params)).log_prob(x01)[..., 0]
        b = PixelMixtureDiscretizedLogistic(jnp.asarray(params)).log_prob(x01)
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)


class TestDistributionTuple:
    def test_aliases_and_defaults(self):
        d = Normal(jnp.zeros(3), jnp.ones(3))
        t = DistributionTuple(d, jnp.ones(3), axes=(-1,))
        assert t.z is t.sample and t.x is t.sample
        assert t.p is d and t.q is d
        assert DistributionTuple(d).axes == (-1, -2, -3)

    def test_is_pytree(self):
        d = Normal(jnp.zeros(3), jnp.ones(3))
        t = DistributionTuple(d, jnp.ones(3), axes=(-1,))
        leaves = jax.tree_util.tree_leaves(t)
        assert len(leaves) == 3  # loc, scale, sample


class TestLogMeanExp:
    def test_matches_direct_computation(self):
        rng = np.random.default_rng(13)
        log_w = rng.normal(size=(5, 128)).astype(np.float32) * 10
        got = logmeanexp(jnp.asarray(log_w), axis=0)
        want = scipy.special.logsumexp(log_w, axis=0) - np.log(5.0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_no_overflow_for_large_values(self):
        log_w = jnp.array([[1000.0, -1000.0], [1001.0, -999.0]])
        out = logmeanexp(log_w, axis=0)
        assert np.all(np.isfinite(out))

    def test_streaming_equals_full(self):
        rng = np.random.default_rng(14)
        log_w = rng.normal(size=(40, 16)).astype(np.float32) * 5
        state = streaming_logmeanexp_init((16,))
        for chunk in np.split(log_w, 8, axis=0):
            state = streaming_logmeanexp_update(state, jnp.asarray(chunk), axis=0)
        got = streaming_logmeanexp_finalize(state)
        want = scipy.special.logsumexp(log_w, axis=0) - np.log(40.0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_gradient_is_softmax_weighting(self):
        log_w = jnp.array([0.0, 1.0, 2.0])
        g = jax.grad(lambda w: logmeanexp(w, axis=0))(log_w)
        np.testing.assert_allclose(g, jax.nn.softmax(log_w), rtol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
