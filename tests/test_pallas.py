"""Pallas kernel tests (interpret mode on CPU; the same code compiles via
Mosaic on TPU). Oracles are the jnp reference implementations, which are
themselves golden-tested against the OpenAI formulas in
tests/test_distributions.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.distributions.discretized import discretized_logistic_log_prob
from vae_mdl_tpu.distributions.mixture import mixture_log_prob
from vae_mdl_tpu.ops.pallas.dl_kernel import dl_log_prob
from vae_mdl_tpu.ops.pallas.mdl_kernel import mdl_log_prob


def _binned(key, shape, low=-1.0, high=1.0, levels=256):
    u = jax.random.randint(key, shape, 0, levels)
    return low + (high - low) * u.astype(jnp.float32) / (levels - 1)


class TestDLKernel:
    def test_matches_jnp_oracle(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        shape = (3, 2, 8, 8, 3)  # odd sizes exercise padding
        x = _binned(k1, shape)
        loc = jax.random.normal(k2, shape) * 0.5
        logscale = jax.random.normal(k3, shape) - 3.0

        got = dl_log_prob(x, loc, logscale, -1.0, 1.0, 2.0 / 255.0)
        want = discretized_logistic_log_prob(
            x, loc, logscale, low=-1.0, high=1.0, interval_width=2.0 / 255.0
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_edges_and_approx_branch(self):
        x = jnp.array([-1.0, 1.0, 0.0, 0.5])
        loc = jnp.array([0.0, 0.0, 8.0, 0.5])  # huge |x-loc| hits approx path
        logscale = jnp.array([-2.0, -2.0, -6.0, -7.0])
        got = dl_log_prob(x, loc, logscale, -1.0, 1.0, 2.0 / 255.0)
        want = discretized_logistic_log_prob(
            x, loc, logscale, low=-1.0, high=1.0, interval_width=2.0 / 255.0
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_gradients_match(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        shape = (4, 4, 3)
        x = _binned(k1, shape)
        loc = jax.random.normal(k2, shape) * 0.3
        logscale = jax.random.normal(k3, shape) - 2.0

        g_pallas = jax.grad(
            lambda l, s: dl_log_prob(x, l, s, -1.0, 1.0, 2.0 / 255.0).sum(),
            argnums=(0, 1),
        )(loc, logscale)
        g_ref = jax.grad(
            lambda l, s: discretized_logistic_log_prob(
                x, l, s, low=-1.0, high=1.0, interval_width=2.0 / 255.0
            ).sum(),
            argnums=(0, 1),
        )(loc, logscale)
        for a, b in zip(g_pallas, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestMDLKernel:
    @pytest.mark.parametrize("n_mix", [1, 5])
    def test_matches_jnp_oracle(self, n_mix):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        # leading importance-sample dim + batch, odd spatial size
        x01 = (_binned(k1, (2, 3, 6, 6, 3)) + 1.0) / 2.0
        params = jax.random.normal(k2, (2, 3, 6, 6, n_mix * 10))

        got = mdl_log_prob(x01, params)
        want = mixture_log_prob(x01, params)
        assert got.shape == want.shape == (2, 3, 6, 6, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x01 = (_binned(k1, (2, 4, 4, 3)) + 1.0) / 2.0
        params = jax.random.normal(k2, (2, 4, 4, 30))

        g_pallas = jax.grad(lambda p: mdl_log_prob(x01, p).sum())(params)
        g_ref = jax.grad(lambda p: mixture_log_prob(x01, p).sum())(params)
        np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_model05_with_pallas_flag(self):
        """End-to-end: model05 forward with use_pallas=True equals False."""
        import dataclasses

        from vae_mdl_tpu.models import MODELS, build_model, compute_loss
        from vae_mdl_tpu.models.vae import prior_for

        x = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 3))
        losses = []
        for flag in (False, True):
            cfg = dataclasses.replace(MODELS["model05"], use_pallas=flag)
            model = build_model(cfg)
            params = model.init(
                {"params": jax.random.PRNGKey(0),
                 "sample": jax.random.PRNGKey(1)}, x, 1
            )
            Qs, Ps, pxz = model.apply(
                params, x, 2, rngs={"sample": jax.random.PRNGKey(2)}
            )
            loss, _ = compute_loss(prior_for(cfg), Qs, Ps, pxz, x)
            losses.append(float(loss))
        assert losses[0] == pytest.approx(losses[1], rel=1e-5)
