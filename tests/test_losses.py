"""Tests for the IWAE/ELBO/hierarchical objectives.

Includes the reference's fake-model harness (random distributions, no
networks — /root/reference/tests/test_hierarchical_setup.py:61-98) plus
analytic checks the reference never had.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_mdl_tpu.distributions import (
    DiscretizedLogistic,
    DistributionTuple,
    Normal,
)
from vae_mdl_tpu.models.losses import (
    elbo_loss,
    hierarchical_iwae_loss,
    iwae_loss,
    two_layer_iwae_loss,
)


def _single_layer_setup(k=5, b=16, d=8, img=(6, 6, 1), seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    pz = Normal(jnp.zeros(()), jnp.ones(()), event_axes=(-1,))
    qzx = Normal(
        jax.random.normal(ks[0], (b, d)),
        jax.nn.softplus(jax.random.normal(ks[1], (b, d))) + 0.1,
        event_axes=(-1,),
    )
    z = qzx.sample(ks[2], (k,))
    x = jax.random.uniform(ks[3], (b, *img))
    pxz = Normal(
        jax.random.normal(ks[4], (k, b, *img)),
        jnp.ones((k, b, *img)),
        event_axes=(-1, -2, -3),
    )
    return x, z, pz, qzx, pxz


class TestIWAELoss:
    def test_metrics_keys_parity(self):
        """Same metrics dict contents as the reference
        (/root/reference/models/loss.py:48-55)."""
        x, z, pz, qzx, pxz = _single_layer_setup()
        loss, m = iwae_loss(x, z, pz, qzx, pxz)
        # reference keys plus the ESS diagnostic extension
        assert set(m) == {"iwae_elbo", "bpd", "lpxz", "lqzx", "lpz", "kl",
                          "ess"}
        assert np.isfinite(float(loss))
        np.testing.assert_allclose(float(loss), -float(m["iwae_elbo"]), rtol=1e-6)

    def test_bpd_formula(self):
        x, z, pz, qzx, pxz = _single_layer_setup(img=(6, 6, 1))
        _, m = iwae_loss(x, z, pz, qzx, pxz)
        want = -float(m["iwae_elbo"]) / (math.log(2.0) * 36)
        np.testing.assert_allclose(float(m["bpd"]), want, rtol=1e-6)

    def test_k1_iwae_equals_elbo(self):
        x, z, pz, qzx, pxz = _single_layer_setup(k=1)
        l_iwae, _ = iwae_loss(x, z, pz, qzx, pxz)
        l_elbo, _ = elbo_loss(x, z, pz, qzx, pxz)
        np.testing.assert_allclose(float(l_iwae), float(l_elbo), rtol=1e-5)

    def test_iwae_tighter_than_elbo(self):
        """For k>1 the IWAE bound dominates the ELBO (Burda et al. 2015)."""
        x, z, pz, qzx, pxz = _single_layer_setup(k=32, seed=3)
        l_iwae, _ = iwae_loss(x, z, pz, qzx, pxz)
        l_elbo, _ = elbo_loss(x, z, pz, qzx, pxz)
        assert float(l_iwae) <= float(l_elbo) + 1e-5

    def test_recovers_true_loglik_linear_gaussian(self):
        """Analytic end-to-end check: x = z + eps with z~N(0,1),
        eps~N(0,s^2): marginal is N(0, 1+s^2). With q = exact posterior the
        IWAE bound is exact for ANY k."""
        b, k, s = 64, 1, 0.5
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (b, 1)) * math.sqrt(1 + s * s)
        # exact posterior: N(x/(1+s^2), s^2/(1+s^2))
        post_var = s * s / (1 + s * s)
        qzx = Normal(x / (1 + s * s), jnp.full((b, 1), math.sqrt(post_var)), event_axes=(-1,))
        z = qzx.sample(jax.random.PRNGKey(2), (k,))
        pz = Normal(jnp.zeros(()), jnp.ones(()), event_axes=(-1,))
        pxz = Normal(z, jnp.full_like(z, s), event_axes=(-1,))
        # treat x as a [b, 1] "image" with a single event dim
        loss, m = iwae_loss(x, z, pz, qzx, Normal(z, jnp.full_like(z, s), event_axes=(-1,)))
        want = float(
            jnp.mean(
                Normal(jnp.zeros(()), jnp.full((), math.sqrt(1 + s * s))).log_prob(x).sum(-1)
            )
        )
        np.testing.assert_allclose(float(m["iwae_elbo"]), want, rtol=1e-4, atol=1e-4)

    def test_beta_scales_kl_term_only(self):
        x, z, pz, qzx, pxz = _single_layer_setup(k=1)
        l1, m1 = iwae_loss(x, z, pz, qzx, pxz, beta=0.0)
        # beta=0: bound reduces to mean lpxz
        want = float(jnp.mean(m1["lpxz"]))
        np.testing.assert_allclose(-float(l1), want, rtol=1e-5)

    def test_differentiable(self):
        def f(mu):
            x, z, pz, qzx, pxz = _single_layer_setup(k=3)
            pxz = Normal(pxz.loc + mu, pxz.scale, event_axes=(-1, -2, -3))
            loss, _ = iwae_loss(x, z, pz, qzx, pxz)
            return loss

        g = jax.grad(f)(jnp.float32(0.1))
        assert np.isfinite(float(g))


class TestHierarchical:
    def _two_layer_setup(self, k=4, b=8, d=5, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 10)
        x = jnp.floor(jax.random.uniform(ks[0], (b, 8, 8, 3)) * 256) / 255.0

        q1 = Normal(jax.random.normal(ks[1], (b, d)), jnp.exp(jax.random.normal(ks[2], (b, d)) * 0.1), event_axes=(-1,))
        z1 = q1.sample(ks[3], (k,))
        qz1x = DistributionTuple(q1, z1, axes=(-1,))

        q2 = Normal(jax.random.normal(ks[4], (k, b, d)), jnp.exp(jax.random.normal(ks[5], (k, b, d)) * 0.1), event_axes=(-1,))
        z2 = q2.sample(ks[6])
        qz2z1 = DistributionTuple(q2, z2, axes=(-1,))

        pz1z2 = DistributionTuple(
            Normal(jax.random.normal(ks[7], (k, b, d)), jnp.ones((k, b, d)), event_axes=(-1,)),
            None, axes=(-1,),
        )
        pxz1 = DistributionTuple(
            DiscretizedLogistic(
                jax.random.normal(ks[8], (k, b, 8, 8, 3)),
                jax.random.normal(ks[9], (k, b, 8, 8, 3)) * 0.3,
                low=0.0, high=1.0,
            ),
            None, axes=(-1, -2, -3),
        )
        pz = Normal(jnp.zeros(()), jnp.ones(()), event_axes=(-1,))
        return x, pz, qz1x, qz2z1, pz1z2, pxz1

    def test_two_layer_metrics_parity(self):
        """Metric keys as /root/reference/models/model06.py:62-72."""
        x, pz, qz1x, qz2z1, pz1z2, pxz1 = self._two_layer_setup()
        loss, m = two_layer_iwae_loss(x, pz, qz1x, qz2z1, pz1z2, pxz1)
        assert set(m) == {
            "iwae_elbo", "bpd", "lpxz", "lqz1x", "lqz2z1",
            "lpz2", "lpz1z2", "kl1", "kl2", "ess",
        }
        assert np.isfinite(float(loss))

    def test_generic_matches_two_layer(self):
        """The L-layer loss with L=2 must equal the spelled-out version."""
        x, pz, qz1x, qz2z1, pz1z2, pxz1 = self._two_layer_setup()
        want, _ = two_layer_iwae_loss(x, pz, qz1x, qz2z1, pz1z2, pxz1)
        got, m = hierarchical_iwae_loss(
            x,
            Qs={1: qz1x, 2: qz2z1},
            Ps={1: pz1z2},
            pxz=pxz1,
            prior=DistributionTuple(pz, None, axes=(-1,)),
        )
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_generic_accepts_sequences(self):
        x, pz, qz1x, qz2z1, pz1z2, pxz1 = self._two_layer_setup()
        a, _ = hierarchical_iwae_loss(
            x, {1: qz1x, 2: qz2z1}, {1: pz1z2}, pxz1,
            DistributionTuple(pz, None, axes=(-1,)),
        )
        b, _ = hierarchical_iwae_loss(
            x, [qz1x, qz2z1], [pz1z2], pxz1,
            DistributionTuple(pz, None, axes=(-1,)),
        )
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    def test_three_layer_fake_model_harness(self):
        """Port of the reference's fake-model scenario
        (/root/reference/tests/test_hierarchical_setup.py:61-98): random
        spatial Normal layers with halving resolution, DL observation."""
        s, b, h, w, c = 5, 16, 32, 32, 3
        ks = jax.random.split(jax.random.PRNGKey(7), 20)
        x = jax.random.uniform(ks[0], (b, h, w, c))

        pxz = DistributionTuple(
            DiscretizedLogistic(
                jax.random.uniform(ks[1], (s, b, h, w, c)),
                jax.random.normal(ks[2], (s, b, h, w, c)),
            ),
            None, axes=(-1, -2, -3),
        )
        prior = DistributionTuple(
            Normal(jnp.zeros(()), jnp.ones(()), event_axes=(-1, -2, -3)),
            None, axes=(-1, -2, -3),
        )

        Qs, Ps = {}, {}
        n_layers = 3
        hh, ww = h, w
        for i in range(1, n_layers + 1):
            hh, ww = hh // 2, ww // 2
            q = Normal(
                jax.random.normal(ks[3 * i], (s, b, hh, ww, c)),
                jnp.exp(jax.random.normal(ks[3 * i + 1], (s, b, hh, ww, c)) * 0.2),
                event_axes=(-1, -2, -3),
            )
            Qs[i] = DistributionTuple(q, q.sample(ks[3 * i + 2]), axes=(-1, -2, -3))
            if i < n_layers:
                Ps[i] = DistributionTuple(
                    Normal(
                        jax.random.normal(ks[3 * i + 9], (s, b, hh, ww, c)),
                        jnp.exp(jax.random.normal(ks[3 * i + 10], (s, b, hh, ww, c)) * 0.2),
                        event_axes=(-1, -2, -3),
                    ),
                    None, axes=(-1, -2, -3),
                )

        loss, m = hierarchical_iwae_loss(x, Qs, Ps, pxz, prior)
        assert np.isfinite(float(loss))
        assert len(m["kl"]) == n_layers
        assert all(np.all(np.isfinite(np.asarray(k))) for k in m["kl"])

    def test_jit_compatible(self):
        x, pz, qz1x, qz2z1, pz1z2, pxz1 = self._two_layer_setup()

        @jax.jit
        def f(x, qz1x, qz2z1, pz1z2, pxz1):
            pz = Normal(jnp.zeros(()), jnp.ones(()), event_axes=(-1,))
            return two_layer_iwae_loss(x, pz, qz1x, qz2z1, pz1z2, pxz1)[0]

        assert np.isfinite(float(f(x, qz1x, qz2z1, pz1z2, pxz1)))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_beta_scales_kl_at_every_depth():
    """Regression: beta must reach the bound at depths 1, 2, and 3 (depth 2
    previously ignored it)."""
    import jax
    import jax.numpy as jnp

    from vae_mdl_tpu.models import MODELS, build_model, compute_loss
    from vae_mdl_tpu.models.vae import prior_for
    import dataclasses

    for name, depth in (("model01", 1), ("model06", 2)):
        cfg = dataclasses.replace(MODELS[name], n_stochastic=depth)
        model = build_model(cfg)
        h, w, c = cfg.image_shape
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, h, w, c))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            x, 1,
        )
        Qs, Ps, pxz = model.apply(params, x, 3,
                                  rngs={"sample": jax.random.PRNGKey(2)})
        prior = prior_for(cfg)
        l1, _ = compute_loss(prior, Qs, Ps, pxz, x, beta=1.0)
        l0, _ = compute_loss(prior, Qs, Ps, pxz, x, beta=0.0)
        assert not jnp.allclose(l0, l1), f"beta ignored at depth {depth}"


def test_elbo_objective_at_any_depth():
    """objective='elbo' trains the plain bound; equals iwae at k=1."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vae_mdl_tpu.models import MODELS, build_model, compute_loss
    from vae_mdl_tpu.models.vae import prior_for

    cfg = MODELS["model06"]
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, 1
    )
    prior = prior_for(cfg)

    # k=1: iwae == elbo exactly
    Qs, Ps, pxz = model.apply(params, x, 1, rngs={"sample": jax.random.PRNGKey(2)})
    li, _ = compute_loss(prior, Qs, Ps, pxz, x, objective="iwae")
    le, _ = compute_loss(prior, Qs, Ps, pxz, x, objective="elbo")
    assert jnp.allclose(li, le, rtol=1e-5)

    # k>1: elbo <= iwae bound (iwae loss <= elbo loss)
    Qs, Ps, pxz = model.apply(params, x, 4, rngs={"sample": jax.random.PRNGKey(3)})
    li, _ = compute_loss(prior, Qs, Ps, pxz, x, objective="iwae")
    le, _ = compute_loss(prior, Qs, Ps, pxz, x, objective="elbo")
    assert float(li) <= float(le) + 1e-4


def test_effective_sample_size_bounds():
    import jax.numpy as jnp
    import numpy as np

    from vae_mdl_tpu.models.losses import effective_sample_size

    # uniform weights -> ESS == k
    k = 8
    lw = jnp.zeros((k, 3))
    np.testing.assert_allclose(np.asarray(effective_sample_size(lw)), k,
                               rtol=1e-6)
    # one dominant weight -> ESS ~ 1
    lw = jnp.zeros((k, 1)).at[0, 0].set(100.0)
    assert float(effective_sample_size(lw)[0]) == pytest.approx(1.0, abs=1e-4)
    # invariance to additive shifts of log weights
    lw = jnp.asarray(np.random.default_rng(0).normal(size=(k, 4)))
    a = effective_sample_size(lw)
    b = effective_sample_size(lw + 123.4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
