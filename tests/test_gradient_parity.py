"""Full-model loss + gradient parity against live TF mirrors.

The suite already pins (a) the likelihood numerics — values AND gradients —
against the reference's literal TF formulas (tests/test_tf_reference_oracle.py)
and (b) full-model FORWARD passes against live Keras mirrors with imported
weights (tests/test_import_reference.py). This module closes the last gap
between "forward-exact" and "training-equivalent": the ENTIRE differentiable
training program — encoder -> reparameterised k-sample -> decoder ->
likelihood -> IWAE bound (/root/reference/models/loss.py:26-55 single layer,
models/model06.py:38-72 two layers) — evaluated with IDENTICAL weights (via
the reference-checkpoint interop) and IDENTICAL injected noise, must produce
the same loss and the same per-parameter gradients under ``tf.GradientTape``
(Keras mirrors + the reference's TF likelihood numerics) and ``jax.grad``
(the framework's actual flax modules + ``iwae_loss``/``two_layer_iwae_loss``).

What only this layer can catch: gradient-path divergence anywhere in the
composed program — a stop-gradient difference, an activation whose value
matches but whose derivative doesn't (the exact-vs-tanh gelu class), a std
transform applied on one side of the reparameterisation but not the other,
or a loss-assembly error that cancels in forward value comparisons.

Gradients are compared leaf-for-leaf through the SAME mapping tables the
weight import uses (``_mapping_for``): the deconv kernel transform is a pure
element permutation (transpose(0,1,3,2) + spatial flips), so TF gradients
map onto flax gradients under the identical ``_transform_kernel``.

Noise injection: sampling is replaced by explicit reparameterisation
``z = mu + std * eps`` with a fixed numpy ``eps`` on both sides — the one
part of the program that cannot be shared — so agreement pins everything
else. Tolerances follow tests/test_tf_reference_oracle.py: TF and XLA:CPU
differ in last-ulp libm; rel-RMS over each gradient tensor separates libm noise from any real
formula error (orders of magnitude larger). For the discretized heads one
more legitimate divergence source exists: pixels whose bin probability sits
AT the 1e-5 approximation-switch threshold can pick different branches in
TF vs XLA from last-ulp ``cdf_delta`` differences, and the branch switch
changes that element's gradient discontinuously — both sides are correct,
so the conv-model tolerance (5e-3 rel-RMS) budgets for a few such flips
while still failing hard on any systematic error (a wrong activation
derivative or a missed kernel transform measures >>1e-1 here).

Skipped when TF is absent, like the other TF-backed layers.
"""
from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_import_reference import (  # noqa: E402
    _BasicBlock06,
    _Dec05,
    _Enc05,
    _entries06,
    _entries01,
    _entries_conv,
    _init_params,
    _model01_ckpt,
    _Ref05,
    _write_ref_ckpt,
)
from test_tf_reference_oracle import (  # noqa: E402
    rel_rms,
    tf_dl_log_prob,
    tf_modl_log_prob,
)

from vae_mdl_tpu.distributions import Normal  # noqa: E402
from vae_mdl_tpu.models.losses import iwae_loss  # noqa: E402
from vae_mdl_tpu.models.zoo import MODEL01, MODEL05, MODEL06  # noqa: E402
from vae_mdl_tpu.utils.import_reference import (  # noqa: E402
    _leaves_by_path,
    _mapping_for,
    _transform_kernel,
    load_reference_weights,
)

_LOG_2PI = np.float32(np.log(2.0 * np.pi))


def _tf_normal_lp(z, mu, std):
    """Normal log-density, the framework's exact form
    (distributions/continuous.py Normal.log_prob)."""
    s = (z - mu) / std
    return -0.5 * (s * s + _LOG_2PI) - tf.math.log(std)


def _tf_iwae(log_w, k):
    """-mean_B(logmeanexp_k(log_w)) — models/loss.py:37."""
    return -tf.reduce_mean(
        tf.reduce_logsumexp(log_w, axis=0) - tf.math.log(np.float32(k)))


def _assert_grads_match(mapping, entries, tf_grads, jax_grads, tol):
    """Leaf-for-leaf gradient comparison through the import mapping.

    ``tf_grads``: {ref_base: [g_kernel, g_bias]}; ``jax_grads``: the grad
    pytree matching the params template. The deconv kernel transform is an
    element permutation, so gradients convert with the same function."""
    leaves = _leaves_by_path(jax_grads)
    assert set(entries) == {base for base, _ in mapping.values()}
    for flax_path, (ref_base, kind) in mapping.items():
        gk_tf, gb_tf = tf_grads[ref_base]
        gk = leaves[("params",) + flax_path + ("kernel",)]
        gb = leaves[("params",) + flax_path + ("bias",)]
        want_k = _transform_kernel(kind, gk_tf.numpy())
        assert rel_rms(gk, want_k) < tol, f"kernel grad diverges: {flax_path}"
        assert rel_rms(gb, gb_tf.numpy()) < tol, f"bias grad diverges: {flax_path}"


def _grad_targets(entries):
    return {base: [layer.kernel, layer.bias]
            for base, layer in entries.items()}


def test_model01_loss_and_grad_parity(tmp_path):
    """MLP + Bernoulli (model01.py): the full single-layer IWAE program."""
    # Keras layer init consumes a GLOBAL TF RNG: pin it so the
    # mirror's weight draw (and so the comparison's conditioning)
    # cannot depend on whatever Keras work ran earlier in the suite
    tf.keras.utils.set_random_seed(10)
    rng = np.random.default_rng(0)
    B, k, nz = 4, 3, 100
    x = rng.integers(0, 2, (B, 28, 28, 1)).astype(np.float32)  # binarized
    eps = rng.standard_normal((k, B, nz)).astype(np.float32)

    prefix, ref = _model01_ckpt(tmp_path, x)
    model, params = _init_params(MODEL01, jnp.asarray(x))
    params = load_reference_weights(prefix, "model01", params)

    # --- TF: mirrors + the reference's loss assembly under a tape ---
    entries = _entries01(ref)
    with tf.GradientTape() as tape:
        mu, std_raw = ref.encoder(tf.constant(x))  # lstd has exp activation
        std = std_raw + 1e-6  # model01.py:85 (+ our MLPBlock.std_eps)
        z = mu[None] + std[None] * tf.constant(eps)  # [k,B,nz]
        logits = tf.reshape(
            ref.decoder(tf.reshape(z, [k * B, nz])), [k, B, 28, 28, 1])
        xk = tf.constant(x)[None]
        lpxz = tf.reduce_sum(
            xk * logits - tf.nn.softplus(logits), axis=[-1, -2, -3])
        lqzx = tf.reduce_sum(_tf_normal_lp(z, mu[None], std[None]), axis=-1)
        lpz = tf.reduce_sum(_tf_normal_lp(z, 0.0, 1.0), axis=-1)
        loss_tf = _tf_iwae(lpxz + lpz - lqzx, k)
    tf_grads = tape.gradient(loss_tf, _grad_targets(entries))

    # --- JAX: the framework's modules + its actual iwae_loss ---
    def loss_fn(p):
        q = model.apply(p, jnp.asarray(x), method=lambda m, a: m.encoder(a))
        z_j = q.loc + q.scale * jnp.asarray(eps)
        obs = model.apply(p, z_j, method=lambda m, a: m.decoder(a))
        pz = Normal(jnp.zeros((nz,)), jnp.ones((nz,)), event_axes=(-1,))
        loss, _ = iwae_loss(jnp.asarray(x), z_j, pz, q, obs)
        return loss

    loss_jx, g = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_jx), float(loss_tf),
                               rtol=1e-5, atol=1e-5)
    _assert_grads_match(_mapping_for("model01", params), entries,
                        tf_grads, g, tol=1e-4)


def test_model01_three_adam_steps_match_keras(tmp_path):
    """Optimizer-step parity: THREE full train steps (grads + Adam update)
    with ``optimizer: "adam_keras"`` reproduce ``tf.keras.optimizers.Adam``
    weight-for-weight. With the loss/gradient parity above this pins the
    complete training recursion — the reference's exact Adam formulation
    (lr_t bias folding, eps=1e-7 on the uncorrected sqrt(v), model01.py:125)
    including its time-dependent bias correction, which a single step would
    not distinguish from optax.adam."""
    import optax

    from vae_mdl_tpu.train.state import keras_adam

    # Keras layer init consumes a GLOBAL TF RNG: pin it so the
    # mirror's weight draw (and so the comparison's conditioning)
    # cannot depend on whatever Keras work ran earlier in the suite
    tf.keras.utils.set_random_seed(42)
    rng = np.random.default_rng(3)
    B, k, nz = 4, 2, 100
    x = rng.integers(0, 2, (B, 28, 28, 1)).astype(np.float32)
    eps = rng.standard_normal((3, k, B, nz)).astype(np.float32)  # per step

    prefix, ref = _model01_ckpt(tmp_path, x)
    entries = _entries01(ref)
    model, params = _init_params(MODEL01, jnp.asarray(x))
    params = load_reference_weights(prefix, "model01", params)

    # --- TF: three steps with the reference's optimizer ---
    opt = tf.keras.optimizers.Adam(learning_rate=1e-3)
    targets = _grad_targets(entries)
    variables = [v for pair in targets.values() for v in pair]
    w_init_tf = {id(v): v.numpy().copy() for v in variables}
    for s in range(3):
        with tf.GradientTape() as tape:
            mu, std_raw = ref.encoder(tf.constant(x))
            std = std_raw + 1e-6
            z = mu[None] + std[None] * tf.constant(eps[s])
            logits = tf.reshape(
                ref.decoder(tf.reshape(z, [k * B, nz])), [k, B, 28, 28, 1])
            xk = tf.constant(x)[None]
            lpxz = tf.reduce_sum(
                xk * logits - tf.nn.softplus(logits), axis=[-1, -2, -3])
            lqzx = tf.reduce_sum(
                _tf_normal_lp(z, mu[None], std[None]), axis=-1)
            lpz = tf.reduce_sum(_tf_normal_lp(z, 0.0, 1.0), axis=-1)
            loss_tf = _tf_iwae(lpxz + lpz - lqzx, k)
        opt.apply_gradients(zip(tape.gradient(loss_tf, variables), variables))

    # --- JAX: three steps with keras_adam ---
    def loss_fn(p, eps_s):
        q = model.apply(p, jnp.asarray(x), method=lambda m, a: m.encoder(a))
        z_j = q.loc + q.scale * eps_s
        obs = model.apply(p, z_j, method=lambda m, a: m.decoder(a))
        pz = Normal(jnp.zeros((nz,)), jnp.ones((nz,)), event_axes=(-1,))
        loss, _ = iwae_loss(jnp.asarray(x), z_j, pz, q, obs)
        return loss

    params0 = params
    tx = keras_adam(learning_rate=1e-3)
    opt_state = tx.init(params)
    for s in range(3):
        g = jax.grad(loss_fn)(params, jnp.asarray(eps[s]))
        updates, opt_state = tx.update(g, opt_state)
        params = optax.apply_updates(params, updates)

    # compare the accumulated weight DELTAS (the optimizer's actual output;
    # absolute weights would drown updates ~1e-3 in magnitudes ~1e-1).
    # Measured discrimination: keras_adam lands at 1.1e-4 rel-RMS of the TF
    # deltas (pure TF-vs-XLA gradient noise) while optax.adam — the nearest
    # WRONG formulation, differing only in eps value and placement —
    # measures 2.0e-3; 5e-4 separates them with >4x margin each way.
    leaves = _leaves_by_path(params)
    leaves0 = _leaves_by_path(params0)
    mapping = _mapping_for("model01", params)
    for flax_path, (ref_base, _kind) in mapping.items():
        layer = entries[ref_base]
        for pname in ("kernel", "bias"):
            key = ("params",) + flax_path + (pname,)
            got = np.asarray(leaves[key]) - np.asarray(leaves0[key])
            var = getattr(layer, pname)
            want = var.numpy() - w_init_tf[id(var)]
            assert rel_rms(got, want) < 5e-4, (
                f"{flax_path}/{pname} diverges after 3 Adam steps")


def test_model05_loss_and_grad_parity(tmp_path):
    """Conv + deconv + MoDL head (model05.py): gradients flow through the
    Conv2DTranspose weight transform and the mixture likelihood's
    double-where branch structure."""
    # Keras layer init consumes a GLOBAL TF RNG: pin it so the
    # mirror's weight draw (and so the comparison's conditioning)
    # cannot depend on whatever Keras work ran earlier in the suite
    tf.keras.utils.set_random_seed(11)
    rng = np.random.default_rng(1)
    B, k, nz = 2, 2, 20
    x = (rng.integers(0, 256, (B, 32, 32, 3)).astype(np.float32) / 255.0)
    eps = rng.standard_normal((k, B, nz)).astype(np.float32)

    ref = _Ref05()
    ref(tf.constant(x))  # build
    entries = _entries_conv(ref.encoder, ref.decoder)
    prefix = str(tmp_path / "best")
    _write_ref_ckpt(prefix, entries)
    model, params = _init_params(MODEL05, jnp.asarray(x))
    params = load_reference_weights(prefix, "model05", params)

    x_rep = np.broadcast_to(x, (k,) + x.shape).reshape((-1,) + x.shape[1:])
    with tf.GradientTape() as tape:
        mu, logstd = ref.encoder(tf.constant(x))
        std = tf.nn.softplus(logstd)  # model05.py:50 / nn.encoders
        z = mu[None] + std[None] * tf.constant(eps)  # [k,B,nz]
        head = ref.decoder(tf.reshape(z, [k * B, nz]))  # [kB,32,32,50]
        lp_pix = tf_modl_log_prob(tf.constant(2.0 * x_rep - 1.0), head)
        lpxz = tf.reduce_sum(tf.reshape(lp_pix, [k, B, 32, 32]), axis=[-1, -2])
        lqzx = tf.reduce_sum(_tf_normal_lp(z, mu[None], std[None]), axis=-1)
        lpz = tf.reduce_sum(_tf_normal_lp(z, 0.0, 1.0), axis=-1)
        loss_tf = _tf_iwae(lpxz + lpz - lqzx, k)
    tf_grads = tape.gradient(loss_tf, _grad_targets(entries))

    def loss_fn(p):
        q = model.apply(p, jnp.asarray(x), method=lambda m, a: m.encoder(a))
        z_j = q.loc + q.scale * jnp.asarray(eps)
        obs = model.apply(p, z_j, method=lambda m, a: m.decoder(a))
        pz = Normal(jnp.zeros((nz,)), jnp.ones((nz,)), event_axes=(-1,))
        loss, _ = iwae_loss(jnp.asarray(x), z_j, pz, q, obs)
        return loss

    loss_jx, g = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_jx), float(loss_tf),
                               rtol=1e-5, atol=5e-4)
    _assert_grads_match(_mapping_for("model05", params), entries,
                        tf_grads, g, tol=5e-3)


def test_model02_loss_and_grad_parity(tmp_path):
    """Conv + Gaussian obs (model02.py): completes the likelihood-family
    matrix (bernoulli 01 / gaussian 02 / dl 06 / mdl 05). The Gaussian head
    is Normal(mu, exp(logstd)) on the split decoder output
    (model02.py:90-93 / nn.decoders.make_observation)."""
    from vae_mdl_tpu.models.zoo import MODEL02

    # Keras layer init consumes a GLOBAL TF RNG: pin it so the
    # mirror's weight draw (and so the comparison's conditioning)
    # cannot depend on whatever Keras work ran earlier in the suite
    tf.keras.utils.set_random_seed(13)
    rng = np.random.default_rng(4)
    B, k, nz = 2, 2, 20
    x = (rng.integers(0, 256, (B, 32, 32, 3)).astype(np.float32) / 255.0)
    eps = rng.standard_normal((k, B, nz)).astype(np.float32)

    enc = _Enc05(n_latent=nz)  # relu conv skeleton, model02.py:32-47
    dec = _Dec05(n_head=6)  # model02's 6-channel (mu, logstd) head
    enc(tf.constant(x))
    dec(tf.constant(np.zeros((1, nz), np.float32)))  # build
    entries = _entries_conv(enc, dec)
    prefix = str(tmp_path / "best")
    _write_ref_ckpt(prefix, entries)
    model, params = _init_params(MODEL02, jnp.asarray(x))
    params = load_reference_weights(prefix, "model02", params)

    x_rep = np.broadcast_to(x, (k,) + x.shape)
    with tf.GradientTape() as tape:
        mu, logstd = enc(tf.constant(x))
        std = tf.nn.softplus(logstd)
        z = mu[None] + std[None] * tf.constant(eps)  # [k,B,nz]
        head = tf.reshape(dec(tf.reshape(z, [k * B, nz])),
                          [k, B, 32, 32, 6])
        mu_x, ls_x = tf.split(head, 2, axis=-1)
        lpxz = tf.reduce_sum(
            _tf_normal_lp(tf.constant(x_rep), mu_x, tf.exp(ls_x)),
            axis=[-1, -2, -3])
        lqzx = tf.reduce_sum(_tf_normal_lp(z, mu[None], std[None]), axis=-1)
        lpz = tf.reduce_sum(_tf_normal_lp(z, 0.0, 1.0), axis=-1)
        loss_tf = _tf_iwae(lpxz + lpz - lqzx, k)
    tf_grads = tape.gradient(loss_tf, _grad_targets(entries))

    def loss_fn(p):
        q = model.apply(p, jnp.asarray(x), method=lambda m, a: m.encoder(a))
        z_j = q.loc + q.scale * jnp.asarray(eps)
        obs = model.apply(p, z_j, method=lambda m, a: m.decoder(a))
        pz = Normal(jnp.zeros((nz,)), jnp.ones((nz,)), event_axes=(-1,))
        loss, _ = iwae_loss(jnp.asarray(x), z_j, pz, q, obs)
        return loss

    loss_jx, g = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_jx), float(loss_tf),
                               rtol=1e-5, atol=5e-4)
    _assert_grads_match(_mapping_for("model02", params), entries,
                        tf_grads, g, tol=1e-3)


def test_model06_loss_and_grad_parity(tmp_path):
    """Two stochastic layers + DL obs (model06.py): the hierarchical bound
    (model06.py:38-72) end to end, including the exact (erf) gelu's
    DERIVATIVE — the drift class the forward-only mirror tests caught by
    value; here a tanh-approximate gelu would diverge in every conv grad."""
    from vae_mdl_tpu.models.losses import two_layer_iwae_loss
    from vae_mdl_tpu.distributions import DistributionTuple

    # Keras layer init consumes a GLOBAL TF RNG: pin it so the
    # mirror's weight draw (and so the comparison's conditioning)
    # cannot depend on whatever Keras work ran earlier in the suite
    tf.keras.utils.set_random_seed(12)
    rng = np.random.default_rng(2)
    B, k, nz = 2, 2, 20
    x = (rng.integers(0, 256, (B, 32, 32, 3)).astype(np.float32) / 255.0)
    eps1 = rng.standard_normal((k, B, nz)).astype(np.float32)
    eps2 = rng.standard_normal((k, B, nz)).astype(np.float32)

    enc = _Enc05(n_latent=nz, act=tf.nn.gelu)
    dec = _Dec05(n_head=6, act=tf.nn.gelu)
    mlp_enc = _BasicBlock06(100, nz)
    mlp_dec = _BasicBlock06(100, nz)
    enc(tf.constant(x))
    dec(tf.constant(np.zeros((1, nz), np.float32)))
    mlp_enc(tf.constant(np.zeros((1, nz), np.float32)))
    mlp_dec(tf.constant(np.zeros((1, nz), np.float32)))
    entries = _entries06(enc, dec, mlp_enc, mlp_dec)
    prefix = str(tmp_path / "best")
    _write_ref_ckpt(prefix, entries)

    model, params = _init_params(MODEL06, jnp.asarray(x))
    params = load_reference_weights(prefix, "model06", params)

    x_rep = np.broadcast_to(x, (k,) + x.shape).reshape((-1,) + x.shape[1:])
    with tf.GradientTape() as tape:
        mu1, ls1 = enc(tf.constant(x))
        std1 = tf.nn.softplus(ls1)
        z1 = mu1[None] + std1[None] * tf.constant(eps1)  # [k,B,nz]
        z1m = tf.reshape(z1, [k * B, nz])

        mu2, std2_raw = mlp_enc(z1m)  # lstd Dense has softplus activation
        std2 = std2_raw + 1e-6  # model06.py:95 (+ MLPBlock.std_eps)
        z2m = mu2 + std2 * tf.reshape(tf.constant(eps2), [k * B, nz])

        pmu1, pstd1_raw = mlp_dec(z2m)  # p(z1 | z2)
        pstd1 = pstd1_raw + 1e-6

        head = dec(z1m)  # [kB,32,32,6]
        mu_x, ls_x = tf.split(head, 2, axis=-1)
        lp_pix = tf_dl_log_prob(tf.constant(x_rep), mu_x, ls_x,
                                0.0, 1.0, 256.0)
        lpxz = tf.reduce_sum(tf.reshape(lp_pix, [k, B, 32, 32, 3]),
                             axis=[-1, -2, -3])

        lqz1x = tf.reduce_sum(_tf_normal_lp(z1, mu1[None], std1[None]), -1)
        lqz2z1 = tf.reshape(
            tf.reduce_sum(_tf_normal_lp(z2m, mu2, std2), -1), [k, B])
        lpz2 = tf.reshape(
            tf.reduce_sum(_tf_normal_lp(z2m, 0.0, 1.0), -1), [k, B])
        lpz1z2 = tf.reshape(
            tf.reduce_sum(_tf_normal_lp(z1m, pmu1, pstd1), -1), [k, B])

        # model06.py:47
        loss_tf = _tf_iwae(lpxz + (lpz2 - lqz2z1) + (lpz1z2 - lqz1x), k)
    tf_grads = tape.gradient(loss_tf, _grad_targets(entries))

    def loss_fn(p):
        q1 = model.apply(p, jnp.asarray(x), method=lambda m, a: m.encoder(a))
        z1_j = q1.loc + q1.scale * jnp.asarray(eps1)
        q2 = model.apply(p, z1_j,
                         method=lambda m, a: m.mlp_encoders[0](a))
        z2_j = q2.loc + q2.scale * jnp.asarray(eps2)
        p1 = model.apply(p, z2_j,
                         method=lambda m, a: m.mlp_decoders[0](a))
        obs = model.apply(p, z1_j, method=lambda m, a: m.decoder(a))
        pz = Normal(jnp.zeros((nz,)), jnp.ones((nz,)), event_axes=(-1,))
        loss, _ = two_layer_iwae_loss(
            jnp.asarray(x),
            pz,
            qz1x=DistributionTuple(q1, z1_j, axes=(-1,)),
            qz2z1=DistributionTuple(q2, z2_j, axes=(-1,)),
            pz1z2=DistributionTuple(p1, None, axes=(-1,)),
            pxz1=DistributionTuple(obs, None, axes=obs.event_axes),
        )
        return loss

    loss_jx, g = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_jx), float(loss_tf),
                               rtol=1e-5, atol=5e-4)
    _assert_grads_match(_mapping_for("model06", params), entries,
                        tf_grads, g, tol=5e-3)
