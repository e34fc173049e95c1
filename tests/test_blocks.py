"""NN building-block tests (the reference only has eyeball __main__ scripts,
modules/residual.py:39-94 etc.)."""
import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.nn import (
    GLU,
    DecoderBlock,
    EncoderBlock,
    MLPBlock,
    ResidualBlock,
    StochasticDecoderBlock,
    StochasticEncoderBlock,
    merge_leading,
)

K1, K2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)


def test_glu_shape_and_gating():
    m = GLU(features=16)
    x = jax.random.normal(K2, (2, 8, 8, 4))
    params = m.init(K1, x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 8, 16)
    assert jnp.all(y >= 0)  # final relu


def test_residual_block_rezero_is_identity_at_init():
    """rezero gate starts at 0 => block output == input at init
    (/root/reference/modules/residual.py:33-36)."""
    m = ResidualBlock(hidden_width=8, out_width=4, rezero=True)
    x = jax.random.normal(K2, (2, 8, 8, 4))
    params = m.init(K1, x)
    np.testing.assert_allclose(np.asarray(m.apply(params, x)), np.asarray(x))

    # without rezero the block perturbs the input
    m2 = ResidualBlock(hidden_width=8, out_width=4, rezero=False)
    y2 = m2.apply(m2.init(K1, x), x)
    assert not np.allclose(np.asarray(y2), np.asarray(x))


def test_encoder_decoder_blocks_roundtrip_shapes():
    x = jax.random.normal(K2, (2, 16, 16, 8))
    enc = EncoderBlock(hidden_width=8, out_width=8, n_blocks=2, downscale_rate=2)
    p = enc.init(K1, x)
    h = enc.apply(p, x)
    assert h.shape == (2, 8, 8, 8)

    dec = DecoderBlock(hidden_width=8, out_width=8, n_blocks=2, upscale_rate=2)
    p2 = dec.init(K1, h)
    y = dec.apply(p2, h)
    assert y.shape == (2, 16, 16, 8)


def test_stochastic_blocks_with_leading_sample_axis():
    """The rank-5 case the reference needed wrapper layers for
    (modules/enc.py:8-27, dec.py:10-29) — here plain leading axes."""
    x = jax.random.normal(K2, (3, 2, 16, 16, 4))  # [k, B, H, W, C]
    enc = StochasticEncoderBlock(hidden_width=4, out_width=4, n_blocks=1,
                                 downscale_rate=2)
    p = enc.init(K1, x)
    q = enc.apply(p, x)
    assert q.loc.shape == (3, 2, 8, 8, 4)
    assert jnp.all(q.scale > 0)

    dec = StochasticDecoderBlock(hidden_width=4, out_width=4, n_blocks=1,
                                 upscale_rate=2)
    p2 = dec.init(K1, q.loc)
    pz = dec.apply(p2, q.loc)
    assert pz.loc.shape == (3, 2, 16, 16, 4)


def test_mlp_block_std_transforms():
    x = jax.random.normal(K2, (5, 7))
    for transform in ("exp", "softplus"):
        m = MLPBlock(n_hidden=16, n_latent=3, std_transform=transform)
        q = m.apply(m.init(K1, x), x)
        assert q.loc.shape == (5, 3)
        assert jnp.all(q.scale > 0)


def test_merge_leading_roundtrip():
    x = jnp.arange(2 * 3 * 4 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 4, 5)
    merged, unmerge = merge_leading(x)
    assert merged.shape == (6, 4, 4, 5)
    np.testing.assert_array_equal(np.asarray(unmerge(merged)), np.asarray(x))


def test_receptive_fields():
    """Quantitative version of the reference's qualitative receptive-field
    plots (modules/enc.py:99-107): the gradient of one output pixel w.r.t.
    the input is nonzero only inside the block's theoretical receptive field."""
    x = jnp.zeros((1, 16, 16, 4))
    m = GLU(features=8)
    params = m.init(K1, x)

    def one_pixel(xin):
        return m.apply(params, xin)[0, 8, 8, :].sum()

    g = jax.grad(one_pixel)(jax.random.normal(K2, x.shape))
    nz = np.argwhere(np.abs(np.asarray(g)[0]).sum(-1) > 0)
    # two stacked 3x3 convs -> 5x5 receptive field around (8, 8)
    assert nz.min(0).tolist() >= [6, 6]
    assert nz.max(0).tolist() <= [10, 10]

    r = ResidualBlock(hidden_width=4, out_width=4)
    pr = r.init(K1, x)

    def one_pixel_r(xin):
        return r.apply(pr, xin)[0, 8, 8, :].sum()

    gr = jax.grad(one_pixel_r)(jax.random.normal(K2, x.shape))
    nzr = np.argwhere(np.abs(np.asarray(gr)[0]).sum(-1) > 0)
    # 1x1,3x3,3x3,1x1 -> 5x5 receptive field (plus the residual identity at
    # the centre itself)
    assert nzr.min(0).tolist() >= [6, 6]
    assert nzr.max(0).tolist() <= [10, 10]


def test_polyphase_conv_transpose_equivalence():
    """PolyphaseConvTranspose == nn.ConvTranspose(k=2s, stride s, SAME) with
    the SAME parameter pytree (kernel/bias names and shapes), on plain and
    leading-sample-axis inputs, values AND gradients. The polyphase form is
    the MXU-dense evaluation (scripts/deconv_bench.py: 3.2-8.2x on TPU)."""
    import flax.linen as nn
    from vae_mdl_tpu.nn.encoders import PolyphaseConvTranspose

    key = jax.random.PRNGKey(7)
    for (h, w, cin, f) in [(4, 4, 16, 12), (8, 8, 13, 7), (5, 7, 3, 6)]:
        x = jax.random.normal(jax.random.fold_in(key, h), (3, h, w, cin))
        ref = nn.ConvTranspose(f, (4, 4), strides=(2, 2), padding="SAME")
        params = ref.init(jax.random.fold_in(key, w), x)
        poly = PolyphaseConvTranspose(f, 4, 2)

        y_ref = ref.apply(params, x)
        y_poly = poly.apply(params, x)
        assert y_ref.shape == (3, 2 * h, 2 * w, f) == y_poly.shape
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_poly),
                                   rtol=1e-5, atol=1e-5)

        # leading importance-sample axis
        x5 = jax.random.normal(jax.random.fold_in(key, 5), (2, 3, h, w, cin))
        np.testing.assert_allclose(
            np.asarray(ref.apply(params, x5)),
            np.asarray(poly.apply(params, x5)),
            rtol=1e-5, atol=1e-5,
        )

        # gradients w.r.t. params agree
        g_ref = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(params)
        g_poly = jax.grad(lambda p: jnp.sum(poly.apply(p, x) ** 2))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
            g_ref, g_poly,
        )


def test_conv_stack_polyphase_matches_deconv_stack():
    """apply_conv_stack(polyphase=True) equals the nn.ConvTranspose stack on
    the model05 decoder geometry with shared params."""
    import flax.linen as fnn

    from vae_mdl_tpu.nn.encoders import apply_conv_stack, ConvSpec

    specs = (
        ConvSpec(32, 4, 2, True, "relu"),
        ConvSpec(6, 4, 2, True, "none"),
    )

    class Stack(fnn.Module):
        polyphase: bool

        @fnn.compact
        def __call__(self, x):
            return apply_conv_stack(specs, x, jnp.float32,
                                    polyphase=self.polyphase)

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 16))
    ref = Stack(polyphase=False)
    params = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(params, x)
    y_poly = Stack(polyphase=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_poly),
                               rtol=1e-5, atol=1e-5)
