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
        """The hand-derived backward kernel vs the jnp vjp.

        Both are f32 evaluations of a cancellation-heavy derivative (CDF
        differences over 1/255-wide bins), so they agree only to the shared
        rounding-noise level — accuracy parity vs float64 truth is asserted
        separately in test_backward_accuracy_parity_with_f64."""
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
        # leading importance-sample dim on params, edge pixels forced in,
        # logscales pushed toward the -7 clamp, non-uniform cotangent
        x01 = (_binned(k1, (3, 4, 4, 3)) + 1.0) / 2.0
        x01 = x01.at[0, 0, 0].set(0.0).at[1, 1, 1].set(1.0)
        params = jax.random.normal(k2, (2, 3, 4, 4, 30)) * 3.0
        params = params.at[..., 4:7].add(-6.0)
        wts = jax.random.normal(k3, (2, 3, 4, 4, 1))

        gp_k, gx_k = jax.grad(
            lambda p, x: jnp.sum(mdl_log_prob(x, p) * wts), argnums=(0, 1)
        )(params, x01)
        gp_r, gx_r = jax.grad(
            lambda p, x: jnp.sum(mixture_log_prob(x, p) * wts), argnums=(0, 1)
        )(params, x01)
        np.testing.assert_allclose(np.asarray(gp_k), np.asarray(gp_r),
                                   rtol=1e-2, atol=5e-3)
        # the x cotangent routes through the jnp reference itself: exact
        np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                                   rtol=1e-6, atol=0)

    def test_backward_accuracy_parity_with_f64(self):
        """The analytic backward kernel is as accurate as the jnp f32 vjp
        against a float64 ground truth (their mutual differences are shared
        f32 rounding noise, not an error in the hand-derived gradients)."""
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
        x01 = (_binned(k1, (3, 4, 4, 3)) + 1.0) / 2.0
        x01 = x01.at[0, 0, 0].set(0.0).at[1, 1, 1].set(1.0)
        params = jax.random.normal(k2, (2, 3, 4, 4, 30)) * 3.0
        wts = jax.random.normal(k3, (2, 3, 4, 4, 1))

        g_ker = jax.grad(lambda p: jnp.sum(mdl_log_prob(x01, p) * wts))(params)
        g_ref = jax.grad(lambda p: jnp.sum(mixture_log_prob(x01, p) * wts))(params)
        jax.config.update("jax_enable_x64", True)
        try:
            g_64 = jax.grad(
                lambda p: jnp.sum(
                    mixture_log_prob(
                        x01.astype(jnp.float64), p) * wts.astype(jnp.float64)
                )
            )(params.astype(jnp.float64))
            g_64 = np.asarray(g_64)  # materialise before x64 is switched off
        finally:
            jax.config.update("jax_enable_x64", False)

        truth = np.asarray(g_64)
        err_ker = np.abs(np.asarray(g_ker, np.float64) - truth)
        err_ref = np.abs(np.asarray(g_ref, np.float64) - truth)
        rms = lambda e: np.sqrt((e ** 2).mean())  # noqa: E731
        assert rms(err_ker) <= 1.2 * rms(err_ref) + 1e-9

    def test_use_pallas_auto_resolution(self):
        """None = auto: MoDL kernel on TPU only; DL never auto; forced values
        pass through. (The suite runs on CPU, so auto resolves False here.)"""
        from vae_mdl_tpu.nn.decoders import resolve_use_pallas

        assert resolve_use_pallas(None, "mdl") == (
            jax.default_backend() == "tpu")
        assert resolve_use_pallas(None, "dl") is False
        assert resolve_use_pallas(True, "dl") is True
        assert resolve_use_pallas(False, "mdl") is False

    def test_use_pallas_respects_cpu_pinning(self, monkeypatch):
        """Auto never selects the Mosaic kernel for CPU-pinned computations
        on a TPU host (VERDICT r2 weak #6): an active default_device(cpu)
        context or a concrete CPU-resident operand overrides the process
        default backend."""
        from vae_mdl_tpu.nn.decoders import resolve_use_pallas

        # simulate a TPU-host process default so the guard is what decides
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            assert resolve_use_pallas(None, "mdl") is False
        # concrete operand committed to CPU wins over the default backend
        x = jax.device_put(jnp.zeros((2, 2, 2, 50)), cpu)
        assert resolve_use_pallas(None, "mdl", operand=x) is False
        # tracers fall through to the context/backend resolution
        def f(t):
            assert resolve_use_pallas(None, "mdl", operand=t) is True
            return t

        jax.jit(f)(x)

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


def test_vpu_probe_plumbing():
    """The roofline probe machinery (ops/pallas/vpu_probe.py) runs in
    interpret mode: loop kernels execute, rates come back positive, and
    the floor arithmetic prices a census at given rates. (Real rates are
    TPU-only — scripts/vpu_roofline.py; design.md §12m.)"""
    from vae_mdl_tpu.ops.pallas.vpu_probe import (
        OPS,
        measure_op_rate,
        vpu_floor_seconds,
    )
    from vae_mdl_tpu.utils.flops import (
        mdl_train_transcendentals,
        mdl_transcendental_census,
    )
    from vae_mdl_tpu.models.zoo import experiment

    rate = measure_op_rate("exp", block=(8, 128), grid=1,
                           iters=(1, 2001), repeats=2)
    assert rate > 0
    assert set(OPS) == {"exp", "log", "tanh", "sigmoid", "softplus"}

    census = mdl_transcendental_census(5)
    assert census["fwd"]["softplus"] == 45 and census["bwd"]["sigmoid"] == 60
    counts = mdl_train_transcendentals(experiment("model05").model, 128)
    # one fake rate: floor = total ops / rate
    total = sum(counts.values())
    assert vpu_floor_seconds(counts, {k: 1e9 for k in counts}) == (
        pytest.approx(total / 1e9))


def test_batch_lanes_kernel_matches_standard():
    """The batch-lanes MoDL kernel (design.md §12n: consumes the head
    conv's natural layout, no relayout copy, no in-VMEM transpose) is
    numerically the standard kernel: same forward values and same
    hand-derived backward, for both the with-k and without-k shapes."""
    import numpy as np

    from vae_mdl_tpu.ops.pallas.mdl_kernel import (
        batch_lanes_applicable,
        mdl_log_prob,
        mdl_log_prob_batch_lanes,
    )

    rng = np.random.default_rng(0)
    for with_k in (True, False):
        B, H, W, n = 4, 8, 8, 5
        x = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
        shape = (3, B, H, W, 10 * n) if with_k else (B, H, W, 10 * n)
        p = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        assert batch_lanes_applicable(x, p)

        a, b = mdl_log_prob(x, p), mdl_log_prob_batch_lanes(x, p)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)
        ga = jax.grad(lambda pp: mdl_log_prob(x, pp).sum())(p)
        gb = jax.grad(lambda pp: mdl_log_prob_batch_lanes(x, pp).sum())(p)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-5, atol=1e-5)


def test_prefer_batch_lanes_dispatch_rule():
    """The measured dispatch rule: bf16 boundary + training shape + lane-
    sized k*B -> batch-lanes; f32 params, exotic shapes, or eval-sized
    lane counts stay on the standard kernel (design.md §12n A/Bs)."""
    import numpy as np

    from vae_mdl_tpu.ops.pallas.mdl_kernel import prefer_batch_lanes

    x = jnp.zeros((128, 32, 32, 3), jnp.float32)
    p16 = jnp.zeros((5, 128, 32, 32, 50), jnp.bfloat16)
    assert prefer_batch_lanes(x, p16)                      # 640 lanes, bf16
    assert not prefer_batch_lanes(x, p16.astype(jnp.float32))  # f32 slower
    x_eval = jnp.zeros((100, 32, 32, 3), jnp.float32)
    p_eval = jnp.zeros((100, 100, 32, 32, 50), jnp.bfloat16)
    assert not prefer_batch_lanes(x_eval, p_eval)          # 10k lanes
    # exotic broadcast shape -> not applicable
    assert not prefer_batch_lanes(jnp.zeros((4, 4, 3)), p16)
    # ragged lane count (ADVICE r4): B=100, k=5 -> L=500 is not a multiple
    # of the 128-lane width — untested Mosaic tile geometry, keep standard
    x_odd = jnp.zeros((100, 32, 32, 3), jnp.float32)
    p_odd = jnp.zeros((5, 100, 32, 32, 50), jnp.bfloat16)
    assert not prefer_batch_lanes(x_odd, p_odd)
    # round-5 sweep: batch-lanes wins through L=4096 (design.md §12o)
    p_wide = jnp.zeros((10, 128, 32, 32, 50), jnp.bfloat16)  # L=1280
    assert prefer_batch_lanes(jnp.zeros((128, 32, 32, 3)), p_wide)


def test_prefer_lane_tiled_dispatch_rule():
    """Eval-regime dispatch (round 5, §12o): lane-tiled for bf16-boundary
    operands with 128-aligned batch beyond batch-lanes' measured range;
    ragged batches and f32 boundaries keep the standard kernel."""
    from vae_mdl_tpu.ops.pallas.mdl_kernel import prefer_lane_tiled

    x128 = jnp.zeros((128, 32, 32, 3), jnp.float32)
    p_eval = jnp.zeros((100, 128, 32, 32, 50), jnp.bfloat16)  # L=12800
    assert prefer_lane_tiled(x128, p_eval)
    assert not prefer_lane_tiled(x128, p_eval.astype(jnp.float32))
    x100 = jnp.zeros((100, 32, 32, 3), jnp.float32)
    p100 = jnp.zeros((100, 100, 32, 32, 50), jnp.bfloat16)
    assert not prefer_lane_tiled(x100, p100)   # B % 128 != 0
    p_small = jnp.zeros((5, 128, 32, 32, 50), jnp.bfloat16)  # L=640
    assert not prefer_lane_tiled(x128, p_small)  # batch-lanes regime


def test_f32_split_batch_lanes_is_bit_exact():
    """The exact-f32 batch-lanes route (u16 hi/lo bit-split, round 5):
    the u16 round-trip reconstructs every f32 bit pattern exactly —
    including NaN/inf/denormals — and the kernel's forward/backward are
    bit-equal to the plain batch-lanes kernel on f32 operands."""
    import numpy as np

    from vae_mdl_tpu.ops.pallas.mdl_kernel import (
        _join_u16,
        _split_f32_u16,
        mdl_log_prob_batch_lanes,
        mdl_log_prob_batch_lanes_f32,
    )

    # bit-pattern round trip on pathological values
    special = jnp.asarray([0.0, -0.0, 1.0, -1.5, jnp.inf, -jnp.inf,
                           jnp.nan, 1e-40, -1e-40, 3.4e38, 1.1754944e-38],
                          jnp.float32)
    rt = _join_u16(*_split_f32_u16(special))
    np.testing.assert_array_equal(
        np.asarray(special).view(np.uint32), np.asarray(rt).view(np.uint32))

    rng = np.random.default_rng(11)
    B, H, W, n = 4, 8, 8, 5
    x = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((3, B, H, W, 10 * n)), jnp.float32)

    a = mdl_log_prob_batch_lanes(x, p)
    b = mdl_log_prob_batch_lanes_f32(x, p)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ga = jax.grad(lambda pp: mdl_log_prob_batch_lanes(x, pp).sum())(p)
    gb = jax.grad(lambda pp: mdl_log_prob_batch_lanes_f32(x, pp).sum())(p)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_lane_tiled_kernel_matches_batch_lanes():
    """The k-grid lane-tiled variant (eval regime, round 5) matches the
    whole-L batch-lanes kernel to float roundoff: same math bodies, the
    lane axis merely arrives in [*, B] tiles with the x broadcast
    expressed through the grid. (Not asserted bit-equal: even identical
    elementwise chains round differently across block geometries once the
    compiler fuses them — measured on CPU interpret, where _forward_bl's
    own output moves ~3e-4 between hwb=8 and hwb=16.)"""
    import numpy as np

    from vae_mdl_tpu.ops.pallas.mdl_kernel import (
        mdl_log_prob_batch_lanes,
        mdl_log_prob_lane_tiled,
    )

    rng = np.random.default_rng(12)
    B, H, W, n, k = 128, 4, 4, 3, 3  # B % 128 == 0, the variant's contract
    x = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
    for shape in ((k, B, H, W, 10 * n), (B, H, W, 10 * n)):
        p = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        a = mdl_log_prob_batch_lanes(x, p)
        b = mdl_log_prob_lane_tiled(x, p)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)
        ga = jax.grad(lambda pp: mdl_log_prob_batch_lanes(x, pp).sum())(p)
        gb = jax.grad(lambda pp: mdl_log_prob_lane_tiled(x, pp).sum())(p)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-5, atol=1e-5)
    # bf16 boundary operands take the same path the eval production
    # config uses
    p16 = jnp.asarray(rng.standard_normal((k, B, H, W, 10 * n)),
                      jnp.float32).astype(jnp.bfloat16)
    a16 = mdl_log_prob_batch_lanes(x, p16)
    b16 = mdl_log_prob_lane_tiled(x, p16)
    np.testing.assert_allclose(np.asarray(a16), np.asarray(b16),
                               rtol=1e-5, atol=1e-4)


def test_bwd_x_cotangent_stays_f32_for_bf16_boundary():
    """d/dx through both custom-vjp kernels upcasts a bf16 parameter
    tensor before the jnp recompute: the likelihood math — including the
    x cotangent — runs float32 regardless of the boundary dtype (the
    contract mixture.log_prob enforces on the jnp path; ADVICE r4)."""
    import numpy as np

    from vae_mdl_tpu.distributions.mixture import mixture_log_prob
    from vae_mdl_tpu.ops.pallas.mdl_kernel import (
        mdl_log_prob,
        mdl_log_prob_batch_lanes,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (2, 8, 8, 3)), jnp.float32)
    p16 = jnp.asarray(rng.standard_normal((3, 2, 8, 8, 30)),
                      jnp.float32).astype(jnp.bfloat16)
    # the f32 ground truth: jnp reference on the upcast parameters
    gx_ref = jax.grad(
        lambda xx: mixture_log_prob(xx, p16.astype(jnp.float32)).sum())(x)
    for fn in (mdl_log_prob, mdl_log_prob_batch_lanes):
        gx = jax.grad(lambda xx: fn(xx, p16).sum())(x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=1e-6, atol=0)
