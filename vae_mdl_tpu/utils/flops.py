"""Analytic FLOPs accounting for MFU reporting.

``compiled_flops`` asks XLA for the static FLOP count of a compiled
executable (the checkable "analytic" number VERDICT r1 asked for in place of
the invented throughput baseline); ``analytic_model_flops`` is an
independent closed-form cross-check computed from the config's conv/dense
shapes, used as fallback when a backend's cost analysis is unavailable.

MFU is reported against the v5e-1 bf16 peak (197 TFLOP/s; the f32 compute
path necessarily reads as a lower fraction of that same peak — one fixed,
public denominator keeps rounds comparable).
"""
from __future__ import annotations

from typing import Optional

V5E_PEAK_FLOPS = 197e12  # bf16 peak, one v5e chip


def compiled_flops(jitted_fn, *args) -> Optional[float]:
    """XLA's static FLOP count for ``jitted_fn(*args)``; None if the backend
    exposes no cost model."""
    try:
        compiled = jitted_fn.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = cost.get("flops") if cost else None
        return float(flops) if flops and flops > 0 else None
    except Exception:
        return None


def _conv_flops(in_hw, in_ch, features, kernel, stride, transpose) -> tuple:
    """-> (flops, out_hw): 2 * out_elems * kernel^2 * in_ch multiply-adds."""
    h, w = in_hw
    if transpose:
        oh, ow = h * stride, w * stride
    else:
        oh, ow = -(-h // stride), -(-w // stride)
    return 2.0 * oh * ow * features * kernel * kernel * in_ch, (oh, ow)


def analytic_model_flops(model_cfg, batch: int = 1) -> float:
    """Closed-form forward FLOPs per batch for a conv/mlp VAE config: the
    encoder once per image plus the decoder once per importance sample
    (matmul/conv terms only — elementwise work is FLOP-noise on the MXU)."""
    from vae_mdl_tpu.nn.decoders import head_channels

    h, w, c = model_cfg.image_shape
    k = model_cfg.n_samples
    latents = model_cfg.latents()
    n_head = head_channels(model_cfg.likelihood, c, model_cfg.n_mix)

    enc = 0.0
    if model_cfg.encoder.kind == "mlp":
        n_in = h * w * c
        n_h = model_cfg.encoder.n_hidden
        enc += 2.0 * (n_in * n_h + n_h * n_h + n_h * 2 * latents[0])
    else:
        hw, ch = (h, w), c
        for (f, kk, s, t, _a) in model_cfg.encoder.conv_layers:
            fl, hw = _conv_flops(hw, ch, f, kk, s, t)
            enc += fl
            ch = f
        for _ in range(model_cfg.encoder.n_glu):
            f = model_cfg.encoder.glu_features
            fl1, _ = _conv_flops(hw, ch, f, 3, 1, False)
            fl2, _ = _conv_flops(hw, f, 2 * f, 3, 1, False)
            enc += fl1 + fl2
            ch = f
        enc += 2.0 * hw[0] * hw[1] * ch * 2 * latents[0]

    dec = 0.0
    if model_cfg.decoder.kind == "mlp":
        # the output Dense emits h*w*head_channels values (e.g. 2x for a
        # gaussian/dl head, n_mix*10 per pixel for mdl), not h*w*c
        n_out = h * w * n_head
        n_h = model_cfg.decoder.n_hidden
        dec += 2.0 * (latents[0] * n_h + n_h * n_h + n_h * n_out)
    else:
        bh, bw, bc = model_cfg.decoder.base_size
        dec += 2.0 * latents[0] * bh * bw * bc
        hw, ch = (bh, bw), bc
        for (f, kk, s, t, _a) in model_cfg.decoder.pre_layers:
            fl, hw = _conv_flops(hw, ch, f, kk, s, t)
            dec += fl
            ch = f
        for _ in range(model_cfg.decoder.n_glu):
            f = model_cfg.decoder.glu_features
            fl1, _ = _conv_flops(hw, ch, f, 3, 1, False)
            fl2, _ = _conv_flops(hw, f, 2 * f, 3, 1, False)
            dec += fl1 + fl2
            ch = f
        for (f, kk, s, t, _a) in model_cfg.decoder.conv_layers:
            fl, hw = _conv_flops(hw, ch, f, kk, s, t)
            dec += fl
            ch = f
        cl = model_cfg.decoder.conv_layers
        if not (cl and cl[-1][0] == n_head):
            # the head is NOT folded into the conv stack (the zoo folds it;
            # register_model user configs may not): ConvDecoder then appends
            # a standalone 3x3 likelihood-head conv at full resolution
            # (nn/decoders.py 'head' branch) — a real FLOPs term. head_pad
            # channels are deliberately NOT counted (MFU counts useful work)
            dec += _conv_flops(hw, ch, n_head, 3, 1, False)[0]

    # MLP stochastic layers (model06-style): negligible but counted
    mlp = 0.0
    for i in range(1, model_cfg.n_stochastic):
        n_h = model_cfg.mlp_hidden
        mlp += 2.0 * (latents[i - 1] * n_h + n_h * 2 * latents[i]) * 2  # up+down

    return batch * (enc + k * (dec + mlp))


def forward_flops(model_cfg, batch: int = 1,
                  n_samples: Optional[int] = None) -> float:
    """Forward FLOPs per batch for any model family's config."""
    if type(model_cfg).__name__ == "BiLadderConfig":
        return biladder_flops(model_cfg, batch, n_samples)
    if type(model_cfg).__name__ == "LadderConfig":
        return ladder_flops(model_cfg, batch, n_samples)
    if n_samples is not None:
        import dataclasses

        model_cfg = dataclasses.replace(model_cfg, n_samples=n_samples)
    return analytic_model_flops(model_cfg, batch)


def train_step_flops(model_cfg, batch: int) -> float:
    """Forward + backward (2x forward) per optimizer step."""
    return 3.0 * forward_flops(model_cfg, batch)


def mdl_transcendental_census(n_mix: int) -> dict:
    """Per-PIXEL transcendental-op counts of the fused MoDL kernels
    (ops/pallas/mdl_kernel.py `_kernel` / `_bwd_kernel`), by source-level
    op — the analytic numerator of the VPU roofline (VERDICT r3 item #1).

    Derivation (n = n_mix; one DL cascade element = 1 exp [inv_std],
    2 sigmoid [CDF ends], 3 softplus [2 edges + approx], 1 log [main
    branch]; the cascade runs on the stacked [3n, BP] block):

    forward: tanh 3n (coeffs) | exp 3n (cascade) + 2n (two logsumexps)
      | sigmoid 6n | softplus 9n | log 3n + 2 (logsumexp finals)
    backward (assumes XLA/Mosaic CSE merges the cascade recompute's
      inv_std/sigmoid pairs with `_dl_grads`' identical subexpressions —
      the conservative, smaller count): tanh 3n | exp 3n (cascade,
      shared) + 3n (log_softmax + softmax(w) + softmax(logits))
      | sigmoid 6n (shared CDF ends) + 6n (`c_ap`, `le`) | softplus 9n
      | log 3n + 1

    Counts are in units of jax.nn-level calls, matching what the
    roofline microbenchmark (scripts/vpu_roofline.py) measures per op —
    primitive decomposition (softplus -> exp+log1p, ...) cancels between
    numerator and denominator."""
    n = n_mix
    return {
        "fwd": {"tanh": 3 * n, "exp": 5 * n, "sigmoid": 6 * n,
                "softplus": 9 * n, "log": 3 * n + 2},
        "bwd": {"tanh": 3 * n, "exp": 6 * n, "sigmoid": 12 * n,
                "softplus": 9 * n, "log": 3 * n + 1},
    }


def mdl_train_transcendentals(model_cfg, batch: int) -> dict:
    """Total transcendental ops per optimizer STEP spent in the MoDL
    likelihood (one fwd + one bwd kernel pass over the [k, B, H, W]
    pixel grid), by op type."""
    h, w, _ = model_cfg.image_shape
    pixels = batch * model_cfg.n_samples * h * w
    census = mdl_transcendental_census(model_cfg.n_mix)
    return {op: float((census["fwd"][op] + census["bwd"][op]) * pixels)
            for op in census["fwd"]}


def _residual_block_flops(hw, c_in: int, hidden: int, out: int) -> float:
    """1x1 -> 3x3 -> 3x3 -> 1x1 bottleneck (+1x1 shortcut when widths change),
    nn/blocks.py ResidualBlock."""
    fl = 0.0
    fl += _conv_flops(hw, c_in, hidden, 1, 1, False)[0]
    fl += _conv_flops(hw, hidden, hidden, 3, 1, False)[0]
    fl += _conv_flops(hw, hidden, hidden, 3, 1, False)[0]
    fl += _conv_flops(hw, hidden, out, 1, 1, False)[0]
    if c_in != out:
        fl += _conv_flops(hw, c_in, out, 1, 1, False)[0]
    return fl


def ladder_flops(cfg, batch: int = 1, n_samples: Optional[int] = None) -> float:
    """Closed-form forward FLOPs per batch for a LadderConfig
    (models/ladder.py ConvLadderVAE): the stem and the FIRST stochastic
    encoder stage run once per image (the importance-sample axis appears at
    z_1, ladder.py encode); everything downstream of z_1 — upper encoder
    stages, the top-down p(z_i|z_{i+1}) blocks and the observation decoder —
    runs once per sample."""
    from vae_mdl_tpu.nn.decoders import head_channels

    H, W, C = cfg.image_shape
    k = cfg.n_samples if n_samples is None else n_samples
    stages = cfg.stages
    L = len(stages)

    res = []
    hw = (H, W)
    for (_h, _o, _n, rate) in stages:
        hw = (hw[0] // rate, hw[1] // rate)
        res.append(hw)
    res_in = [(H, W)] + res[:-1]  # resolution entering stage i's blocks

    def stoch_enc(i: int, c_in: int) -> float:
        """StochasticEncoderBlock i: n_b ResidualBlocks at the incoming
        resolution, avg-pool (free), 3x3 head conv at the pooled scale."""
        h_w, out, n_b, _ = stages[i]
        fl = 0.0
        for b in range(n_b):
            fl += _residual_block_flops(res_in[i], c_in if b == 0 else out,
                                        h_w, out)
        fl += _conv_flops(res[i], out, 2 * out, 3, 1, False)[0]
        return fl

    per_img = _conv_flops((H, W), C, cfg.stem_features, 3, 1, False)[0]
    per_img += stoch_enc(0, cfg.stem_features)

    per_sample = 0.0
    for i in range(1, L):
        per_sample += stoch_enc(i, stages[i - 1][1])
    # top-down p(z_i | z_{i+1}): upsample (FLOP-noise) + blocks + head conv
    for i in range(L - 1):
        h_w, out, n_b, _ = stages[i]
        c_in = stages[i + 1][1]
        for b in range(n_b):
            per_sample += _residual_block_flops(res[i],
                                                c_in if b == 0 else out,
                                                h_w, out)
        per_sample += _conv_flops(res[i], out, 2 * out, 3, 1, False)[0]
    # observation decoder: obs_up from z_1 to full res + likelihood head
    h0, lat0, n0, _ = stages[0]
    for b in range(n0):
        per_sample += _residual_block_flops((H, W), lat0 if b == 0 else h0,
                                            h0, h0)
    per_sample += _conv_flops(
        (H, W), h0, head_channels(cfg.likelihood, C, cfg.n_mix), 3, 1, False
    )[0]

    return batch * (per_img + k * per_sample)


def biladder_flops(cfg, batch: int = 1, n_samples: Optional[int] = None) -> float:
    """Closed-form forward FLOPs per batch for a BiLadderConfig
    (models/bidirectional.py): the bottom-up deterministic path runs once per
    image; the top-down stochastic path (upsample blocks, prior/merge heads,
    observation decoder) runs once per importance sample."""
    from vae_mdl_tpu.nn.decoders import head_channels

    H, W, C = cfg.image_shape
    k = cfg.n_samples if n_samples is None else n_samples
    stages = cfg.stages
    L = len(stages)

    # resolutions: res_in[i] going into stage i's pool; res[i] = z_i's scale
    res = []
    hw = (H, W)
    for (_h, _lat, _n, rate) in stages:
        hw = (hw[0] // rate, hw[1] // rate)
        res.append(hw)

    # bottom-up, per image
    per_img = _conv_flops((H, W), C, cfg.stem_features, 3, 1, False)[0]
    c_in, hw = cfg.stem_features, (H, W)
    for i, (h_w, _lat, n_b, rate) in enumerate(stages):
        for b in range(n_b):
            per_img += _residual_block_flops(hw, c_in if b == 0 else h_w,
                                             h_w, h_w)
        c_in, hw = h_w, res[i]
    # top posterior head (per image: hs[-1] has no sample axis yet)
    per_img += _conv_flops(res[-1], stages[-1][0], 2 * stages[-1][1], 3, 1,
                           False)[0]

    # top-down, per importance sample
    per_sample = 0.0
    for i in range(L - 2, -1, -1):
        h_w, lat, n_b, _ = stages[i]
        lat_above = stages[i + 1][1]
        # up_blocks[i]: upsample z_{i+1} (bilinear, FLOP-noise) + n_b blocks
        for b in range(n_b):
            per_sample += _residual_block_flops(
                res[i], lat_above if b == 0 else h_w, h_w, h_w)
        # prior head p(z_i|z_{i+1}) and merge head q(z_i|x, z_{>i})
        per_sample += _conv_flops(res[i], h_w, 2 * lat, 3, 1, False)[0]
        if getattr(cfg, "split_merge", False):
            # conv_h(h) runs once per image (h has no sample axis);
            # conv_d(d) per sample (models/bidirectional.py split_merge)
            per_sample += _conv_flops(res[i], h_w, 2 * lat, 3, 1, False)[0]
            per_img += _conv_flops(res[i], h_w, 2 * lat, 3, 1, False)[0]
        else:
            per_sample += _conv_flops(res[i], 2 * h_w, 2 * lat, 3, 1,
                                      False)[0]
    # observation decoder: obs_up from z_1 back to full res + likelihood head
    h0, lat0, n0, _r0 = stages[0]
    for b in range(n0):
        per_sample += _residual_block_flops((H, W), lat0 if b == 0 else h0,
                                            h0, h0)
    per_sample += _conv_flops(
        (H, W), h0, head_channels(cfg.likelihood, C, cfg.n_mix), 3, 1, False
    )[0]

    return batch * (per_img + k * per_sample)
