"""Differential ablation of the biladder_celeba train step (design.md §12c
methodology: composed programs differing by ONE component; isolated op
microbenchmarks are non-predictive on XLA:TPU).

The 64x64 bidirectional ladder sits at 25.2% MFU (bf16 body) vs model05's
34.6% and model04's 54.7%. Candidate attributions:

  full       — the shipped biladder_celeba step (bf16 body, DL head)
  f32        — f32 conv bodies (known: 914 vs 1365 imgs/s)
  nearest    — jax.image.resize method="nearest" in every DecoderBlock
               (NOT parity: the reference pins interpolation="bilinear",
               modules/dec.py:41-43 — measures the bilinear surcharge only)
  manual2x   — exact shift-based 2x bilinear (same numbers as
               jax.image.resize bilinear, no gather/einsum lowering)
  k1         — one importance sample instead of 5
  fwd_only   — value only, no backward/optimizer
  tanhgelu   — tanh-approximate gelu everywhere (pre-round-3 behavior;
               NOT parity: the reference's tf.nn.gelu is exact) —
               measures the exact-gelu surcharge

Run SOLO on the TPU: python scripts/biladder_ablation.py
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.config import DataConfig
from vae_mdl_tpu.models.vae import build_model
from vae_mdl_tpu.models.zoo import experiment
from vae_mdl_tpu.train.state import create_train_state, make_optimizer
from vae_mdl_tpu.train.steps import make_multi_train_step

BATCH = 128
SPC = 5
SHAPE = (64, 64, 3)

_real_resize = jax.image.resize


def _upsample2x_axis(x, axis):
    """Exact jax.image.resize(method='bilinear') for scale factor 2 along
    one axis: half-pixel sampling puts out[2i] at in-coord i-1/4 and
    out[2i+1] at i+1/4, i.e. fixed (0.25, 0.75) taps; edge renormalisation
    equals clamp-to-edge when only one neighbour is valid."""
    n = x.shape[axis]
    sl = [slice(None)] * x.ndim

    def take(a, b):
        s = list(sl)
        s[axis] = slice(a, b)
        return x[tuple(s)]

    prev = jnp.concatenate([take(0, 1), take(0, n - 1)], axis=axis)
    nxt = jnp.concatenate([take(1, n), take(n - 1, n)], axis=axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    out = jnp.stack([even, odd], axis=axis + 1 if axis >= 0 else x.ndim + axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def manual_resize(x, shape, method="bilinear", **kw):
    if (method == "bilinear" and x.ndim == 4
            and shape[1] == 2 * x.shape[1] and shape[2] == 2 * x.shape[2]
            and shape[0] == x.shape[0] and shape[3] == x.shape[3]):
        return _upsample2x_axis(_upsample2x_axis(x, 1), 2)
    return _real_resize(x, shape, method=method, **kw)


def nearest_resize(x, shape, method="bilinear", **kw):
    return _real_resize(x, shape, method="nearest", **kw)


def _cfg(**model_over):
    cfg = experiment("biladder_celeba")
    cfg = dataclasses.replace(cfg, data=DataConfig(dataset="synthetic:celeba"))
    if model_over:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_over))
    return cfg


def time_step(step, state, batch, n_iters=5):
    for _ in range(2):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    return (time.perf_counter() - t0) / (n_iters * SPC) * 1e3  # ms/step


def build(cfg):
    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    x_f32 = jnp.zeros((BATCH,) + SHAPE, jnp.float32)
    state = create_train_state(model, cfg.train, x_f32, cfg.model.n_samples)
    # donate default matches bench.py's builder so the "full"/"f32" variants
    # hit the persistent XLA cache warmed by bench runs
    step = make_multi_train_step(model, cfg, tx, n_steps=SPC)
    return step, state


def fwd_only_step(cfg):
    from vae_mdl_tpu.models.objective import compute_loss
    from vae_mdl_tpu.models.vae import prior_for
    from vae_mdl_tpu.train.steps import preprocess

    model = build_model(cfg.model)
    prior = prior_for(cfg.model)
    k = cfg.model.n_samples

    def multi(state, batches):
        def body(s, batch):
            rngs = s.next_rngs("sample", "binarize")
            x = preprocess(cfg, batch, rngs["binarize"])
            Qs, Ps, pxz = model.apply(s.params, x, k,
                                      rngs={"sample": rngs["sample"]})
            loss, metrics = compute_loss(prior, Qs, Ps, pxz, x)
            return s.replace(step=s.step + 1), {"loss": loss}

        state, metrics = jax.lax.scan(body, state, batches)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return jax.jit(multi)


def check_manual_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    ref = _real_resize(x, (2, 16, 16, 3), method="bilinear")
    got = manual_resize(x, (2, 16, 16, 3))
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"manual2x max |err| vs jax bilinear: {err:.2e}", flush=True)
    assert err < 1e-6, err


def main(argv):
    """Pass variant names to run a subset (fresh tunnel compiles of this
    model take minutes each — chunk the runs); no args = all variants."""
    check_manual_exact()
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 256, (SPC, BATCH) + SHAPE, dtype=np.uint8))
    out = {}
    want = set(argv) or {
        "full", "nearest", "manual2x", "f32", "k1", "fwd_only", "remat",
        "tanhgelu"}

    if "tanhgelu" in want:
        # cost of the round-3 exact-gelu parity fix: erf vs tanh-approx
        # gelu in every ResidualBlock/stochastic head of the ladder
        import flax.linen as fnn

        import vae_mdl_tpu.models.bidirectional as bid
        import vae_mdl_tpu.models.ladder as lad
        import vae_mdl_tpu.nn.blocks as blocks

        real_gelu = blocks.gelu
        tanh_gelu = lambda x: fnn.gelu(x, approximate=True)  # noqa: E731
        # patch the module global AND the by-value imports in the ladders
        blocks.gelu = bid.gelu = lad.gelu = tanh_gelu
        try:
            step, state = build(_cfg())
            out["tanhgelu"] = round(time_step(step, state, batch), 3)
        finally:
            blocks.gelu = bid.gelu = lad.gelu = real_gelu
        print(f"{'tanhgelu':10s} {out['tanhgelu']:8.3f} ms/step  "
              f"{BATCH / out['tanhgelu'] * 1e3:8.0f} imgs/s", flush=True)

    def run(name, cfg, resize=None):
        if name not in want:
            return
        jax.image.resize = resize or _real_resize
        try:
            step, state = build(cfg)
            out[name] = round(time_step(step, state, batch), 3)
        finally:
            jax.image.resize = _real_resize
        ips = BATCH / out[name] * 1e3
        print(f"{name:10s} {out[name]:8.3f} ms/step  {ips:8.0f} imgs/s",
              flush=True)

    run("full", _cfg())
    run("nearest", _cfg(), nearest_resize)
    run("manual2x", _cfg(), manual_resize)
    run("f32", _cfg(compute_dtype="float32"))
    run("k1", _cfg(n_samples=1))

    if "remat" in want:
        # rematerialise every ResidualBlock in the backward: if the 3:1
        # bwd:fwd ratio comes from HBM pressure (activation spills), paying
        # recompute FLOPs to shrink the live set should WIN end-to-end
        import flax.linen as nn

        import vae_mdl_tpu.nn.blocks as blocks
        real_rb = blocks.ResidualBlock
        blocks.ResidualBlock = nn.remat(real_rb)
        try:
            step, state = build(_cfg())
            out["remat"] = round(time_step(step, state, batch), 3)
        finally:
            blocks.ResidualBlock = real_rb
        print(f"{'remat':10s} {out['remat']:8.3f} ms/step  "
              f"{BATCH / out['remat'] * 1e3:8.0f} imgs/s", flush=True)

    if "fwd_only" in want:
        cfg = _cfg()
        step = fwd_only_step(cfg)
        _, state = build(cfg)
        out["fwd_only"] = round(time_step(step, state, batch), 3)
        print(f"{'fwd_only':10s} {out['fwd_only']:8.3f} ms/step", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
