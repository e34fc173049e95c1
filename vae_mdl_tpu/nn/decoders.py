"""Decoder networks: observation model p(x | z) with pluggable likelihood head.

Parity targets:
- ``MLPDecoder``  — /root/reference/models/model01.py:102-118 (Dense tanh x2 ->
  Dense(784) -> Bernoulli logits)
- ``ConvDecoder`` — model02.py:57-96 (Dense -> reshape base -> deconv
  128/64/32 -> conv head), model04.py:53-93 (GLU variant, 63-channel base at
  /4 resolution), model05.py:55-92 (MoDL head, n_mix*10 channels),
  model06.py:135-167 (gelu + DiscretizedLogistic head).

Likelihood heads (selected by ``likelihood``):
  "bernoulli" : logits -> Bernoulli                 (model01)
  "gaussian"  : (mu, logstd) -> Normal(mu, exp)     (model02)
  "dl"        : (mu, logstd) -> DiscretizedLogistic (model03/04/06)
  "mdl"       : n_mix*10 params -> MixtureDiscretizedLogistic (model05)

``bound_logstd`` applies tanh to logstd — the variant every reference conv
model carries as commented-out code (model02.py:93-94, model03.py:94-97,
model04.py:86-90, model06.py:164-165); here it is a config flag.

All heads emit float32 parameters; the conv/matmul body may run in bf16.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from vae_mdl_tpu.distributions import (
    Bernoulli,
    DiscretizedLogistic,
    DistributionTuple,
    MixtureDiscretizedLogistic,
    Normal,
    PixelMixtureDiscretizedLogistic,
)
from vae_mdl_tpu.nn.blocks import _KERNEL_INIT, _activation, merge_leading
from vae_mdl_tpu.nn.encoders import ConvSpec, apply_conv_spec, apply_conv_stack

Dtype = Any

Obs = Union[Bernoulli, Normal, DiscretizedLogistic,
            MixtureDiscretizedLogistic, PixelMixtureDiscretizedLogistic]

_IMAGE_AXES = (-1, -2, -3)


def resolve_use_pallas(use_pallas: Optional[bool], likelihood: str,
                       operand: Optional[jax.Array] = None) -> bool:
    """``None`` = auto: the fused MoDL kernel on TPU only (measured faster
    than XLA fusion in both train and eval, docs/design.md §7). The DL kernel
    loses to XLA fusion on this workload and stays opt-in; CPU runs always
    take the jnp path (interpret-mode kernels are a test vehicle, not a
    performance one).

    The auto decision resolves the placement in priority order: the actual
    device of ``operand`` when it is a committed concrete array (eager
    calls), then an active ``jax.default_device(...)`` context, then the
    process default backend. This keeps CPU-pinned computations on a TPU
    host from selecting the Mosaic-compiled kernel (which cannot lower for
    CPU). A jit trace explicitly placed by *argument* devices alone (no
    ``default_device`` context) is still resolved from the process default —
    pass ``use_pallas=False`` for that exotic placement."""
    if use_pallas is not None:
        return use_pallas
    if likelihood != "mdl":
        return False
    if (
        operand is not None
        and isinstance(operand, jax.Array)
        and not isinstance(operand, jax.core.Tracer)
    ):
        return next(iter(operand.devices())).platform == "tpu"
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", dev) == "tpu"
    return jax.default_backend() == "tpu"


def make_observation(
    out: jax.Array, likelihood: str, bound_logstd: bool = False,
    use_pallas: Optional[bool] = None, io_dtype: Optional[str] = None,
) -> Obs:
    """Turn raw head output into the configured observation distribution.

    ``io_dtype`` (mdl only): quantize the materialized head->likelihood
    boundary tensor — the cast fuses into the head conv's epilogue, so the
    parameter tensor crosses the Pallas custom-call boundary at half width
    (+9% model05 train throughput at "bfloat16", design.md §12n); the
    likelihood math itself still runs float32 (the kernel and the jnp
    fallback both upcast in-register)."""
    use_pallas = resolve_use_pallas(use_pallas, likelihood, operand=out)
    out = out.astype(jnp.float32)
    if likelihood == "bernoulli":
        return Bernoulli(out, event_axes=_IMAGE_AXES)
    if likelihood == "gaussian":
        mu, logstd = jnp.split(out, 2, axis=-1)
        if bound_logstd:
            logstd = jnp.tanh(logstd)
        return Normal(mu, jnp.exp(logstd), event_axes=_IMAGE_AXES)
    if likelihood == "dl":
        mu, logstd = jnp.split(out, 2, axis=-1)
        if bound_logstd:
            logstd = jnp.tanh(logstd)
        return DiscretizedLogistic(
            mu, logstd, low=0.0, high=1.0, levels=256.0, event_axes=_IMAGE_AXES,
            use_pallas=use_pallas,
        )
    if likelihood == "mdl":
        if io_dtype is not None:
            out = out.astype(io_dtype)
        return MixtureDiscretizedLogistic(out, event_axes=_IMAGE_AXES,
                                          use_pallas=use_pallas)
    if likelihood == "pmdl":
        # loc-conditioned mixture (no dependence on observed x) — the
        # reference's exported-but-unused alternative (utils/mdl_plain.py,
        # utils/__init__.py:6); log_prob is per-pixel, so event axes (-1,-2)
        return PixelMixtureDiscretizedLogistic(out, event_axes=(-1, -2))
    raise ValueError(f"unknown likelihood {likelihood!r}")


def ladder_observation(module, z1: jax.Array) -> DistributionTuple:
    """Shared observation decode of both ladder families (models/ladder.py
    ConvLadderVAE and models/bidirectional.py BiLadderVAE): upsample z_1 to
    image resolution (``module.obs_up``), run the FLOAT32 likelihood head
    (``module.obs_head`` — likelihood parameters never quantise to the bf16
    body dtype), build the configured observation distribution and attach a
    sample. One definition, so a head change (dtype, clipping, a new
    likelihood) can never silently reach only one family."""
    cfg = module.config
    h = module.obs_up(z1)
    out = module.obs_head(h.astype(jnp.float32))
    pxz = make_observation(out, cfg.likelihood, cfg.bound_logstd,
                           cfg.use_pallas,
                           getattr(cfg, "likelihood_io_dtype", None))
    return DistributionTuple(pxz, pxz.sample(module.make_rng("sample")),
                             axes=pxz.event_axes)


def head_channels(likelihood: str, out_channels: int, n_mix: int) -> int:
    return {
        "bernoulli": out_channels,
        "gaussian": 2 * out_channels,
        "dl": 2 * out_channels,
        "mdl": n_mix * 10,
        "pmdl": n_mix * 10,
    }[likelihood]


class MLPDecoder(nn.Module):
    """Dense stack -> reshape to image -> likelihood head (Bernoulli default)."""

    out_shape: Tuple[int, int, int] = (28, 28, 1)
    n_hidden: int = 200
    activation: str = "tanh"
    likelihood: str = "bernoulli"
    n_mix: int = 5
    bound_logstd: bool = False
    use_pallas: Optional[bool] = None
    likelihood_io_dtype: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> Obs:
        act = _activation(self.activation)
        h, w, c = self.out_shape
        n_out = h * w * head_channels(self.likelihood, c, self.n_mix)
        x = act(nn.Dense(self.n_hidden, dtype=self.dtype, kernel_init=_KERNEL_INIT)(z))
        x = act(nn.Dense(self.n_hidden, dtype=self.dtype, kernel_init=_KERNEL_INIT)(x))
        # output layer in f32; its bias is the canvas-mean init target
        # (/root/reference/models/model01.py:294-301 -> train.state.init_output_bias)
        out = nn.Dense(n_out, dtype=jnp.float32, kernel_init=_KERNEL_INIT,
                       name="out")(x.astype(jnp.float32))
        img_c = head_channels(self.likelihood, c, self.n_mix)
        out = out.reshape(z.shape[:-1] + (h, w, img_c))
        return make_observation(out, self.likelihood, self.bound_logstd,
                                self.use_pallas, self.likelihood_io_dtype)


class ConvDecoder(nn.Module):
    """Dense -> reshape to base grid -> (conv+GLU) stack -> deconvs -> head.

    ``base_size = (H/2^u, W/2^u, base_features)`` where u is the number of
    stride-2 layers in ``conv_specs`` (the reference hardcodes these,
    e.g. model02.py:64, model04.py:62).
    """

    conv_specs: Tuple[ConvSpec, ...]
    base_size: Tuple[int, int, int] = (4, 4, 128)
    out_shape: Tuple[int, int, int] = (32, 32, 3)
    pre_specs: Tuple[ConvSpec, ...] = ()  # convs before the GLU stack (model04)
    n_glu: int = 0
    glu_features: int = 64
    glu_activation: str = "relu"
    fc_activation: str = "relu"
    likelihood: str = "gaussian"
    n_mix: int = 5
    bound_logstd: bool = False
    use_pallas: Optional[bool] = None
    likelihood_io_dtype: Optional[str] = None
    head_pad: int = 0  # emit >= this many head channels, slice to n_head
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> Obs:
        act = _activation(self.fc_activation)
        h = act(
            nn.Dense(math.prod(self.base_size), dtype=self.dtype,
                     kernel_init=_KERNEL_INIT)(z)
        )
        h = h.reshape(z.shape[:-1] + tuple(self.base_size))
        merged, unmerge = merge_leading(h)

        if self.pre_specs:
            merged = apply_conv_stack(self.pre_specs, merged, self.dtype,
                                      prefix="pre")

        from vae_mdl_tpu.nn.blocks import GLU

        for i in range(self.n_glu):
            merged = GLU(self.glu_features, self.glu_activation, self.dtype,
                         name=f"glu_{i}")(merged)

        n_head = head_channels(self.likelihood, self.out_shape[-1], self.n_mix)
        # lane-alignment experiment hook (VERDICT r2 weak #1): emit a padded
        # head (e.g. 64 instead of the MoDL's tile-hostile n_mix*10 = 50)
        # and slice back — the extra channels receive no gradient signal and
        # the conv gets an aligned output tile
        n_emit = max(n_head, self.head_pad)
        specs = self.conv_specs
        if specs and specs[-1].features == n_head:
            # the zoo folds the likelihood head into the conv stack (e.g.
            # MODEL03's trailing conv(6,...), model04's deconv(6,...)) — run
            # the body at compute_dtype but the HEAD layer in float32: the
            # likelihood parameters must be f32 (module contract above; a
            # bf16 head step near |mu|~1 is a whole 1/255 bin width)
            out = apply_conv_stack(specs[:-1], merged, self.dtype)
            head_spec = (specs[-1] if n_emit == n_head else
                         specs[-1].replace(features=n_emit))
            out = apply_conv_spec(head_spec, out.astype(jnp.float32),
                                  jnp.float32, f"conv_{len(specs) - 1}")
        else:
            out = apply_conv_stack(specs, merged, self.dtype)
            out = nn.Conv(n_emit, (3, 3), padding="SAME", dtype=jnp.float32,
                          kernel_init=_KERNEL_INIT, name="head")(
                out.astype(jnp.float32))
        if n_emit != n_head:
            out = out[..., :n_head]
        out = unmerge(out)
        return make_observation(out, self.likelihood, self.bound_logstd,
                                self.use_pallas, self.likelihood_io_dtype)
